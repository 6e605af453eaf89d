"""Scalar column expressions (SURVEY.md §2.8).

All are pure Catalyst Column expressions — JVM-side, whole-stage-codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LONG_MAX = 2**63 - 1


def ppm_ok(a: Column, b: Column, ppm: float) -> Column:
    """Parts-per-million tolerance equality (C1/F5).

    Reference: ``abs((m0 - m1) / m0) * 1e6 <= ppm`` — SpectrumRequest.scala:15-16,
    duplicated at libCandidateIons.sc:8-10. The engine's tolerance-equality
    primitive for floating values.
    """
    return (F.abs((a - b) / a) * F.lit(1e6)) <= F.lit(ppm)


def quantize_trunc(col: Column, fix: float = 1e5) -> Column:
    """Fixed-point quantization with truncation-toward-zero (C2/F7).

    Reference: ``(mz * fixCom).toInt / fixCom`` — MainDistributionMzIons.scala:44,70,
    MainDistributionDiffMzIons.scala:50,81. Scala ``.toInt`` truncates toward
    zero (NOT floor), which differs from ``floor`` for negative inputs — and
    pairwise diffs (J4) can be negative — so we use ``cast("long")``, which has
    the same truncation semantics.
    """
    return (col * F.lit(fix)).cast("long") / F.lit(fix)


def iso_duration_seconds(col: Column) -> Column:
    """ISO-8601 duration string → whole seconds (C3/S9).

    Reference: ``DatatypeFactory...newDuration(s).getSeconds`` —
    MzXMLTags.scala:43-44,398. ``getSeconds`` returns the *seconds field* of the
    duration truncated to an int, i.e. ``PT946.566S → 946``; hour/minute fields
    are carried separately, so ``PT1M30.9S → 90`` under the reference's usage
    (it always adds fields up implicitly because mzXML writes pure-seconds
    durations; we implement full H/M/S for robustness, each truncating only the
    final fractional seconds).

    Event-time granularity of the whole engine is therefore 1 second.
    """
    def _num(unit: str) -> Column:
        # regexp_extract yields '' on no-match; '' would fail the ANSI cast —
        # nullif makes it NULL, coalesce restores the 0 default (fail-soft,
        # like the reference's Option semantics)
        raw = F.regexp_extract(col, rf"(\d+(?:\.\d+)?){unit}", 1)
        return F.coalesce(F.nullif(raw, F.lit("")).cast("double"), F.lit(0.0))

    h, m, s = _num("H"), _num("M"), _num("S")
    total = h * 3600 + m * 60 + s
    sign = F.when(col.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    return (sign * total).cast("long")


def rt_range_predicate(rt: Column, start, end) -> Column:
    """The reference's asymmetric-null retention-time gate (F3).

    Reference: ``rt.getOrElse(0) >= startTime && rt.getOrElse(MaxValue) <= endTime``
    — MainDistributionIntensityIons.scala:67-68 et al. A NULL rt substitutes 0
    for the lower bound and MaxValue for the upper bound, so a NULL row passes
    iff ``start <= 0 AND end >= MaxValue``-side conditions — asymmetric by
    design; reproduced exactly, not "fixed".
    """
    lo = F.coalesce(rt, F.lit(0)) >= F.lit(start)
    hi = F.coalesce(rt, F.lit(LONG_MAX)) <= F.lit(end)
    return lo & hi
