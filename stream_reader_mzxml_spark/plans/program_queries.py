"""Round-2 program battery: q34 (nested Array<Struct> record model +
entry-point-2 None-preserving gate), q35 (the CandidateIons end-to-end
analytic), q36 (salted two-phase per-group top-K ≡ plain window).

Same conventions as plans.entry_queries: every computed column aliased
identically on both sides, floats rounded, constants shared between the
Spark plan and the DuckDB oracle from single Python sources of truth.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.operators.aggregates import salted_top_k
from stream_reader_mzxml_spark.operators.nested import (
    PREC_DIM,
    precursor_request_gate,
    with_precursors,
)
from stream_reader_mzxml_spark.pipeline import candidate

PROGRAM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PROGRAM_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        PROGRAM_QUERIES[name] = fn
        if oracle is not None:
            PROGRAM_ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# q34 — nested precursorMz Array<Struct> + EP2 None-preserving exists() gate
# (SpectrumRequest.scala:40-53; struct fields MzXMLTags.scala:189-197).
# Every input row appears in the output; non-passing rows carry NULL match
# columns (the reference's Some/None stream shape). NULL intensity fails its
# element's test without poisoning the row (Option.exists semantics).
# ---------------------------------------------------------------------------
_Q34_MZ = 500.0
_Q34_PPM = 4000.0
_Q34_MIN_INT = 500.0


@_register(
    "q34_nested_precursor_gate",
    f"""
    WITH p AS (
      SELECT vec_id,
             list_transform(
               generate_series(1, (vec_id % {PREC_DIM + 1})::INT),
               i -> {{'value': {_Q34_MZ} + embedding[i]::DOUBLE * 10,
                      'intensity': CASE
                          WHEN ((vec_id * {PREC_DIM} + i - 1) % 19) = 0 THEN NULL
                          ELSE (((vec_id * {PREC_DIM} + i - 1) * 37) % 1000)::DOUBLE
                        END,
                      'scan_num': vec_id * {PREC_DIM} + i - 1}}
             ) AS precursors
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, precursors,
             list_filter(precursors, q ->
               abs(({_Q34_MZ} - q.value) / {_Q34_MZ}) * 1e6 <= {_Q34_PPM}
               AND q.intensity IS NOT NULL
               AND q.intensity > {_Q34_MIN_INT}) AS matches
      FROM p
    )
    SELECT vec_id,
           length(precursors) AS n_prec,
           (length(precursors) > 0 AND length(matches) > 0)::INT AS passed,
           CASE WHEN length(matches) > 0 THEN length(matches) END AS n_match,
           CASE WHEN length(matches) > 0
                THEN round(matches[1].value, 6) END AS first_match_value
    FROM m
    """,
)
def q34_nested_precursor_gate(spark, sf_dir):
    nested = with_precursors(_t(spark, sf_dir, "embeddings"), base_value=_Q34_MZ)
    return precursor_request_gate(
        nested, mz=_Q34_MZ, min_intensity=_Q34_MIN_INT, ppm=_Q34_PPM
    )


# ---------------------------------------------------------------------------
# q35 — the CandidateIons end-to-end program (libCandidateIons.sc:100-193):
# noise filter → broadcast precursor-list interval/tolerance join →
# head-of-list tie-break → isotope nearest-peak probes (minBy fold) →
# double ppm gate → abundance band filters → rendered Ion rows.
# ---------------------------------------------------------------------------
def _q35_sql() -> str:
    c = candidate
    ion_rows = ",\n        ".join(
        f"({p}, {rt0}, {m0}, '{frag}')" for p, rt0, m0, frag in c.ion_list()
    )
    near = (
        "list_reduce(peaks, (acc, p) -> CASE WHEN abs(p.mz - ({d})) < "
        "abs(acc.mz - ({d})) THEN p ELSE acc END)"
    )
    return f"""
    WITH ions(ion_id, rt0, m0, fragments) AS (VALUES
        {ion_rows}
    ),
    sp AS (
      SELECT vec_id,
             ((vec_id * 7) % 3600)::DOUBLE AS rt,
             list_transform(generate_series(1, {c.PEAK_DIM}), i ->
               {{'mz': 100.0 + embedding[i]::DOUBLE * 10,
                 'intensity': (((vec_id * {c.PEAK_DIM} + i - 1) * 37) % 1000)::DOUBLE}}
             ) AS peaks
      FROM embeddings
    ),
    pk AS (
      SELECT vec_id, rt, g.i AS pos,
             peaks[g.i].mz AS mz0, peaks[g.i].intensity AS int0
      FROM sp, (SELECT unnest(generate_series(1, {c.PEAK_DIM})) AS i) g
      WHERE peaks[g.i].intensity > {c.NOISE_INTENSITY}
    ),
    cand AS (
      SELECT pk.*, i.ion_id, i.fragments,
             row_number() OVER (PARTITION BY pk.vec_id, pk.pos
                                ORDER BY i.ion_id) AS rn
      FROM pk JOIN ions i
        ON pk.rt >= i.rt0 - {c.RT_WINDOW} AND pk.rt <= i.rt0 + {c.RT_WINDOW}
       AND abs(i.m0 - pk.mz0) < {c.MZ_TOL}
    ),
    win AS (
      SELECT w.vec_id, w.rt, w.pos, w.mz0, w.int0, w.ion_id, w.fragments,
             s.peaks
      FROM cand w JOIN sp s ON w.vec_id = s.vec_id
      WHERE w.rn = 1
    ),
    iso AS (
      SELECT *,
             {near.format(d=f"mz0 + {c.DELTA_MP0_MP1}")} AS near1,
             {near.format(d=f"mz0 + {c.DELTA_MP0_MP2}")} AS near2
      FROM win
    )
    SELECT vec_id AS num, rt, pos,
           round(mz0, 6) AS mz0, int0,
           round(near1.mz, 6) AS mz1, near1.intensity AS int1,
           round(near2.mz, 6) AS mz2, near2.intensity AS int2,
           ion_id, fragments
    FROM iso
    WHERE abs(near1.mz - (mz0 + {c.DELTA_MP0_MP1})) / (mz0 + {c.DELTA_MP0_MP1})
            * 1e6 < {c.PPM_PRECISION}
      AND abs(near2.mz - (mz0 + {c.DELTA_MP0_MP2})) / (mz0 + {c.DELTA_MP0_MP2})
            * 1e6 < {c.PPM_PRECISION}
      AND near1.intensity >= int0 * {c.BAND1_LO}
      AND near1.intensity <  int0 * {c.BAND1_HI}
      AND near2.intensity >= int0 * {c.BAND2_LO}
      AND near2.intensity <  int0 * {c.BAND2_HI}
    """


@_register("q35_candidate_ions", _q35_sql())
def q35_candidate_ions(spark, sf_dir):
    return candidate.candidate_ions(spark, _t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# q36 — salted two-phase per-group top-K (W5 at scale): proven equal to the
# single-phase window the oracle runs. l_returnflag has 3 values — exactly
# the low-cardinality skew case where a plain window serializes the whole
# table through 3 tasks; the salted form's phase-1 shuffle key has
# 3 × n_salts values.
# ---------------------------------------------------------------------------
@_register(
    "q36_salted_topk",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber, price, rank FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             round(l_extendedprice, 2) AS price,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             ) AS rank
      FROM lineitem
    ) WHERE rank <= 5
    """,
)
def q36_salted_topk(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    top = salted_top_k(
        li,
        keys=["l_returnflag"],
        order=[F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        k=5,
        rank_col="rank",
    )
    return top.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
        "rank",
    )
