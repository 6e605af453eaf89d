"""Filter/projection operators (SURVEY.md §2.2, F1-F9).

All are Catalyst Column expressions — they push down to the parquet/Iceberg
scan (predicate pushdown + partition pruning), which is the Spark-native
replacement of the reference's XPath structural filter
(XmlStreamRequest.scala:25, SpectrumRequest.scala:19).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.functions.scalars import rt_range_predicate


def shard_filter(df: DataFrame, level: int) -> DataFrame:
    """F1 — msLevel equality filter → shard selection on ``source``.

    Reference: XPath predicate ``//scan[@msLevel=="n"]``
    (SpectrumRequest.scala:18-30). Graft: sources encode the shard as a
    ``ms{level}-`` prefix; the startswith predicate is pushed to the scan
    (and would prune partitions on a source-partitioned Iceberg table).
    """
    return df.filter(F.col("source").startswith(f"ms{level}-"))


def defined_filter(df: DataFrame, col: str = "tokens") -> DataFrame:
    """F2 — drop fail-soft parse failures (``.filter(_.isDefined)``).

    Reference: every pipeline, e.g. MainDistributionIntensityIons.scala:65-66.
    """
    return df.filter(F.col(col).isNotNull())


def event_time_range(df: DataFrame, start, end, col: str = "event_time") -> DataFrame:
    """F3 — retention-time range gate with the reference's asymmetric null
    semantics (MainDistributionIntensityIons.scala:67-68): NULL substitutes 0
    on the lower bound and MaxValue on the upper bound.
    """
    return df.filter(rt_range_predicate(F.col(col), start, end))


def min_value_elements(tokens: Column, min_value) -> Column:
    """F4 — element-level threshold filter inside the array.

    Reference: ``intensity > minIntensity`` per peak
    (MainDistributionMzIons.scala:69 et al.). Built-in higher-order
    ``filter()`` — stays JVM-side, no UDF.
    """
    return F.filter(tokens, lambda x: x > F.lit(min_value))


def drop_pad_tokens(tokens: Column, pad=0) -> Column:
    """S8 — zero-intensity pruning analog: drop pad tokens from the array.

    Reference: ``.filter(_._2 > 0)`` at decode (MzXMLTags.scala:326).
    """
    return F.filter(tokens, lambda x: x != F.lit(pad))


def nonempty_filter(df: DataFrame, col: str) -> DataFrame:
    """F8 — keep rows whose collection column is non-empty
    (MainPrecursorMzMatchingGlucosinolate.scala:119, libCandidateIons.sc:133-135).
    """
    return df.filter(F.size(F.col(col)) > 0)


def nonblank_lines(df: DataFrame, col: str) -> DataFrame:
    """F9 — drop blank rendered lines (``.filter(_.trim.nonEmpty)``,
    MainPrecursorMzMatchingGlucosinolate.scala:61).

    Parity note: Scala's ``String.trim`` strips every char ≤ U+0020 (tabs,
    newlines, AND other C0 controls like \\x01), while Java's ``\\S`` only
    excludes ``[ \\t\\n\\x0B\\f\\r]`` — so the exact-parity predicate is
    "contains any char above U+0020" (``rlike('[^\\x00-\\x20]')``), not
    ``rlike('\\S')`` which would keep a line of \\x01s the reference drops."""
    return df.filter(F.col(col).rlike(r"[^\x00-\x20]"))
