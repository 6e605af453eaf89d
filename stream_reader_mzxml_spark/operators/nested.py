"""Nested record model: the reference's ``precursorMz: Seq[PrecursorMz]``
(Spectrum.scala:36; element struct MzXMLTags.scala:189-197) as a Spark
``ArrayType(StructType)`` column, plus the entry-point-2 None-PRESERVING
precursor gate (SpectrumRequest.scala:40-53).

The struct-array is DERIVED deterministically from the driver's
``embeddings`` table (no synthetic data): per row, ``vec_id % 9`` entries
``struct(value, intensity, scan_num)`` where value rides the embedding
component, intensity is a portable arithmetic hash with ~5 % NULLs
(mirroring ``precursorIntensity: Option[Double]``), and scan_num is the
global position. The derivation is a pure column expression in the scan's
project — no shuffle, exactly how a nested parquet/Iceberg column would
arrive already-structured at 100 TB.

EP2 semantics reproduced precisely (SpectrumRequest.scala:46-51):

- empty precursor list          → None (row kept, payload nulled)
- ``exists(p -> precisionTest(mz, p.value, ppm) AND p.intensity exists AND
  p.intensity > min)``          → Some(scan), else None
- NULL intensity FAILS its element's test (``Option.exists``), it does not
  poison the row — hence the explicit ``isNotNull`` guard inside the lambda
  so the higher-order ``exists`` never sees a NULL predicate.
- rows are **not filtered out** — they become None the caller must drop
  (Main.scala:91-95); we emit every input row with nullable match columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.functions.scalars import ppm_ok

PREC_DIM = 8  # max precursor entries per record


def precursors_expr(
    base_value: float = 500.0, id_col: str = "vec_id"
) -> Column:
    """The ``precursors`` derivation as a bare Column expression, so programs
    that need precursors AND peaks from the same source row (q68) can attach
    it row-locally instead of self-joining ``with_precursors``' projection
    back onto the spectrum model."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    n = F.pmod(F.col(id_col), F.lit(PREC_DIM + 1)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def scan_num(i: Column) -> Column:
        return (F.col(id_col) * PREC_DIM + i).cast("long")

    precs = F.transform(
        idx,
        lambda i: F.struct(
            (F.lit(base_value) + F.element_at(v, (i + 1).cast("int")) * 10).alias(
                "value"
            ),
            F.when(
                F.pmod(scan_num(i), F.lit(19)) == 0, F.lit(None).cast("double")
            )
            .otherwise(F.pmod(scan_num(i) * 37, F.lit(1000)).cast("double"))
            .alias("intensity"),
            scan_num(i).alias("scan_num"),
        ),
    )
    return precs


def with_precursors(
    emb: DataFrame, base_value: float = 500.0, id_col: str = "vec_id"
) -> DataFrame:
    """Derive ``precursors: array<struct<value,intensity,scan_num>>``.

    Entry count = ``vec_id % 9`` (0..8; empty lists exercise the nonEmpty →
    None branch). intensity = ``(scan_num * 37) % 1000`` as double, NULL when
    ``scan_num % 19 == 0`` (the Option[Double] analog) — pure arithmetic so
    the DuckDB oracle reproduces it bit-for-bit."""
    return emb.select(
        F.col(id_col),
        precursors_expr(base_value, id_col).alias("precursors"),
    )


def precursor_request_gate(
    df: DataFrame,
    mz: float,
    min_intensity: float,
    ppm: float,
    id_col: str = "vec_id",
) -> DataFrame:
    """EP2 None-preserving gate over the nested struct-array column.

    One output row PER input row (None-preserving); ``passed = 0`` rows carry
    NULL match columns — the ``None`` the caller's is-defined filter (F2)
    would drop. The predicate is the reference's
    ``precisionTest(mz, p.value, ppm) && p.precursorIntensity.exists(_ > min)``
    as a JVM higher-order ``exists``/``filter`` over ArrayType(StructType) —
    whole-stage-codegen'd in the scan project, no shuffle, no Python."""

    def match(p: Column) -> Column:
        return (
            ppm_ok(F.lit(mz), p["value"], ppm)
            & p["intensity"].isNotNull()
            & (p["intensity"] > F.lit(min_intensity))
        )

    matches = F.filter(F.col("precursors"), match)
    passed = (F.size("precursors") > 0) & F.exists(F.col("precursors"), match)
    return df.select(
        F.col(id_col),
        F.size("precursors").alias("n_prec"),
        passed.cast("int").alias("passed"),
        F.when(passed, F.size(matches)).alias("n_match"),
        F.when(passed, F.round(F.element_at(matches, 1)["value"], 6)).alias(
            "first_match_value"
        ),
    )
