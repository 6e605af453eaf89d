"""Batch report sinks (SURVEY.md §2.1 S10-S12).

The reference renders results to `;`-separated CSV with a header
(MainGlucosinolates.scala:138-154) or UTF-8 text lines (Main.scala:97-98);
here both are one-liner ``DataFrameWriter`` calls, kept as named helpers so
the parity is explicit and tested.

At scale: ``coalesce(1)`` is ONLY for small report outputs (top-K tables —
the reference's use case); bulk data goes through the partitioned writers /
the exactly-once streaming sink, never a single-file collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_report(
    df: DataFrame, path: str, sep: str = ";", single_file: bool = False
) -> None:
    """S11 — header + ``;``-separated CSV (MainGlucosinolates.scala:138-154)."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.option("header", True).option("sep", sep).csv(path)


def write_text_lines(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S10 — UTF-8 text-line sink (Main.scala:97-98): expects one string
    column (render with ``concat_ws`` first, the C10 form)."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.text(path)


def show_report(df: DataFrame, k: int = 40) -> None:
    """S12 — stdout top-K report (MainDistribution*.scala println loops)."""
    df.show(k, truncate=False)


def write_corpus(
    df: DataFrame,
    path: str,
    partition_col: str = "source",
    order_col: str = "doc_id",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Bulk corpus writer — the batch output side of the pipeline ops.

    Layout is chosen for the 100-TB read patterns this repo's queries use:

    - ``partitionBy(partition_col)``: source is the dominant pruning axis
      (mixture sampling, domain caps, drift all filter or group by it), so
      it becomes a directory partition — partition pruning makes
      per-source reads free;
    - ``sortWithinPartitions(order_col)``: packing/manifest order is
      doc_id, so files are written in consumption order and parquet
      min/max stats give doc_id range pruning within a source;
    - ``maxRecordsPerFile``: a Zipf-hot source would otherwise emit one
      giant file per task; capping records bounds file size without a
      skew-sensitive repartition.
    """
    (
        df.sortWithinPartitions(partition_col, order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_corpus_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 16,
    sort_col: str | None = "doc_id",
) -> None:
    """Bucketed table writer: pre-shuffles on ``bucket_col`` into
    ``n_buckets`` files per partition so downstream equi-joins/groupBys on
    that column are exchange-free (Spark reads the bucketing metadata and
    skips the shuffle). Requires a catalog table (``saveAsTable``) — plain
    ``parquet(path)`` cannot carry bucketing metadata."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
