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
