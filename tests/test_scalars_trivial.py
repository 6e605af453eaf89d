"""Tests for the one-line expression operators the round-1 verdict listed as
untested-trivial (F9 blank-line filter, C11 contains-@/URI, C12 filename
derivation, S12 report render) — pinned against hand goldens so every
SURVEY §2 row has a test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
class TestTrivialExprs:
    def test_f9_blank_line_filter(self, spark):
        # F9 — `.filter(_.trim.nonEmpty)` (MainPrecursorMzMatchingGlucosinolate.scala:61)
        # parity subtlety: Spark's F.trim strips SPACES only, while Scala's
        # String.trim strips all chars <= U+0020 (tabs, newlines) — the
        # faithful Spark expression is rlike("\\S") (any non-whitespace)
        df = spark.createDataFrame(
            [("a",), ("  ",), ("",), ("\tb \n",), (" \n\t ",)], ["line"]
        )
        kept = [r.line for r in df.filter(F.col("line").rlike("\\S")).collect()]
        assert kept == ["a", "\tb \n"]

    def test_c11_contains_at_and_uri(self, spark):
        # C11 — contact-email / URI sniffing exprs (MzXMLTags contact fields)
        df = spark.createDataFrame(
            [
                ("someone@example.org", "https://example.org/x"),
                ("not-an-email", "ftp://example.org"),
                ("a@b", "no-scheme"),
            ],
            ["contact", "uri"],
        )
        out = df.select(
            F.col("contact").contains("@").alias("has_at"),
            F.col("uri").rlike("^[a-z]+://").alias("is_uri"),
        ).collect()
        assert [(r.has_at, r.is_uri) for r in out] == [
            (True, True),
            (False, True),
            (True, False),
        ]

    def test_c12_filename_derivation(self, spark):
        # C12 — output-filename derivation from the input path (Main.scala:96,
        # `mzXMLFile.split("/").last + ".out"` shape), as a column expr
        df = spark.createDataFrame(
            [("/data/run1/sample_A.mzXML",), ("rel/path/b.mzXML",)], ["path"]
        )
        out = [
            r.fname
            for r in df.select(
                F.concat(
                    F.element_at(F.split("path", "/"), -1), F.lit(".out")
                ).alias("fname")
            ).collect()
        ]
        assert out == ["sample_A.mzXML.out", "b.mzXML.out"]

    def test_s12_report_render(self, spark):
        # S12 — the stdout top-K report line (MainDistributionMzIons.scala:97-110
        # `println(s"$value\t$count")` shape) rendered as a column, ordered
        df = spark.createDataFrame(
            [(2.5, 10), (1.0, 30), (3.0, 20)], ["value", "cnt"]
        )
        lines = [
            r.line
            for r in df.orderBy(F.desc("cnt"))
            .select(F.format_string("%.2f\t%d", "value", "cnt").alias("line"))
            .collect()
        ]
        assert lines == ["1.00\t30", "3.00\t20", "2.50\t10"]
