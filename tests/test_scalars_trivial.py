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
        # parity subtlety: Scala's String.trim strips EVERY char <= U+0020
        # (tabs, newlines, other C0 controls like \x01), Spark's F.trim
        # strips spaces only, and Java's \S keeps a line of \x01s — the
        # exact-parity predicate is rlike('[^\x00-\x20]')
        from stream_reader_mzxml_spark.operators.filters import nonblank_lines

        df = spark.createDataFrame(
            [("a",), ("  ",), ("",), ("\tb \n",), (" \n\t ",), ("\x01\x02",)],
            ["line"],
        )
        kept = [r.line for r in nonblank_lines(df, "line").collect()]
        assert kept == ["a", "\tb \n"]  # \x01\x02 dropped, like Scala trim

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
