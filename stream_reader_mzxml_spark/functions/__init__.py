"""Scalar expressions + vectorized Arrow/pandas array kernels."""

from stream_reader_mzxml_spark.functions.scalars import (  # noqa: F401
    iso_duration_seconds,
    ppm_ok,
    quantize_trunc,
)
