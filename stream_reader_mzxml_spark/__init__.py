"""stream_reader_mzxml_spark — a from-scratch PySpark-native streaming analytics engine.

Re-expresses the query/data-processing capabilities of the reference
``p2m2/stream-reader-mzxml`` (a Scala/FS2 mzXML scan streamer) as an idiomatic
Spark engine over tables of pre-tokenized training sequences
``(doc_id string, tokens array<int>, n_tok int, source string, event_time timestamp)``.

Layout
------
- ``session``    SparkSession factory (Arrow on, AQE on, UTC)
- ``datagen``    deterministic synthetic ``sequences`` generator (seeded)
- ``functions``  scalar expressions + vectorized Arrow/pandas array kernels
- ``operators``  filters / joins (band, as-of, interval) / two-phase aggregations
- ``plans``      the six reference analytics programs as DataFrame pipelines
- ``sources``    batch + rate-limited micro-batch readers, sinks
- ``streaming``  windows, watermarks, stateful shard join, exactly-once sink,
                 per-partition lineage/metrics

The reference is cited throughout as ``file.scala:line`` so parity is checkable;
no reference code is copied — all execution is Spark DataFrame/SQL + pandas UDFs.
"""

__version__ = "0.1.0"
