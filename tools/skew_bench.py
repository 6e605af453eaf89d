"""Adversarial-skew benchmark (VERDICT r4 item 8): salted vs unsalted twins
on a 90%-hot-key input — proving the salting is load-bearing, not ceremony.

Three comparisons:

A. per-group top-K window: ``salted_top_k`` vs the plain single-phase
   ``row_number() OVER (PARTITION BY key)`` on a 20M-row frame where one key
   holds 90% of rows. The plain window has NO partial aggregation — the hot
   group serializes through one task; this is the case salting exists for.

B. streaming stateful shard join: ``stateful_shard_join(n_salts=32)`` vs
   ``n_salts=1`` (the unsalted twin — one state partition per shard) on a
   sequences stream regenerated with a 90%-hot source.

C. groupBy count: ``salted_two_phase_count`` vs plain ``groupBy().count()``.
   EXPECTED ~no delta: count has map-side partial aggregation, so the hot
   key never serializes — recorded to show where salting is NOT needed
   (hash-agg skew is already solved by Spark; windows and state are not).

All inputs deterministic; interleaved best-of-2 per pair.

Usage: python tools/skew_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WINDOW_ROWS = 20_000_000
N_SEQ_ROWS = 1_000_000
HOT_SHARE = 0.9


def _timed(fn, trials: int = 2) -> list[float]:
    walls = []
    for _ in range(trials):
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 2))
    return walls


def bench_window(spark) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stream_reader_mzxml_spark.operators.aggregates import salted_top_k

    # 90% of rows land on key 'hot' (pure function of id — deterministic)
    df = spark.range(N_WINDOW_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < int(HOT_SHARE * 10), F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50))))
        .alias("source"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).alias("priority"),
    )

    def plain():
        w = Window.partitionBy("source").orderBy(F.asc("priority"), F.asc("doc_id"))
        (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .write.format("noop").mode("overwrite").save()
        )

    def salted():
        salted_top_k(
            df, keys=["source"], order=[F.asc("priority"), F.asc("doc_id")], k=10
        ).write.format("noop").mode("overwrite").save()

    out = {}
    for _ in range(2):  # interleaved
        out.setdefault("plain", []).extend(_timed(plain, 1))
        out.setdefault("salted", []).extend(_timed(salted, 1))
    return {
        "rows": N_WINDOW_ROWS,
        "plain_walls": out["plain"],
        "salted_walls": out["salted"],
        "plain_best": min(out["plain"]),
        "salted_best": min(out["salted"]),
        "speedup": round(min(out["plain"]) / min(out["salted"]), 2),
    }


def bench_count(spark) -> dict:
    from pyspark.sql import functions as F

    from stream_reader_mzxml_spark.operators.aggregates import (
        salted_two_phase_count,
    )

    df = spark.range(N_WINDOW_ROWS).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < int(HOT_SHARE * 10), F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50))))
        .alias("source"),
    )

    def plain():
        df.groupBy("source").count().write.format("noop").mode("overwrite").save()

    def salted():
        salted_two_phase_count(df, ["source"]).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for _ in range(2):
        out.setdefault("plain", []).extend(_timed(plain, 1))
        out.setdefault("salted", []).extend(_timed(salted, 1))
    return {
        "rows": N_WINDOW_ROWS,
        "plain_walls": out["plain"],
        "salted_walls": out["salted"],
        "plain_best": min(out["plain"]),
        "salted_best": min(out["salted"]),
        "speedup": round(min(out["plain"]) / min(out["salted"]), 2),
    }


def bench_stateful(spark) -> dict:
    from stream_reader_mzxml_spark import datagen
    from stream_reader_mzxml_spark.sources.readers import read_sequences_stream
    from stream_reader_mzxml_spark.streaming.stateful import stateful_shard_join

    # regenerate with a 90%-hot source (module constant patched for the
    # duration of the build — deterministic, bench-only input)
    skew_path = "/tmp/skew_seq_90"
    if not os.path.isdir(skew_path) or not os.listdir(skew_path):
        orig = datagen.HOT_SOURCE_SHARE
        datagen.HOT_SOURCE_SHARE = HOT_SHARE
        try:
            datagen.write_sequences(skew_path, N_SEQ_ROWS, seed=42, rows_per_file=62_500)
        finally:
            datagen.HOT_SOURCE_SHARE = orig

    def run(n_salts: int) -> float:
        ck_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        ckpt = tempfile.mkdtemp(prefix=f"skew_ck_{n_salts}_", dir=ck_base)
        stream = read_sequences_stream(spark, skew_path, max_files_per_trigger=4)
        t0 = time.monotonic()
        q = (
            stateful_shard_join(stream, n_salts=n_salts)
            .writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.monotonic() - t0, 2)
        shutil.rmtree(ckpt, ignore_errors=True)
        return wall

    run(32)  # warmup (streaming plan codegen / worker pool)
    out = {"unsalted": [], "salted": []}
    for _ in range(2):
        out["unsalted"].append(run(1))
        out["salted"].append(run(32))
    return {
        "rows": N_SEQ_ROWS,
        "hot_share": HOT_SHARE,
        "unsalted_walls": out["unsalted"],
        "salted_walls": out["salted"],
        "unsalted_best": min(out["unsalted"]),
        "salted_best": min(out["salted"]),
        "speedup": round(min(out["unsalted"]) / min(out["salted"]), 2),
    }


def main(out_path: str = "SKEW_BENCH_r5.json"):
    from stream_reader_mzxml_spark.session import get_spark

    spark = get_spark(app_name="skew_bench", cpus=32, shuffle_partitions=32)
    out = {
        "window_topk": bench_window(spark),
        "groupby_count": bench_count(spark),
        "stateful_join": bench_stateful(spark),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SKEW_BENCH_r5.json")
