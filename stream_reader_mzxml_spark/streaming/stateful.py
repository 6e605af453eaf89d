"""Stateful stream-stream shard join (SURVEY.md §2.3 J3, M5).

Reproduces the reference's MS1⋈MS2 precursor join (libCandidateIons.sc:124-137):
each ms2 record names its parent ms1 record (``precursor_ref``) and must match
within a ±2 s event-time interval. Two implementations:

1. ``interval_join_stream`` — Spark's native watermarked stream-stream join
   with an event-time range condition (the idiomatic path; state eviction is
   driven by the watermark + time bound, Catalyst handles symmetric hash join).

2. ``stateful_shard_join`` — ``applyInPandasWithState`` (per north_rule): the
   two shards of one source stream are grouped by join key; per-key state
   buffers the ms1 row and any early ms2 rows, emitting matches as both sides
   arrive, with ``EventTimeTimeout`` expiring state past the watermark. This
   is the reference's "collect MS2 side then probe" (glucosinolateIons.sc:28-29)
   re-expressed with bounded per-key state instead of a full materialization.

Both emit the same rows for in-watermark data; the per-row token-array
invariant is carried by ``clean_tokens`` (pad-dropped ms2 tokens — the S8
kernel applied on the streaming path).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DELTA_SECONDS = 2  # the reference's ±2 s interval (libCandidateIons.sc:128)

JOIN_OUTPUT_SCHEMA = StructType(
    [
        StructField("ms1_doc_id", StringType()),
        StructField("ms2_doc_id", StringType()),
        StructField("ms2_source", StringType()),
        StructField("dt_seconds", LongType()),
        StructField("clean_tokens", ArrayType(IntegerType())),
        StructField("n_clean", IntegerType()),
    ]
)

# state: the buffered ms1 side + early ms2 arrivals, per join key
STATE_SCHEMA = StructType(
    [
        StructField("ms1_doc_id", StringType()),
        StructField("ms1_time_us", LongType()),
        StructField("ms2_docs", ArrayType(StringType())),
        StructField("ms2_times_us", ArrayType(LongType())),
        StructField("ms2_sources", ArrayType(StringType())),
        StructField("ms2_tokens", ArrayType(ArrayType(IntegerType()))),
    ]
)


def split_shards(stream: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F1 — msLevel 1/2 shard split on the source prefix."""
    ms1 = stream.filter(F.col("source").startswith("ms1-"))
    ms2 = stream.filter(F.col("source").startswith("ms2-"))
    return ms1, ms2


def interval_join_stream(
    stream: DataFrame,
    watermark: str = "30 seconds",
    delta_seconds: int = DELTA_SECONDS,
) -> DataFrame:
    """Native watermarked stream-stream join, equi on precursor_ref + interval.

    State on both sides is bounded by (watermark + delta): Spark derives
    eviction from the time-range condition — exactly the "state sizing"
    requirement of SURVEY §7 (J3 buffers the whole MS2 side in the reference;
    here state is O(keys within the watermark horizon)).
    """
    ms1, ms2 = split_shards(stream)
    ms1 = (
        ms1.filter(F.col("tokens").isNotNull())
        .select(
            F.col("doc_id").alias("ms1_doc_id"),
            F.col("event_time").alias("ms1_time"),
        )
        .withWatermark("ms1_time", watermark)
    )
    ms2 = (
        ms2.filter(F.col("tokens").isNotNull() & F.col("precursor_ref").isNotNull())
        .select(
            F.col("doc_id").alias("ms2_doc_id"),
            F.col("source").alias("ms2_source"),
            F.col("precursor_ref"),
            F.col("event_time").alias("ms2_time"),
            F.filter("tokens", lambda x: x != F.lit(0)).alias("clean_tokens"),
        )
        .withWatermark("ms2_time", watermark)
    )
    cond = (
        (ms2["precursor_ref"] == ms1["ms1_doc_id"])
        & (ms2["ms2_time"] >= ms1["ms1_time"] - F.expr(f"INTERVAL {delta_seconds} SECONDS"))
        & (ms2["ms2_time"] <= ms1["ms1_time"] + F.expr(f"INTERVAL {delta_seconds} SECONDS"))
    )
    return ms2.join(ms1, cond, "inner").select(
        "ms1_doc_id",
        "ms2_doc_id",
        "ms2_source",
        (
            F.unix_timestamp("ms2_time") - F.unix_timestamp("ms1_time")
        ).alias("dt_seconds"),
        "clean_tokens",
        F.size("clean_tokens").alias("n_clean"),
    )


def _emit_matches(ms1_doc, ms1_us, ms2_rows, delta_us):
    out = []
    for doc, t_us, src, toks in ms2_rows:
        dt = t_us - ms1_us
        if abs(dt) <= delta_us:
            clean = [int(x) for x in (toks or []) if x != 0]
            out.append((ms1_doc, doc, src, dt // 1_000_000, clean, len(clean)))
    return out


def _shard_join_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key stateful join: buffer ms1 row + early ms2 rows, emit on match.

    Timeout (event-time) fires once the watermark passes the key's horizon —
    state is dropped, bounding memory (the graft requirement SURVEY §7:
    "bound state via watermark + event-time timeout without changing emitted
    rows for in-watermark data").
    """
    delta_us = DELTA_SECONDS * 1_000_000
    if state.hasTimedOut:
        state.remove()
        return

    if state.exists:
        ms1_doc, ms1_us, b_docs, b_times, b_srcs, b_toks = state.get
        buffered = list(zip(b_docs, b_times, b_srcs, b_toks))
    else:
        ms1_doc, ms1_us = None, None
        buffered = []

    new_ms2 = []
    max_seen_us = 0
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            t_us = int(r.event_time.value // 1_000)  # pandas ns → us
            max_seen_us = max(max_seen_us, t_us)
            if str(r.source).startswith("ms1-"):
                ms1_doc, ms1_us = r.doc_id, t_us
            else:
                # plain-int copies: numpy scalars don't survive the state pickle
                toks = [int(x) for x in r.tokens] if r.tokens is not None else []
                new_ms2.append((str(r.doc_id), t_us, str(r.source), toks))

    rows = []
    if ms1_doc is not None:
        # ms1 (re)arrived or existed: match all buffered + new ms2
        rows = _emit_matches(ms1_doc, ms1_us, buffered + new_ms2, delta_us)
        buffered = []  # emitted or out-of-interval; interval rows can't match later
    else:
        buffered = buffered + new_ms2

    state.update(
        (
            ms1_doc,
            ms1_us,
            [d for d, _, _, _ in buffered],
            [t for _, t, _, _ in buffered],
            [s for _, _, s, _ in buffered],
            [tk for _, _, _, tk in buffered],
        )
    )
    # expire the key once the watermark passes its horizon + delta; the
    # timestamp must exceed the current watermark or Spark rejects it
    horizon_ms = max(max_seen_us, ms1_us or 0) // 1000 + (DELTA_SECONDS + 1) * 1000
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(horizon_ms, wm + 1000))

    yield pd.DataFrame(
        rows, columns=[f.name for f in JOIN_OUTPUT_SCHEMA.fields]
    )


def stateful_shard_join(stream: DataFrame, watermark: str = "30 seconds") -> DataFrame:
    """J3 via ``applyInPandasWithState``: one pass over the unified stream.

    The stream is keyed by ``join_key = coalesce(precursor_ref, doc_id)`` so an
    ms1 row and its ms2 children land in the same group; per-key state holds
    the ms1 row and any ms2 rows that arrived first (cross-source disorder is
    ≤ 10 s by the data contract, within the watermark).
    """
    keyed = (
        stream.filter(F.col("tokens").isNotNull())
        .filter(F.col("source").startswith("ms1-") | F.col("precursor_ref").isNotNull())
        .withColumn("join_key", F.coalesce("precursor_ref", "doc_id"))
        .withWatermark("event_time", watermark)
        .select("join_key", "doc_id", "source", "event_time", "tokens")
    )
    return keyed.groupBy("join_key").applyInPandasWithState(
        _shard_join_fn,
        outputStructType=JOIN_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def shard_join_batch_oracle(df: DataFrame, delta_seconds: int = DELTA_SECONDS) -> DataFrame:
    """Batch re-statement of the same semantics (the test oracle): ms2 rows
    joined to their named ms1 parent within ±delta, pad-dropped tokens."""
    ms1, ms2 = split_shards(df)
    ms1 = ms1.filter(F.col("tokens").isNotNull()).select(
        F.col("doc_id").alias("ms1_doc_id"), F.col("event_time").alias("ms1_time")
    )
    ms2 = ms2.filter(
        F.col("tokens").isNotNull() & F.col("precursor_ref").isNotNull()
    ).select(
        F.col("doc_id").alias("ms2_doc_id"),
        F.col("source").alias("ms2_source"),
        "precursor_ref",
        F.col("event_time").alias("ms2_time"),
        F.filter("tokens", lambda x: x != F.lit(0)).alias("clean_tokens"),
    )
    j = ms2.join(ms1, ms2["precursor_ref"] == ms1["ms1_doc_id"], "inner").filter(
        F.abs(F.unix_timestamp("ms2_time") - F.unix_timestamp("ms1_time"))
        <= delta_seconds
    )
    return j.select(
        "ms1_doc_id",
        "ms2_doc_id",
        "ms2_source",
        (F.unix_timestamp("ms2_time") - F.unix_timestamp("ms1_time")).alias(
            "dt_seconds"
        ),
        "clean_tokens",
        F.size("clean_tokens").alias("n_clean"),
    )
