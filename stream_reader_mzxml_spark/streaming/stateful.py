"""Stateful stream-stream shard join (SURVEY.md §2.3 J3, M5).

Reproduces the reference's MS1⋈MS2 precursor join (libCandidateIons.sc:124-137):
each ms2 record names its parent ms1 record (``precursor_ref``) and must match
within a ±2 s event-time interval. Two implementations:

1. ``interval_join_stream`` — Spark's native watermarked stream-stream join
   with an event-time range condition (the idiomatic path; state eviction is
   driven by the watermark + time bound, Catalyst handles symmetric hash join).

2. ``stateful_shard_join`` — ``applyInPandasWithState`` (per north_rule): the
   stream is keyed by the *ms1 source shard* (plus a salt on the parent doc to
   split the hot shard), so each group holds many docs and the per-group logic
   is a vectorized ``pd.merge`` — one Arrow batch per (shard, salt), never one
   Python call per doc. Per-key state buffers the shard's recent ms1 rows and
   any early-arriving ms2 rows; matches emit as both sides arrive and
   ``EventTimeTimeout`` + inline watermark purging bound the state. This is
   the reference's "collect MS2 side then probe" (glucosinolateIons.sc:28-29)
   re-expressed with bounded per-shard state instead of a full materialization.

Both emit the same rows for in-watermark data; the per-row token-array
invariant is carried by ``clean_tokens`` (pad-dropped ms2 tokens — the S8
kernel applied on the streaming path).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
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

# state: the shard's buffered ms1 rows + early ms2 arrivals, per (shard, salt)
STATE_SCHEMA = StructType(
    [
        StructField("ms1_docs", ArrayType(StringType())),
        StructField("ms1_times_us", ArrayType(LongType())),
        StructField("ms2_docs", ArrayType(StringType())),
        StructField("ms2_times_us", ArrayType(LongType())),
        StructField("ms2_sources", ArrayType(StringType())),
        StructField("ms2_refs", ArrayType(StringType())),
        StructField("ms2_tokens", ArrayType(ArrayType(IntegerType()))),
    ]
)


def split_shards(stream: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F1 — msLevel 1/2 shard split on the source prefix."""
    from stream_reader_mzxml_spark.operators.filters import shard_filter

    return shard_filter(stream, 1), shard_filter(stream, 2)


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


_EMPTY_STATE = ([], [], [], [], [], [], [])


def _match_and_split(ms1: pd.DataFrame, ms2: pd.DataFrame, delta_us: int):
    """Vectorized probe: join ms2 rows to their named ms1 parent.

    Returns (emit_rows, unmatched_ms2): an ms2 row whose parent is present
    either emits (interval holds) or is dead (interval can never hold later —
    the parent's event time is fixed), so only parent-absent rows stay
    buffered. One ``pd.merge`` per group per batch — no per-doc Python.
    """
    if len(ms2) == 0:
        return pd.DataFrame(columns=list(ms2.columns) + ["ms1_time_us"]), ms2
    if len(ms1) == 0:
        return pd.DataFrame(columns=list(ms2.columns) + ["ms1_time_us"]), ms2
    # duplicate delivery can land the same parent doc twice in the buffer;
    # a 1:N left merge would then expand rows and break the positional
    # unmatched mask below (and double-emit matches) — keep the latest
    ms1 = ms1.drop_duplicates("doc", keep="last")
    merged = ms2.merge(
        ms1.rename(columns={"doc": "ref", "t_us": "ms1_time_us"}),
        on="ref",
        how="left",
    )
    parent_known = merged["ms1_time_us"].notna()
    ok = parent_known & (
        (merged["t_us"] - merged["ms1_time_us"]).abs() <= delta_us
    )
    return merged[ok], ms2[~parent_known.to_numpy()]


def _shard_join_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(shard, salt) stateful join — vectorized over all docs of the group.

    State holds the shard's live ms1 rows (probe side) and parent-absent ms2
    rows (early arrivals). Both are purged by the watermark: an ms1 row older
    than ``wm - delta`` can never match an in-watermark ms2 row again, and a
    buffered ms2 row older than ``wm - delta`` can only be completed by an ms1
    row that would itself be beyond-watermark late. EventTimeTimeout fires a
    final purge once the shard goes quiet (SURVEY §7: bound state via
    watermark + event-time timeout without changing emitted rows).
    """
    delta_us = DELTA_SECONDS * 1_000_000
    cols = [f.name for f in JOIN_OUTPUT_SCHEMA.fields]
    wm_us = state.getCurrentWatermarkMs() * 1000

    s = state.get if state.exists else _EMPTY_STATE
    ms1 = pd.DataFrame({"doc": list(s[0]), "t_us": list(s[1])})
    ms2 = pd.DataFrame(
        {
            "doc": list(s[2]),
            "t_us": list(s[3]),
            "src": list(s[4]),
            "ref": list(s[5]),
            "toks": list(s[6]),
        }
    )

    if state.hasTimedOut:
        # purge-only invocation: no new data; drop everything the watermark
        # has passed, keep (and re-arm) only if something may still match
        keep1 = ms1[ms1["t_us"] >= wm_us - delta_us]
        keep2 = ms2[ms2["t_us"] >= wm_us - delta_us]
        if len(keep1) == 0 and len(keep2) == 0:
            state.remove()
        else:
            _save(state, keep1, keep2)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1000)
        yield pd.DataFrame(columns=cols)
        return

    new = pd.concat(list(pdfs), ignore_index=True)
    # normalize to µs regardless of pandas' ns/us datetime64 resolution
    t_us = new["event_time"].to_numpy(dtype="datetime64[us]").astype("int64")
    is_ms1 = new["source"].str.startswith("ms1-").to_numpy()

    new_ms1 = pd.DataFrame({"doc": new["doc_id"][is_ms1], "t_us": t_us[is_ms1]})
    new_ms2 = pd.DataFrame(
        {
            "doc": new["doc_id"][~is_ms1],
            "t_us": t_us[~is_ms1],
            "src": new["source"][~is_ms1],
            "ref": new["precursor_ref"][~is_ms1],
            "toks": new["tokens"][~is_ms1],
        }
    )

    ms1 = pd.concat([ms1, new_ms1], ignore_index=True)
    # probe ALL pending ms2 (buffered + new) against the updated ms1 table
    pending = pd.concat([ms2, new_ms2], ignore_index=True)
    emit, ms2 = _match_and_split(ms1, pending, delta_us)

    # watermark purge (same predicate as the timeout path)
    ms1 = ms1[ms1["t_us"] >= wm_us - delta_us]
    ms2 = ms2[ms2["t_us"] >= wm_us - delta_us]
    _save(state, ms1, ms2)
    horizon_ms = int(max(int(t_us.max()), wm_us) // 1000) + (DELTA_SECONDS + 1) * 1000
    state.setTimeoutTimestamp(max(horizon_ms, state.getCurrentWatermarkMs() + 1000))

    if len(emit) == 0:
        yield pd.DataFrame(columns=cols)
        return
    # tokens arrive pre-cleaned (JVM-side pad-drop in stateful_shard_join);
    # just normalize None → [] and count
    toks = list(emit["toks"])
    clean = [t if t is not None else [] for t in toks]
    n_clean = np.fromiter((len(t) for t in clean), dtype=np.int64, count=len(clean))
    yield pd.DataFrame(
        {
            "ms1_doc_id": emit["ref"].to_numpy(),
            "ms2_doc_id": emit["doc"].to_numpy(),
            "ms2_source": emit["src"].to_numpy(),
            "dt_seconds": (
                (emit["t_us"].to_numpy() - emit["ms1_time_us"].to_numpy().astype("int64"))
                // 1_000_000
            ),
            "clean_tokens": clean,
            "n_clean": n_clean,
        }
    )


def _save(state: GroupState, ms1: pd.DataFrame, ms2: pd.DataFrame) -> None:
    # plain-python copies: numpy scalars don't survive the state round-trip
    state.update(
        (
            [str(d) for d in ms1["doc"]],
            [int(t) for t in ms1["t_us"]],
            [str(d) for d in ms2["doc"]],
            [int(t) for t in ms2["t_us"]],
            [str(x) for x in ms2["src"]],
            [str(x) for x in ms2["ref"]],
            [[int(v) for v in (t if t is not None else [])] for t in ms2["toks"]],
        )
    )


def stateful_shard_join(
    stream: DataFrame, watermark: str = "30 seconds", n_salts: int = 8
) -> DataFrame:
    """J3 via ``applyInPandasWithState``: one pass over the unified stream.

    Group key = (ms1 source shard, salt). The shard is the parent doc's source
    — for ms1 rows their own ``source``, for ms2 rows the source prefix of
    ``precursor_ref`` (doc_id layout ``{source}-{seq:09d}``) — so a parent and
    its children always co-locate. The salt is a pure function of the parent
    doc id, splitting the hot shard (~40 % of rows) across ``n_salts`` state
    partitions: the explicit skew handling the north_rule requires where AQE
    cannot help (stateful streaming).
    """
    parent = F.coalesce("precursor_ref", "doc_id")
    keyed = (
        stream.filter(F.col("tokens").isNotNull())
        .filter(F.col("source").startswith("ms1-") | F.col("precursor_ref").isNotNull())
        .withColumn("shard", F.substring_index(parent, "-", 2))
        .withColumn("salt", F.pmod(F.hash(parent), F.lit(n_salts)))
        .withWatermark("event_time", watermark)
        # probe-side (ms1) rows never use their tokens — null them out so
        # they don't ride the Arrow transfer into Python (≈ half the volume);
        # ms2 tokens are pad-dropped (S8) HERE, JVM-side in the scan project,
        # so the Python operator only routes already-clean arrays instead of
        # re-cleaning them per batch (codegen'd filter vs numpy reduceat)
        .select(
            "shard",
            "salt",
            "doc_id",
            "source",
            "event_time",
            F.when(
                F.col("precursor_ref").isNotNull(),
                F.filter("tokens", lambda x: x != F.lit(0)),
            ).alias("tokens"),
            "precursor_ref",
        )
    )
    return keyed.groupBy("shard", "salt").applyInPandasWithState(
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
