"""Aggregation operators (SURVEY.md §2.4, A1-A10) + explicit salted two-phase agg.

Every reference aggregation is "per-record partial map, then global fold of
partials" — exactly Catalyst's partial→final HashAggregate, which we get for
free by writing ``groupBy().agg()``. What Catalyst does NOT give us is skew
handling for streaming stateful aggs — hence the explicit salting helper
(SURVEY.md §4: AQE skew handling doesn't cover streaming state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.functions.scalars import quantize_trunc


def threshold_histogram(
    df: DataFrame, thresholds: list, value_col: str = "token"
) -> DataFrame:
    """A1 — count elements ≥ each of a fixed list of thresholds.

    Reference: per-spectrum ``foldLeft(Map[Double,Int])`` incrementing every
    threshold ≤ intensity, then a global merge fold
    (MainDistributionIntensityIons.scala:42-89; 31 fixed thresholds).

    Plan: exploded values × broadcast threshold literals → groupBy(threshold).
    The cross join is against a tiny in-plan array (|thresholds| ≈ 31) and the
    count is partial-aggregated map-side before the single shuffle on the
    31-value key — at 100 TB this shuffles 31 rows per task, not the data.
    """
    th_arr = F.array(*[F.lit(float(t)) for t in sorted(thresholds)])
    return (
        df.select(
            F.explode(
                F.filter(th_arr, lambda t: t <= F.col(value_col))
            ).alias("threshold")
        )
        .groupBy("threshold")
        .agg(F.count("*").alias("cnt"))
    )


def occurrence_count(
    df: DataFrame, value_col: Column, fix: float = 1e5
) -> DataFrame:
    """A2 — quantized value-occurrence count.

    Reference: per-spectrum countByValue then global merge
    (MainDistributionMzIons.scala:66-91). ``explode → quantize → groupBy.count``;
    Catalyst's partial aggregation reproduces the per-record partial maps.
    """
    return (
        df.select(quantize_trunc(value_col, fix).alias("value"))
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
    )


def inverse_histogram(counts: DataFrame, min_count: int = 2) -> DataFrame:
    """A4 — group values by their count (count → list of values).

    Reference: ``listMat.filter(_._2 > 2).groupBy(_._2)``
    (MainDistributionMzIons.scala:100-105). ``HAVING cnt > min`` then
    groupBy(cnt) + collect_list; the list is sorted for determinism (the
    reference's Map iteration order is undefined — we pin ascending).
    """
    return (
        counts.filter(F.col("cnt") > min_count)
        .groupBy("cnt")
        .agg(F.sort_array(F.collect_list("value")).alias("values"))
    )


def group_collect(
    df: DataFrame, key: Column, collect: Column, key_name: str = "key"
) -> DataFrame:
    """A5 — group by quantized key, collect a value list (diagnosticIon.sc:37-41)."""
    return (
        df.groupBy(key.alias(key_name))
        .agg(F.sort_array(F.collect_list(collect)).alias("collected"))
    )


def salted_two_phase_count(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    agg_col: Column | None = None,
) -> DataFrame:
    """Explicit salt → partial agg → unsalt → final agg (SURVEY.md §4, M6).

    For hot keys (the 40 %-share source in the fixture; a hot shard at 10^12
    scale) a single-phase ``groupBy(key)`` sends the whole hot key to one
    reducer. Salting splits it: partial count on (key, salt) — ≤ n_salts
    partials per key, each computed map-side — then a final sum on key.
    Used where AQE can't re-plan (streaming stateful aggs) and as the explicit
    scale story for batch.

    The salt here is ``pmod(spark_partition_id(), n_salts)`` — zero extra
    hashing, stable under task retry (partition ids are fixed by the input
    split), and it spreads a hot key exactly as far as its rows are spread
    over input partitions. The streaming variants salt by a content hash
    instead (``streaming/windows.py``, ``streaming/stateful.py``) because
    state keys must not depend on physical partitioning.
    """
    cnt = agg_col if agg_col is not None else F.count(F.lit(1))
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(cnt.alias("__partial"))
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__partial").alias("cnt"))
    )


def salted_top_k(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    n_salts: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """W5 at scale — per-group top-K without a single-task sort per group.

    A plain ``row_number() OVER (PARTITION BY key)`` shuffles every row of a
    group into ONE task: with a 3-value key (q13) or a handful of probe ids
    (q29) the whole table serializes through ≤ |keys| tasks. Two-phase form:

      phase 1: rank within (key, salt) — the shuffle key has |keys|·n_salts
               values, so a hot group spreads over n_salts tasks; keep ≤ k
               rows per (key, salt).
      phase 2: re-rank the ≤ k·n_salts survivors per key — bounded input,
               the singleton-task sort is now O(k·n_salts), not O(group).

    Equality with the single-phase window holds because any row in the true
    global top-k is also in the top-k of its own salt partition (its rank
    within any subset is ≤ its global rank). Proven against the plain-window
    oracle by q36. Salt is ``pmod(spark_partition_id(), n_salts)`` — free,
    retry-stable, no physical-partitioning dependence needed here (batch only;
    streaming state keys use content hashes instead).
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    from pyspark.sql import Window

    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    partial = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        partial.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def distributed_rank(
    df: DataFrame,
    order: list[Column],
    bucket: Column,
    rank_col: str = "rank",
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY ...)`` without the single-task
    window (Spark warns "Moving all data to a single partition" — the classic
    global-rank scale hazard). Two-level decomposition, the rank analog of
    ``pipeline/mixing.py``'s distributed prefix sum:

      1. per-bucket row counts — a tiny aggregate (#buckets rows);
      2. cumulative bucket offsets — an ordered window over the PARTIALS
         table only, never the data;
      3. within-bucket ``row_number`` — partitions bounded by bucket
         population — plus the broadcast offset.

    ``bucket`` must be order-aligned: non-decreasing along the global sort
    order (e.g. ``floor(-mz0)`` for a ``desc(mz0)`` sort). Rows that tie on
    the bucket value are ordered by the within-bucket ``order``, so ties
    never straddle the decomposition. Equality with the plain global window
    is pinned by a pytest oracle (test_operators_rank)."""
    from pyspark.sql import Window

    b = df.withColumn("__b", bucket)
    counts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    ow = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(ow), F.lit(0)).alias("__off")
    )
    ww = Window.partitionBy("__b").orderBy(*order)
    return (
        b.join(F.broadcast(offsets), ["__b"])
        .withColumn(rank_col, (F.col("__off") + F.row_number().over(ww)).cast("int"))
        .drop("__b", "__off")
    )


def stream_cardinality(df: DataFrame, name: str = "n_rows"):
    """A6 — stream cardinality via ``observe`` (no second pass).

    Reference runs the pipeline TWICE (count pass then process pass,
    MainGlucosinolates.scala:105-130). Spark replaces pass 1 with an
    ``observe`` metric collected by the same single execution — returns
    (instrumented_df, observation).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias(name)), obs
