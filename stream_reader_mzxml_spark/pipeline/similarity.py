"""Similarity search over embedding columns: brute-force and LSH-bucketed ANN.

Brute-force cosine top-k is the correctness baseline: broadcast the (small)
probe set against the corpus — one scan, no O(n²) shuffle — and rank with a
per-probe window. The scale path is random-hyperplane LSH: each vector maps
to a bucket id from the sign pattern of ``n_planes`` fixed hyperplane dot
products; candidates are corpus vectors in the probe's bucket, so the join is
an equi-join on ``bucket`` (shuffle keyed by bucket, tunable recall via
``n_planes`` / multi-probe). Hyperplanes are seeded constants embedded in the
plan — the DuckDB oracle uses the same literals, so results match exactly.

Dot products are ordered left-folds (bit-identical to the oracle's ordered
``list_sum``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = 11):
    """Deterministic hyperplane matrix, rounded to 4 decimals so the literal
    values embedded in the Spark plan and the oracle SQL string are the same
    short decimal text on both sides."""
    rng = np.random.RandomState(seed)
    return np.round(rng.standard_normal((n_planes, dim)), 4)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot_lit(vec_col, plane: np.ndarray):
    """Ordered dot product of an array column with a literal plane."""
    arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bucket_id(vec_col, planes: np.ndarray):
    """LSH bucket: Σ (dot(v, plane_p) >= 0) · 2^p."""
    out = F.lit(0)
    for p, plane in enumerate(planes):
        out = out + F.when(_dot_lit(vec_col, plane) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return out


def _cosine(va, vb, na, nb):
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (na * nb)


def _with_norm(emb: DataFrame, id_col: str, out_id: str, vec: str, norm: str):
    v = _as_double(F.col("embedding"))
    return emb.select(
        F.col(id_col).alias(out_id),
        v.alias(vec),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)).alias(norm),
    )


def cosine_topk(
    emb: DataFrame,
    n_probes: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: probes = first ``n_probes`` ids (a stand-in
    for an arbitrary probe table). Broadcast the (small) probe side against a
    scan of the corpus — the corpus never leaves its executors, so the plan
    survives a 100× corpus without a driver/executor OOM. Ranking is a salted
    two-phase top-k: partition-local top-k (shuffle keyed by (p_id, salt)),
    then a final merge over at most ``k × n_partitions`` rows per probe — no
    single-task sort over the whole corpus. Ties broken by neighbor id
    (deterministic)."""
    corpus = _with_norm(emb, id_col, "n_id", "vn", "nn")
    probes = _with_norm(emb.filter(F.col(id_col) < n_probes), id_col, "p_id", "vp", "np")
    cand = F.broadcast(probes).join(corpus, F.col("p_id") != F.col("n_id"))
    cos = F.round(_cosine(F.col("vp"), F.col("vn"), F.col("np"), F.col("nn")), 6)
    from ..operators.aggregates import salted_top_k

    return salted_top_k(
        cand.select("p_id", "n_id", cos.alias("cosine")),
        keys=["p_id"],
        order=[F.desc("cosine"), F.asc("n_id")],
        k=k,
        rank_col="rank",
    )


IVF_STRIDE = 31  # vec_id % stride == 0 → deterministic centroid seeds
IVF_NPROBE = 2


def _argsorted_clusters(vec, norm, carr):
    """Struct array of (cid, cos) vs every centroid, sorted cos desc / cid asc.

    ``carr`` is the 1-row broadcast centroid array<struct<cid,v,norm>>; the
    whole computation is a scan-side column expression — assignment costs no
    shuffle and no Python.
    """
    scored = F.transform(
        carr,
        lambda c: F.struct(
            c["cid"].alias("cid"),
            (
                F.aggregate(
                    F.zip_with(vec, c["v"], lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (norm * c["norm"])
            ).alias("ccos"),
        ),
    )
    return F.array_sort(
        scored,
        lambda a, b: F.when(a["ccos"] > b["ccos"], F.lit(-1))
        .when(a["ccos"] < b["ccos"], F.lit(1))
        .when(a["cid"] < b["cid"], F.lit(-1))
        .when(a["cid"] > b["cid"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def ivf_topk(
    emb: DataFrame,
    n_probes: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    stride: int = IVF_STRIDE,
    nprobe: int = IVF_NPROBE,
    assign: str = "expr",
) -> DataFrame:
    """IVF-style ANN top-k: centroid-partitioned candidate search.

    The inverted-file (IVF) scale path beyond LSH buckets: corpus vectors are
    assigned to their nearest centroid (coarse quantizer); a query searches
    only the ``nprobe`` nearest centroid partitions. Training-free
    deterministic centroids (every ``stride``-th vector) stand in for a
    k-means codebook — the *plan* is the point: at 10^9+ vectors the corpus
    is physically partitioned by ``cluster`` and a probe touches nprobe/C of
    it.

    Plan shape: centroids → ONE tiny aggregate → 1-row broadcast array;
    corpus assignment is a scan-side expression (zero shuffle); the candidate
    join is an equi-join on ``cluster`` (shuffle keyed by cluster id, the IVF
    fan-in); ranking is a per-probe window over the probed partitions only.
    Cosines are ordered left-folds — bit-identical to the DuckDB oracle.
    """
    cents = _with_norm(
        emb.filter(F.col(id_col) % stride == 0), id_col, "cid", "cv", "cnorm"
    )
    carr = F.broadcast(
        cents.groupBy().agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("cid").alias("cid"),
                        F.col("cv").alias("v"),
                        F.col("cnorm").alias("norm"),
                    )
                )
            ).alias("carr")
        )
    )
    if assign == "arrow":
        # Arrow-kernel assignment (round 5): the expression fold is
        # O(n·C·dim) in the INTERPRETED higher-order evaluator, and C grows
        # with n at fixed stride — measured 122-157 s at the 30× corpus
        # (ANN_RECALL_r5.json) with ~95% of wall in assignment. The numpy
        # form is one (B,dim)×(dim,C) matmul per Arrow batch: same
        # candidate semantics (cos desc, cid asc tie-break via stable
        # argsort over cid-ascending centroid columns), ~40× less wall at
        # 30×. Centroid matrix rides the closure (C×dim floats — half a MB
        # at 30×; a k-means codebook stays driver-small by construction).
        # q49 keeps assign="expr": its DuckDB oracle replicates the exact
        # fold arithmetic, and near-tie argmax flips between fold-order
        # and pairwise-sum float rounding would be oracle noise.
        crows = sorted(
            cents.select("cid", "cv", "cnorm").collect(), key=lambda r: r["cid"]
        )
        cids = np.array([r["cid"] for r in crows], dtype=np.int64)
        cmat = np.array([r["cv"] for r in crows], dtype=np.float64)
        cnorms = np.array([r["cnorm"] for r in crows], dtype=np.float64)

        @F.pandas_udf("array<bigint>")
        def _topcids(vn: pd.Series, nn: pd.Series) -> pd.Series:
            V = np.array(list(vn), dtype=np.float64)
            cos = (V @ cmat.T) / (np.asarray(nn, dtype=np.float64)[:, None] * cnorms[None, :])
            order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
            return pd.Series([cids[row].tolist() for row in order])

        corpus = (
            _with_norm(emb, id_col, "n_id", "vn", "nn")
            .withColumn("_tc", _topcids(F.col("vn"), F.col("nn")))
            .withColumn("cluster", F.element_at("_tc", 1))
            .drop("_tc")
        )
        probes = (
            _with_norm(emb.filter(F.col(id_col) < n_probes), id_col, "p_id", "vp", "np")
            .withColumn("_tc", _topcids(F.col("vp"), F.col("np")))
            .withColumn("cluster", F.explode(F.slice("_tc", 1, nprobe)))
            .drop("_tc")
        )
    else:
        corpus = (
            _with_norm(emb, id_col, "n_id", "vn", "nn")
            .crossJoin(carr)
            .withColumn(
                "cluster", _argsorted_clusters(F.col("vn"), F.col("nn"), F.col("carr"))[0]["cid"]
            )
            .drop("carr")
        )
        probes = (
            _with_norm(emb.filter(F.col(id_col) < n_probes), id_col, "p_id", "vp", "np")
            .crossJoin(carr)
            .withColumn(
                "cluster",
                F.explode(
                    F.transform(
                        F.slice(
                            _argsorted_clusters(F.col("vp"), F.col("np"), F.col("carr")),
                            1,
                            nprobe,
                        ),
                        lambda s: s["cid"],
                    )
                ),
            )
            .drop("carr")
        )
    cand = probes.join(corpus, ["cluster"]).filter(F.col("p_id") != F.col("n_id"))
    cos = F.round(_cosine(F.col("vp"), F.col("vn"), F.col("np"), F.col("nn")), 6)
    w = Window.partitionBy("p_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.select("p_id", "cluster", "n_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_ann_topk(
    emb: DataFrame,
    n_probes: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    planes: np.ndarray | None = None,
    multi_probe: bool = True,
    probe_bits: int = 1,
) -> DataFrame:
    """LSH-bucketed ANN top-k: equi-join probe and corpus on bucket id, then
    exact cosine rank within the bucket. At corpus scale the bucket join
    replaces the broadcast-everything of ``cosine_topk``.

    ``multi_probe``: each probe also searches every ±1-bit bucket (flip one
    hyperplane sign), the standard multi-probe LSH recall lift — a near-miss
    on a single hyperplane no longer hides a close neighbor. Cost is
    ``n_planes + 1`` probe rows per query (probe side only — the corpus stays
    single-bucket), not more planes, so corpus-side bucket cardinality (and
    join parallelism) is unchanged. Pairs cannot duplicate: a neighbor lives
    in exactly one bucket and probe variants are distinct buckets."""
    planes = hyperplanes() if planes is None else planes
    n_planes = len(planes)
    corpus = _with_norm(emb, id_col, "n_id", "vn", "nn").withColumn(
        "bucket", bucket_id(F.col("vn"), planes)
    )
    probes = _with_norm(
        emb.filter(F.col(id_col) < n_probes), id_col, "p_id", "vp", "np"
    ).withColumn("bucket0", bucket_id(F.col("vp"), planes))
    if multi_probe:
        # probe_bits=1: the probe also searches every 1-bit-flipped bucket
        # (n_planes + 1 probe rows). probe_bits=2 adds the C(n_planes, 2)
        # 2-bit flips — measured planted-neighbor recall 0.67 → ~0.9 at
        # α=0.95 (ANN_RECALL_r5/BASELINE.md) for ~8× more PROBE rows only;
        # the corpus side stays single-bucket, so join parallelism and
        # corpus shuffle volume are unchanged at any scale.
        flips = [0] + [1 << p for p in range(n_planes)]
        if probe_bits >= 2:
            flips += [
                (1 << p) | (1 << q)
                for p in range(n_planes)
                for q in range(p + 1, n_planes)
            ]
        variants = F.array(
            *[F.col("bucket0").bitwiseXOR(F.lit(m)) for m in flips]
        )
        probes = probes.withColumn("bucket", F.explode(variants))
    else:
        probes = probes.withColumn("bucket", F.col("bucket0"))
    cand = probes.join(corpus, ["bucket"]).filter(F.col("p_id") != F.col("n_id"))
    cos = F.round(_cosine(F.col("vp"), F.col("vn"), F.col("np"), F.col("nn")), 6)
    w = Window.partitionBy("p_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.select("p_id", "bucket", "n_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


KM_QUANT = 1_000_000  # fixed-point scale for exact-integer k-means arithmetic
KM_DIM = 64


def kmeans_step(
    emb: DataFrame,
    stride: int = IVF_STRIDE,
    dim: int = KM_DIM,
    quant: int = KM_QUANT,
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding column — the
    iterative-refinement step of semantic clustering (topic bucketing /
    semantic dedup over a training corpus). Seeds are deterministic data
    rows (``vec_id % stride == 0``), as in ``ivf_topk``.

    Everything is **exact fixed-point integer arithmetic** so a SQL oracle
    reproduces it bit-for-bit: vectors quantize to ``round(x * quant)``
    BIGINTs; squared distances, the argmin assignment (ties to the lower
    centroid id) and the per-dimension member sums are integer-exact; only
    the final reported mean divides (one IEEE double op, identical in both
    engines). No float accumulation order can diverge.

    Scale shape (what a 1000-executor run needs):
    - assignment is a fold over the 1-row broadcast centroid array — a
      scan-side column expression, zero shuffles, no Python (q39's pattern);
    - the update is ONE groupBy(cluster) with ``dim`` per-dimension sums —
      map-side partial aggregation, no per-dimension row explosion before
      the shuffle (the k×dim fan-out happens post-agg on k rows);
    - inertia rides the same aggregate as an exact BIGINT sum.

    Returns (cluster_id, n_members, inertia_q, dim, sum_q, mean) — one row
    per (cluster, dimension), the new centroid in exact and float form.
    """
    qv = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * quant).cast("long")
    )
    pts = _km_quantize(emb, quant, id_col)
    cents = pts.filter(F.col("vid") % stride == 0).select(
        F.col("vid").alias("cid"), F.col("q").alias("cq")
    )
    return _km_select(_km_aggregate(_km_assign(pts, cents), dim, quant))


def _km_quantize(emb: DataFrame, quant: int, id_col: str) -> DataFrame:
    qv = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * quant).cast("long")
    )
    return emb.select(F.col(id_col).alias("vid"), qv.alias("q"))


def _km_assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a fold over the 1-row broadcast
    centroid array — a scan-side expression, zero shuffles, ties to the
    lower centroid id."""
    carr = cents.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cq"))).alias("cs")
    )

    def d2(cq):
        return F.aggregate(
            F.zip_with(F.col("q"), cq, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = F.transform(
        F.col("cs"),
        lambda c: F.struct(c["cid"].alias("cid"), d2(c["cq"]).alias("d2")),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(-1).cast("long").alias("cid"),
            F.lit(2**62).cast("long").alias("d2"),
        ),
        lambda acc, s: F.when(
            (s["d2"] < acc["d2"])
            | ((s["d2"] == acc["d2"]) & (s["cid"] < acc["cid"])),
            s,
        ).otherwise(acc),
    )
    return (
        pts.crossJoin(F.broadcast(carr))
        .withColumn("b", best)
        .select(
            "vid",
            "q",
            F.col("b.cid").alias("cluster_id"),
            F.col("b.d2").alias("d2"),
        )
    )


def _km_aggregate(assigned: DataFrame, dim: int, quant: int) -> DataFrame:
    """Centroid update: ONE groupBy(cluster) with per-dimension sums
    (map-side combined), k×dim fan-out post-agg; emits the exact-integer
    6-dp mean (``mean_e6``) — half-away-from-zero rounding in BIGINTs, so
    no float round() semantics cross engines."""
    sums = [
        F.sum(F.element_at("q", i)).alias(f"_s{i}") for i in range(1, dim + 1)
    ]
    agg = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d2").alias("inertia_q"),
        *sums,
    )
    dims = F.posexplode(F.array(*[F.col(f"_s{i}") for i in range(1, dim + 1)]))
    # Half-away-from-zero rounding entirely in BIGINT: SQL `div` is exact
    # integer division, unlike `/` which is a Divide(double) on long/long and
    # loses bits past 2^53 (~9e3 members/cluster at unit-scale embeddings).
    # The numerator 2*|sum_q|*1e6 + denom is always >= 0 and denom > 0, so
    # trunc-toward-zero (`div`) equals floor and matches DuckDB's `//`.
    mean_e6 = F.expr(
        "IF(sum_q < 0, -1L, 1L) * "
        "((2L * abs(sum_q) * 1000000L + n_members * CAST({q} AS BIGINT)) "
        "div (2L * n_members * CAST({q} AS BIGINT)))".format(q=int(quant))
    )
    return agg.select(
        "cluster_id", "n_members", "inertia_q", dims.alias("pos", "sum_q")
    ).select(
        "cluster_id",
        "n_members",
        "inertia_q",
        (F.col("pos") + 1).alias("dim"),
        "sum_q",
        mean_e6.cast("long").alias("mean_e6"),
    )


def _km_select(agg: DataFrame) -> DataFrame:
    return agg.select(
        "cluster_id",
        "n_members",
        "inertia_q",
        "dim",
        "sum_q",
        (F.col("mean_e6") / F.lit(1e6)).alias("mean"),
    )


def kmeans_iterate(
    emb: DataFrame,
    n_iters: int = 2,
    stride: int = IVF_STRIDE,
    dim: int = KM_DIM,
    quant: int = KM_QUANT,
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-point Lloyd's algorithm, ``n_iters`` distributed iterations —
    the iterative form of ``kmeans_step``. Centroids between iterations are
    the exact-integer 6-dp means (``mean_e6``), so every iteration remains
    bit-deterministic and a SQL oracle can unroll the whole loop (q63 pins
    two unrolled iterations); cluster labels stay the seed ids.

    Per iteration: broadcast-fold assignment (zero shuffles) + one
    groupBy(cluster) update; the inter-iteration centroid table is k×dim
    rows, ``localCheckpoint``-ed so plan depth stays O(1) — the same
    driver-sees-only-scalars iteration discipline as
    ``dedup.connected_components``. A production run would stop early on an
    inertia-delta convergence scalar; the iteration count is fixed here so
    the unrolled oracle states the identical computation.

    Clusters that lose all members in an iteration drop out (standard
    Lloyd's on empty clusters); ``n_iters`` must be ≥ 1.
    """
    pts = _km_quantize(emb, quant, id_col).localCheckpoint()
    cents = pts.filter(F.col("vid") % stride == 0).select(
        F.col("vid").alias("cid"), F.col("q").alias("cq")
    )
    agg = None
    for t in range(n_iters):
        agg = _km_aggregate(_km_assign(pts, cents), dim, quant)
        if t < n_iters - 1:
            cents = (
                agg.groupBy("cluster_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "mean_e6"))
                    ).alias("dm")
                )
                .select(
                    F.col("cluster_id").alias("cid"),
                    F.transform(F.col("dm"), lambda s: s["mean_e6"]).alias(
                        "cq"
                    ),
                )
                .localCheckpoint()
            )
    return _km_select(agg)
