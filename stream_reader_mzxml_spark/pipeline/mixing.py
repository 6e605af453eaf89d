"""Data-mixture construction: deterministic per-source downsampling and
concat-and-split sequence packing — the two steps between a curated corpus
and a token stream a trainer can consume.

Both are built scale-first:

- ``mixture_sample``: the per-source token totals are a ~#sources-row
  aggregate (tiny), broadcast back onto the scan — the corpus side is ONE
  pass with a map-side-combined groupBy and no large shuffle. The sampling
  decision is pure integer arithmetic on a portable hash so a DuckDB oracle
  reproduces it bit-for-bit (no float keep-rate comparisons at the boundary).

- ``sequence_packing``: a per-shard running token offset is a prefix sum —
  inherently ordered, and the one curation op a naive window implementation
  gets wrong at scale (``Window.partitionBy(source)`` sorts a whole Zipf-hot
  source in ONE task). This implements the classic two-level distributed
  prefix sum instead: per-(source, doc_id-range-bucket) partial sums (small
  shuffle), a bucket-level cumulative offset over the tiny partials table,
  then a within-bucket window whose partitions are bounded by the bucket
  width — no task ever sorts more than ``bucket_width`` rows, regardless of
  how hot the source is. The DuckDB oracle states the same semantics as one
  plain window cumsum, so the distributed decomposition is checked against a
  directly-declared spec (same pattern as q54's connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.pipeline.text import h32

MIX_TARGET_TOKENS = 1300  # per-source token budget for the mixture
MIX_RES = 1_000_000  # sampling-hash resolution (integer keep test)

PACK_LEN = 256  # tokens per packed training sequence
PACK_BUCKET = 64  # doc_id range width of a prefix-sum bucket


def _ws_tokens(text_col: str):
    """Whitespace token count — same tokenizer as q20's n_ws_tokens."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"(\S+)"), 1))


def mixture_sample(
    df: DataFrame,
    target_tokens: int = MIX_TARGET_TOKENS,
    text_col: str = "text",
    key_col: str = "source",
    totals: DataFrame | None = None,
) -> DataFrame:
    """Deterministic per-source mixture sampling: each source is kept with
    rate ``min(1, target_tokens / source_tokens)`` so every domain
    contributes at most ~``target_tokens`` tokens to the mixture — the
    down-weighting step that stops one mega-crawl from dominating training.

    The keep decision is seeded-uniform and exactly integer:
    ``(h32(doc_id) % RES) * source_tokens < target_tokens * RES`` — all
    BIGINT on both engines, so there is no float boundary for the oracle to
    disagree on.  ``keep_rate`` is emitted (rounded) for reporting only.

    The Spark side evaluates the product-free rearrangement
    ``prio < ceil(target*RES / src_tokens)`` (exact BIGINT ``div``; for
    non-negative integers ``a*b < c  <=>  a < (c + b - 1) div b``), because
    the literal product ``prio * src_tokens`` multiplies a value up to 1e6
    by the per-source token total and would silently wrap int64 (ANSI off)
    for any source above ~9.2e12 tokens — exactly the 100-TB regime.  The
    oracle keeps the plain-product spec form: at oracle scale both are
    value-identical, and DuckDB would error (not wrap) on true overflow.

    Scale shape: per-doc token counts live in the scan project; the
    per-source totals are a ~#sources-row aggregate broadcast back onto the
    scan.  One tiny shuffle; the documents table itself never re-shuffles.

    ``totals``: pass a precomputed ``(key_col, src_tokens)`` batch DataFrame
    to skip the in-plan aggregate — this is the STREAMING form: with totals
    decided ahead of time (how mixture rates are set in practice), the keep
    test is a pure stream-static broadcast join + scan projection, append-
    mode safe. Left as None, totals are computed from ``df`` itself (batch).
    """
    toks = df.select(
        "doc_id", key_col, _ws_tokens(text_col).alias("n_tokens")
    )
    if totals is None:
        totals = toks.groupBy(key_col).agg(
            F.sum("n_tokens").alias("src_tokens")
        )
    prio = F.pmod(h32(F.col("doc_id").cast("string")), F.lit(MIX_RES))
    out = toks.join(F.broadcast(totals), [key_col])
    # product-free keep test (see docstring): src_tokens == 0 means the
    # product form is 0 < T*RES, i.e. always keep
    budget = int(target_tokens) * MIX_RES
    sampled = (F.col("src_tokens") == 0) | (
        prio
        < F.expr(
            f"(CAST({budget} AS BIGINT) + src_tokens - 1L) div src_tokens"
        )
    )
    return out.select(
        "doc_id",
        key_col,
        "n_tokens",
        F.col("src_tokens").cast("long").alias("src_tokens"),
        # greatest(...,1): a source of only zero-token docs has src_tokens=0
        # — rate 1.0 (nothing to budget), not a division error (ANSI) or
        # inf (DuckDB); the integer sampled-test below needs no guard
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_tokens))
                / F.greatest(F.col("src_tokens"), F.lit(1)),
            ),
            6,
        ).alias("keep_rate"),
        sampled.cast("int").alias("sampled"),
    )


def sequence_packing(
    df: DataFrame,
    budget: int = PACK_LEN,
    bucket_width: int = PACK_BUCKET,
    text_col: str = "text",
    key_col: str = "source",
) -> DataFrame:
    """Concat-and-split sequence packing: within each shard (``key_col``),
    documents are concatenated in ``doc_id`` order and the token stream is
    split every ``budget`` tokens; each doc reports the sequences it lands
    in.  This is the standard LLM pre-training sequence-assembly policy
    (concatenate, then cut at the context length — docs may span a cut).

    Emits per doc: the running token offset before it (``cum_before``), its
    offset inside its first sequence, the first/last sequence ids it touches
    and how many sequences it spans.  A doc with zero tokens spans the single
    sequence its offset falls in.

    Distributed prefix sum (see module docstring): partials over
    ``(source, floor(doc_id / bucket_width))`` → cumulative bucket offsets
    over the tiny partials table → within-bucket window bounded by
    ``bucket_width`` rows.  The (source, bucket) join is co-partitioned with
    the within-bucket window's partitioning, so the whole op is one bounded
    shuffle of (ids + counts) — never the text.
    """
    toks = df.select(
        "doc_id",
        key_col,
        _ws_tokens(text_col).alias("n_tokens"),
        (F.col("doc_id") / bucket_width).cast("long").alias("bucket"),
    )
    partials = toks.groupBy(key_col, "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    # cumulative offset of each bucket: window over the partials table only —
    # #sources × #buckets rows, orders of magnitude smaller than the corpus.
    bw = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        key_col,
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(bw), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    ww = (
        Window.partitionBy(key_col, "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        toks.join(offsets, [key_col, "bucket"])
        .withColumn(
            "cum_before",
            F.col("bucket_offset")
            + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0)),
        )
    )
    first_seq = F.floor(F.col("cum_before") / budget)
    last_seq = F.floor(
        (F.col("cum_before") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / budget
    )
    return placed.select(
        key_col,
        "doc_id",
        "n_tokens",
        F.col("cum_before").cast("long").alias("cum_before"),
        F.pmod(F.col("cum_before"), F.lit(budget)).cast("long").alias(
            "offset_in_seq"
        ),
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
        (last_seq - first_seq + 1).cast("long").alias("n_seqs"),
    )


EPOCH = 1  # default epoch for the registered query


def epoch_order(
    df: DataFrame,
    epoch: int = EPOCH,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-epoch training order: a deterministic global permutation of the
    corpus, re-drawn each epoch — the shuffling step between a packed
    corpus and the trainer's reader. Priority = ``h32(doc_id ':' epoch)``
    (uniform, seeded by the epoch, reproducible in SQL); the global
    position is computed with ``operators.aggregates.distributed_rank``
    (order-aligned bucket = priority >> 20), so no task ever windows the
    whole corpus — the same two-level shape that replaced q45's global
    rank, here oracle-proven directly.
    """
    from stream_reader_mzxml_spark.operators.aggregates import distributed_rank
    from stream_reader_mzxml_spark.pipeline.text import h32

    prio = h32(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(epoch)))
    )
    base = df.select(id_col, prio.alias("priority"))
    return distributed_rank(
        base,
        order=[F.asc("priority"), F.asc(id_col)],
        bucket=F.shiftright(F.col("priority"), 20),
        rank_col="position",
    ).select(id_col, F.lit(int(epoch)).alias("epoch"), "priority", "position")


def sequence_manifest(
    df: DataFrame,
    budget: int = PACK_LEN,
    bucket_width: int = PACK_BUCKET,
    text_col: str = "text",
    key_col: str = "source",
) -> DataFrame:
    """The trainer-facing view of ``sequence_packing``: one row per packed
    training sequence, with how many documents feed it, how many of its
    ``budget`` token slots are filled, and the doc_id span it covers — the
    manifest a data loader reads to locate every sequence's constituents.

    Derived from the packing offsets with pure integer arithmetic: a doc
    contributes ``min(end, (s+1)·B) − max(start, s·B)`` tokens to sequence
    ``s`` for every s it spans — exploded scan-side from (first_seq,
    last_seq), then ONE groupBy((source, seq_id)) with min/max/count/sum.
    Zero-token docs contribute nothing and are excluded from the manifest.
    """
    packed = sequence_packing(df, budget, bucket_width, text_col, key_col)
    start = F.col("cum_before")
    end = start + F.col("n_tokens")
    s = F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias(
        "seq_id"
    )
    ex = packed.filter(F.col("n_tokens") > 0).select(
        key_col, "doc_id", "cum_before", "n_tokens", s
    )
    contrib = F.least(end, (F.col("seq_id") + 1) * budget) - F.greatest(
        start, F.col("seq_id") * budget
    )
    return (
        ex.withColumn("contrib", contrib)
        .groupBy(key_col, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("contrib").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
