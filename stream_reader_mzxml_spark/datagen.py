"""Deterministic synthetic ``sequences`` table generator (FIXTURES.md §1).

One row ≈ one mzXML scan of the reference: ``doc_id`` ≈ scan ``num``
(Spectrum.scala:14), ``tokens`` ≈ the decoded peak array (Spectrum.scala:37),
``n_tok`` ≈ ``peaksCount`` (Spectrum.scala:16), ``source`` ≈ the
instrument/msLevel shard (Spectrum.scala:15,34), ``event_time`` ≈
``retentionTimeInSeconds`` (Spectrum.scala:23 — whole-second granularity).

Everything is generated with a seeded NumPy ``Generator`` and written via
pyarrow directly — no Spark needed — so tests, oracles and benches all draw the
exact same bytes for the same ``(seed, n_rows)``.

Shape knobs mirror the reference fixtures and the graft's scale requirements:
- ~16 sources; one hot source owns ~40 % of rows (exercises salting, SURVEY §2.9);
- sources split into ``ms1-*`` / ``ms2-*`` shards (msLevel 1/2 analog);
- tokens Zipf-ish over a 50k vocab with embedded pad-token (0) runs so the
  zero-drop filter (MzXMLTags.scala:326 analog) has work to do;
- event_time monotone per source, cross-source disorder ≤ 10 s (late data for
  watermark tests);
- ``precursor_ref`` on ms2 rows points at an ms1 row within ±2 s (drives the
  J3 interval/stateful join, libCandidateIons.sc:124-137).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
PAD_TOKEN = 0
N_SOURCES = 16
HOT_SOURCE_SHARE = 0.4
BASE_EPOCH = 1_767_225_600  # 2026-01-01T00:00:00Z, whole seconds
ROWS_PER_SECOND = 8  # density of the synthetic timeline
MAX_TOKENS = 4096

SOURCES = [f"ms{1 if i % 2 == 0 else 2}-{i:02d}" for i in range(N_SOURCES)]
HOT_SOURCE = SOURCES[0]  # "ms1-00"

SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32()), nullable=True),
        pa.field("n_tok", pa.int32(), nullable=False),
        pa.field("source", pa.string(), nullable=False),
        pa.field("event_time", pa.timestamp("us"), nullable=False),
        pa.field("precursor_ref", pa.string(), nullable=True),
    ]
)


def generate_sequences(
    n_rows: int,
    seed: int = 42,
    null_token_frac: float = 0.005,
    mean_tokens: float = 64.0,
) -> pa.Table:
    """Return a deterministic pyarrow Table with the sequences schema.

    ``null_token_frac`` rows get a NULL tokens array (fail-soft parse analog,
    SpectrumRequest.scala:23-27: malformed records become ``None``).
    """
    rng = np.random.default_rng(seed)

    # --- source assignment with hot-key skew -------------------------------
    probs = np.full(N_SOURCES, (1.0 - HOT_SOURCE_SHARE) / (N_SOURCES - 1))
    probs[0] = HOT_SOURCE_SHARE
    src_idx = rng.choice(N_SOURCES, size=n_rows, p=probs)

    # --- event time: global second timeline, per-source fixed lag ----------
    # Row i gets second i // ROWS_PER_SECOND; each source is shifted back by a
    # fixed 0-10 s lag. Within a source, times stay monotone (row order);
    # across sources, disorder is bounded by 10 s.
    global_sec = np.arange(n_rows, dtype=np.int64) // ROWS_PER_SECOND
    lags = rng.integers(0, 11, size=N_SOURCES)
    lags[0] = 0
    event_sec = BASE_EPOCH + global_sec - lags[src_idx]

    # --- per-source sequence numbers → doc_id ------------------------------
    seq_within = np.zeros(n_rows, dtype=np.int64)
    for s in range(N_SOURCES):
        rows = np.flatnonzero(src_idx == s)
        seq_within[rows] = np.arange(len(rows))
    sources_arr = np.array(SOURCES)
    doc_ids = np.char.add(
        np.char.add(sources_arr[src_idx], "-"),
        np.char.zfill(seq_within.astype(str), 9),
    )

    # --- token arrays -------------------------------------------------------
    # n_tok log-normal, clipped to [1, MAX_TOKENS] (FIXTURES.md §1)
    n_tok = np.clip(
        rng.lognormal(mean=np.log(mean_tokens), sigma=0.6, size=n_rows), 1, MAX_TOKENS
    ).astype(np.int32)
    total = int(n_tok.sum())
    # Zipf-ish over the vocab: zipf(1.3) clipped into [0, VOCAB_SIZE-1]
    flat = rng.zipf(1.3, size=total)
    flat = np.minimum(flat, VOCAB_SIZE - 1).astype(np.int32)
    # embed pad runs: ~3% of positions become PAD_TOKEN (zero-intensity analog)
    flat[rng.random(total) < 0.03] = PAD_TOKEN

    null_mask = rng.random(n_rows) < null_token_frac
    # null rows must occupy zero-length segments (parquet can't store
    # non-empty null list components) — drop their values from the flat buffer
    eff_len = np.where(null_mask, 0, n_tok).astype(np.int64)
    keep_vals = np.repeat(~null_mask, n_tok)
    flat = flat[keep_vals]
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(eff_len, out=offsets[1:])
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(flat),
        mask=pa.array(null_mask) if null_mask.any() else None,
    )

    # --- precursor_ref: ms2 rows → nearest ms1 row within ±2 s -------------
    is_ms1 = np.char.startswith(sources_arr[src_idx], "ms1")
    ms1_rows = np.flatnonzero(is_ms1)
    precursor = np.full(n_rows, None, dtype=object)
    if len(ms1_rows):
        srt = np.argsort(event_sec[ms1_rows], kind="stable")
        ms1_rows_sorted = ms1_rows[srt]
        ms1_times_sorted = event_sec[ms1_rows_sorted]
        ms2_rows = np.flatnonzero(~is_ms1)
        pos = np.clip(
            np.searchsorted(ms1_times_sorted, event_sec[ms2_rows]),
            1,
            len(ms1_rows_sorted) - 1,
        )
        left = ms1_rows_sorted[pos - 1]
        right = ms1_rows_sorted[pos]
        dl = np.abs(event_sec[ms2_rows] - event_sec[left])
        dr = np.abs(event_sec[ms2_rows] - event_sec[right])
        best = np.where(dl <= dr, left, right)
        ok = np.minimum(dl, dr) <= 2
        for r, b, o in zip(ms2_rows, best, ok):
            if o:
                precursor[r] = doc_ids[b]

    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            tokens_arr,
            pa.array(n_tok, type=pa.int32()),
            pa.array(sources_arr[src_idx], type=pa.string()),
            pa.array(event_sec * 1_000_000, type=pa.timestamp("us")),
            pa.array(precursor, type=pa.string()),
        ],
        schema=SEQUENCES_SCHEMA,
    )


def write_sequences(
    path: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 50_000,
    **kwargs,
) -> str:
    """Write the sequences table as a directory of parquet files.

    The table is generated once (deterministic for ``(seed, n_rows)``) and
    sliced into multiple files so the streaming source can rate-limit with
    ``maxFilesPerTrigger`` — each file is one micro-batch-sized chunk, the
    analog of the reference's 1 KiB read chunks (XmlStreamRequest.scala:17).
    Slices are contiguous row ranges, so per-source event-time monotonicity is
    preserved across files (file order = time order).
    """
    os.makedirs(path, exist_ok=True)
    tbl = generate_sequences(n_rows, seed=seed, **kwargs)
    n_files = max(1, (n_rows + rows_per_file - 1) // rows_per_file)
    for i in range(n_files):
        lo = i * rows_per_file
        chunk = tbl.slice(lo, min(rows_per_file, n_rows - lo))
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))
    return path
