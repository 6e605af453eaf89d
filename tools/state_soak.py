"""RocksDB state-store soak (VERDICT r4 item 6): bounded state growth.

Runs the stateful shard join on the RocksDB backend over the 4M-row
sequences stream with a watermark horizon ~3 micro-batches wide and a
2048-group key space (8 shards x 256 salts), and records per-batch state
rows/bytes from the streaming progress JSON. The 10^12-regime claim this
evidences: state is O(rows inside the watermark horizon), NOT O(stream) —
the curve must FILL while the horizon fills, then go FLAT while input keeps
arriving (watermark purge working), on the backend whose state lives on
disk rather than heap.

Usage: python tools/state_soak.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 4_000_000
FILES_PER_TRIGGER = 4     # 128 files -> 32 micro-batches
N_SALTS = 256             # 8 ms1 shards x 256 salts = 2048 state groups
# two horizons, 4x apart: if the watermark purge works, steady-state SST
# size must scale ~with the horizon (state = O(rows in horizon)); if state
# leaked, both runs would grow linearly with INPUT and end at the same size
WATERMARKS = ("5000 seconds", "20000 seconds")


def run_soak(spark, seq_path: str, watermark: str) -> dict:
    from stream_reader_mzxml_spark.sources.readers import read_sequences_stream
    from stream_reader_mzxml_spark.streaming.stateful import stateful_shard_join

    ck_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix="soak_ckpt_", dir=ck_base)
    stream = read_sequences_stream(
        spark, seq_path, max_files_per_trigger=FILES_PER_TRIGGER
    )
    t0 = time.perf_counter()
    q = (
        stateful_shard_join(stream, watermark=watermark, n_salts=N_SALTS)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = []
    for p in q.recentProgress:
        if p["numInputRows"] == 0:
            continue
        so = (p.get("stateOperators") or [{}])[0]
        cm = so.get("customMetrics") or {}
        batches.append(
            {
                "batch_id": p["batchId"],
                "input_rows": p["numInputRows"],
                "state_groups": so.get("numRowsTotal"),
                "sst_bytes": cm.get("rocksdbSstFileSize"),
                "trigger_ms": p["durationMs"]["triggerExecution"],
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    # rocksdbSstFileSize saw-tooths with the snapshot/compaction cadence;
    # the MEDIAN over a window is the stable state-size statistic
    def med(vals):
        s = sorted(v for v in vals if v)
        return s[len(s) // 2] if s else 0

    ssts = [b["sst_bytes"] for b in batches]
    half = len(ssts) // 2
    return {
        "watermark": watermark,
        "wall_sec": round(wall, 1),
        "n_batches": len(batches),
        "sst_median_first_half": med(ssts[2:half]),  # skip fill-up batches
        "sst_median_second_half": med(ssts[half:]),
        "sst_max": max(s for s in ssts if s),
        "batches": batches,
    }


def main(out_path: str = "STATE_SOAK_r5.json"):
    from bench import ensure_sequences
    from stream_reader_mzxml_spark.session import get_spark

    seq_path, _ = ensure_sequences(N_ROWS)
    spark = get_spark(
        app_name="state_soak",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
            "spark.sql.streaming.stateStore.stateSchemaCheck": "false",
        },
    )
    runs = [run_soak(spark, seq_path, wm) for wm in WATERMARKS]
    lo, hi = runs[0], runs[1]
    ratio = (
        hi["sst_median_second_half"] / lo["sst_median_second_half"]
        if lo["sst_median_second_half"]
        else None
    )
    out = {
        "config": {
            "n_rows": N_ROWS,
            "n_salts": N_SALTS,
            "state_backend": "rocksdb",
            "files_per_trigger": FILES_PER_TRIGGER,
        },
        # bounded = each run's steady state is FLAT (2nd half ~ 1st half,
        # not growing with cumulative input) AND the two horizons' steady
        # sizes scale like their 4x horizon ratio (1.5..8 accepts sawtooth
        # noise), proving size tracks the HORIZON, not the stream length
        "flat_lo": bool(
            lo["sst_median_second_half"] <= 1.5 * lo["sst_median_first_half"]
        ),
        "flat_hi": bool(
            hi["sst_median_second_half"] <= 1.5 * hi["sst_median_first_half"]
        ),
        "horizon_ratio_4x_measured": round(ratio, 2) if ratio else None,
        "proportional": bool(ratio and 1.5 <= ratio <= 8.0),
        "runs": runs,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "STATE_SOAK_r5.json")
