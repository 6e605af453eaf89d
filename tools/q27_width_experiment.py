"""q27 SimHash aggregate-width experiment (VERDICT r4 item 4).

Times the SimHash near-dup operator with the 60-column bit-sum aggregate
(round-2 form, ``packed=False``) vs the 20+1-column packed-lane aggregate
(round-5 form, ``packed=True``) on the same corpora at 1x/10x/30x scale,
interleaved A/B per scale. Result recorded in BASELINE.md; the default in
``simhash_neardup_pairs`` follows the measurement.

Usage: python tools/q27_width_experiment.py [out.json]
Expects /tmp/sf1 (K=10) and /tmp/sf3 (K=30) from tools/scale_up.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path: str = "/tmp/q27_width.json"):
    from bench import rechunk_tables
    from stream_reader_mzxml_spark.pipeline import dedup
    from stream_reader_mzxml_spark.session import get_spark

    spark = get_spark(app_name="q27_width", cpus=32, shuffle_partitions=32)
    sf01, _ = rechunk_tables("/root/testdata/sf0.1")
    scales = [("sf0.1", sf01), ("sf1", "/tmp/sf1"), ("sf3", "/tmp/sf3")]
    out: dict = {}
    for label, sf_dir in scales:
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.count()  # warm scan
        rec: dict = {}
        # interleave: unpacked, packed, unpacked, packed — report best-of-2
        for trial in range(2):
            for key, packed in (("unpacked", False), ("packed", True)):
                t0 = time.monotonic()
                df = dedup.simhash_neardup_pairs(docs, max_hamming=3, packed=packed)
                df.write.format("noop").mode("overwrite").save()
                wall = time.monotonic() - t0
                rec.setdefault(key, []).append(round(wall, 2))
                print(f"{label:6s} {key:9s} trial{trial} {wall:7.2f}s", flush=True)
        n_pairs = dedup.simhash_neardup_pairs(docs, max_hamming=3).count()
        out[label] = {
            "unpacked_walls": rec["unpacked"],
            "packed_walls": rec["packed"],
            "unpacked_best": min(rec["unpacked"]),
            "packed_best": min(rec["packed"]),
            "speedup": round(min(rec["unpacked"]) / min(rec["packed"]), 3),
            "pairs": n_pairs,
        }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/q27_width.json")
