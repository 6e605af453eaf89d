"""Scale-shape evidence (VERDICT r3 next-items 4+5): run the corpus-heavy
query family at sf0.1 (driver data) and at deterministic K x scale-ups
(tools/scale_up.py) and report wall, output rows, and wall ratios — the
proof that the bucketed / pruned / two-level plans hold near-linear shape
off the toy scale. q54 additionally reports large-star/small-star ROUNDS
(must grow ~log, not linearly) and final edge counts.

Usage: python tools/bench_scale_shape.py [out.json]
Expects /tmp/sf1 (K=10) and /tmp/sf3 (K=30) built by tools/scale_up.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    "q26_minhash_lsh",
    "q27_simhash",
    "q42_corpus_curation",
    "q51_segment_dedup",
    "q54_dedup_clusters",
    "q57_mixture_sample",
    "q58_sequence_packing",
    "q62_training_manifest",
    "q64_segment_dedup_apply",
]

# all three scales use the same cluster-realistic many-file layout: sf1/sf3
# are written chunked by tools/scale_up.py, and the sf0.1 point goes through
# bench.rechunk_tables (same rows, many files) — comparing a single-row-group
# serial-scan 1x point against chunked 10x/30x points would overstate
# sub-linearity by exactly the parallelism the 1x point was denied
def _scales():
    from bench import rechunk_tables

    sf01, _ = rechunk_tables("/root/testdata/sf0.1")
    return [
        ("sf0.1", sf01, 1),
        ("sf1", "/tmp/sf1", 10),
        ("sf3", "/tmp/sf3", 30),
    ]

def run_one(spark, fn, sf_dir: str):
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # full compute, no sink
    wall = time.monotonic() - t0
    n = df.count()
    return wall, n


def main(out_path: str = "SCALE_SHAPE_r4.json", only: list[str] | None = None):
    import __spark_entry__ as e
    from stream_reader_mzxml_spark.pipeline import dedup
    from stream_reader_mzxml_spark.session import get_spark

    spark = get_spark(app_name="scale_shape", cpus=32, shuffle_partitions=32)
    qs = e.queries()
    # chunked runs (one scale per invocation, to bound single-process wall)
    # accumulate into the same file
    if only and os.path.exists(out_path):
        with open(out_path) as fh:
            out = json.load(fh)
    else:
        out = {"family": {}, "q54_rounds": {}}
    for name in FAMILY:
        out["family"].setdefault(name, {})
    for label, sf_dir, k in _scales():
        if only and label not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        # warmup: absorb session/codegen start-up cost so the first family
        # entry's wall measures the query, not JVM warmup
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name in FAMILY:
            wall, n = run_one(spark, qs[name], sf_dir)
            out["family"][name][label] = {
                "wall_sec": round(wall, 2), "rows": n, "k": k,
            }
            print(f"{label:6s} {name:28s} {wall:7.2f}s {n:>9d} rows", flush=True)
        # q54 round-count evidence (item 5): rounds must stay ~log(cluster
        # diameter) while edges grow linearly
        stats: dict = {}
        pairs = dedup.minhash_lsh_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.5
        )
        t0 = time.monotonic()
        cc = dedup.connected_components(pairs, stats=stats)
        n_cc = cc.count()
        stats["wall_sec"] = round(time.monotonic() - t0, 2)
        stats["nodes"] = n_cc
        out["q54_rounds"][label] = stats
        print(f"{label:6s} q54 rounds={stats['rounds']} edges={stats['final_edges']} nodes={n_cc}", flush=True)
    # linearity summary: wall ratio vs data ratio
    for name, d in out["family"].items():
        if "sf0.1" in d and "sf1" in d and d["sf0.1"]["wall_sec"] > 0:
            d["ratio_10x"] = round(d["sf1"]["wall_sec"] / d["sf0.1"]["wall_sec"], 2)
        if "sf0.1" in d and "sf3" in d and d["sf0.1"]["wall_sec"] > 0:
            d["ratio_30x"] = round(d["sf3"]["wall_sec"] / d["sf0.1"]["wall_sec"], 2)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "SCALE_SHAPE_r4.json",
        only=sys.argv[2:] or None,
    )
