"""ANN recall at scale (VERDICT r4 item 7): recall@k of the bucketed paths
(q30 LSH multi-probe, q49 IVF nprobe=2) vs brute-force cosine ground truth,
measured on the 1x driver corpus AND the 10x/30x scaled corpora
(tools/scale_up.py builds them by id-strided replication with per-replica
rotations, so scaled corpora have real new near-neighbor structure).

Recall@k per probe = |ANN top-k ∩ brute top-k| / k; reported as the mean
over probes, alongside walls. The claim at stake: the bucket parameters
tuned at toy scale must HOLD as density grows — recall at 30x >= the
small-scale bound, or the parameters need re-tuning (either result is
recorded).

Usage: python tools/ann_recall_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROBES = 20
K = 10


def _topk_sets(rows):
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["p_id"], []).append((r["rank"], r["n_id"]))
    return {p: {n for _rk, n in sorted(v)[:K]} for p, v in out.items()}


PLANT_ALPHAS = (0.95, 0.85, 0.75)  # target cosine of planted neighbors
PLANT_PER_ALPHA = 3


def _planted_frame(spark, emb_pdf):
    """Augment the corpus with planted near-neighbors of the probes.

    The driver corpus is ISOTROPIC (measured: probe top-1 cosine 0.36-0.48
    vs bulk p99 0.287 — no separation), so raw recall@k vs brute force
    measures candidate coverage, not bucket quality: the 'true' top-10 is
    noise ranking. Planting neighbors at controlled cosine α (v' = αv +
    √(1-α²)·u, u ⊥ random) creates the actual ANN workload — find the
    genuinely-similar rows — with exact ground truth = the planted ids."""
    import numpy as np

    ids = emb_pdf["vec_id"].to_numpy()
    v = np.array(list(emb_pdf["embedding"]), dtype=np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    rng = np.random.default_rng(12345)
    next_id = int(ids.max()) + 1
    rows, truth = [], {}
    for p in range(N_PROBES):
        base = vn[ids == p][0]
        truth[p] = {}
        for alpha in PLANT_ALPHAS:
            planted_ids = []
            for _ in range(PLANT_PER_ALPHA):
                u = rng.standard_normal(len(base))
                u -= u.dot(base) * base
                u /= np.linalg.norm(u)
                w = alpha * base + (1 - alpha**2) ** 0.5 * u
                rows.append((next_id, [float(x) for x in w]))
                planted_ids.append(next_id)
                next_id += 1
            truth[p][alpha] = set(planted_ids)
    planted_df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    return planted_df, truth


def main(out_path: str = "ANN_RECALL_r5.json"):
    from bench import rechunk_tables
    from stream_reader_mzxml_spark.pipeline import similarity
    from stream_reader_mzxml_spark.session import get_spark

    spark = get_spark(app_name="ann_recall", cpus=32, shuffle_partitions=32)
    sf01, _ = rechunk_tables("/root/testdata/sf0.1")
    scales = [("sf0.1", sf01, 1), ("sf1", "/tmp/sf1", 10), ("sf3", "/tmp/sf3", 30)]
    out: dict = {}
    for label, sf_dir, kx in scales:
        p = f"{sf_dir}/embeddings.parquet"
        if not os.path.exists(p):
            print(f"skip {label}", file=sys.stderr)
            continue
        emb = spark.read.parquet(p)
        n_vecs = emb.count()
        rec: dict = {"n_vectors": n_vecs, "k": K, "n_probes": N_PROBES}
        t0 = time.monotonic()
        truth = _topk_sets(
            similarity.cosine_topk(emb, n_probes=N_PROBES, k=K).collect()
        )
        rec["brute_wall_sec"] = round(time.monotonic() - t0, 2)
        for name, fn in (
            ("lsh_multiprobe", lambda e: similarity.lsh_ann_topk(e, n_probes=N_PROBES, k=K)),
            ("lsh_multiprobe_pb2", lambda e: similarity.lsh_ann_topk(e, n_probes=N_PROBES, k=K, probe_bits=2)),
            ("lsh_single", lambda e: similarity.lsh_ann_topk(e, n_probes=N_PROBES, k=K, multi_probe=False)),
            ("ivf_nprobe2", lambda e: similarity.ivf_topk(e, n_probes=N_PROBES, k=K)),
        ):
            t0 = time.monotonic()
            got = _topk_sets(fn(emb).collect())
            wall = round(time.monotonic() - t0, 2)
            recalls = [
                len(got.get(pid, set()) & tset) / len(tset)
                for pid, tset in truth.items()
                if tset
            ]
            rec[name] = {
                "wall_sec": wall,
                "recall_at_k": round(sum(recalls) / len(recalls), 4),
                "min_probe_recall": round(min(recalls), 4),
            }
            print(f"{label:6s} {name:15s} recall@{K}={rec[name]['recall_at_k']:.3f} "
                  f"min={rec[name]['min_probe_recall']:.3f} wall={wall}s", flush=True)

        # planted-neighbor recall: the honest bucket-quality metric on an
        # isotropic corpus (see _planted_frame docstring)
        import pyspark.sql.functions as F

        emb_c = emb.select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        pdf = emb_c.filter(F.col("vec_id") < N_PROBES).toPandas()
        planted_df, truth = _planted_frame(spark, pdf)
        aug = emb_c.unionByName(planted_df)
        k_plant = len(PLANT_ALPHAS) * PLANT_PER_ALPHA + 1  # room for all plants
        rec["planted"] = {}
        for name, fn in (
            ("brute", lambda e: similarity.cosine_topk(e, n_probes=N_PROBES, k=k_plant)),
            ("lsh_multiprobe", lambda e: similarity.lsh_ann_topk(e, n_probes=N_PROBES, k=k_plant)),
            ("lsh_multiprobe_pb2", lambda e: similarity.lsh_ann_topk(e, n_probes=N_PROBES, k=k_plant, probe_bits=2)),
            ("ivf_nprobe2", lambda e: similarity.ivf_topk(e, n_probes=N_PROBES, k=k_plant)),
        ):
            got = {}
            for r in fn(aug).collect():
                got.setdefault(r["p_id"], set()).add(r["n_id"])
            per_alpha = {}
            for alpha in PLANT_ALPHAS:
                hits = [
                    len(got.get(p, set()) & truth[p][alpha]) / PLANT_PER_ALPHA
                    for p in range(N_PROBES)
                ]
                per_alpha[str(alpha)] = round(sum(hits) / len(hits), 4)
            rec["planted"][name] = per_alpha
            print(f"{label:6s} planted {name:15s} " + " ".join(
                f"a={a}:{v:.2f}" for a, v in per_alpha.items()), flush=True)
        out[label] = rec
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ANN_RECALL_r5.json")
