"""Unit tests for the training-data pipeline operators (dedup / similarity /
text / multimodal) against hand-computed NumPy/Python oracles on tiny
deterministic fixtures — the MzXMLTagsTest golden-invariant style
(MzXMLTagsTest.scala:230-261) applied to the pipeline layer."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.pipeline import dedup, multimodal, similarity, text


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different text with other words here now"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "short text"),
    (5, "le chat et le chien et la maison"),  # french-ish
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.mark.spark
class TestText:
    def test_token_counts(self, spark, docs_df):
        rows = {r.doc_id: r for r in text.token_counts(docs_df).collect()}
        assert rows[0].n_ws_tokens == 9
        assert rows[0].n_re_tokens == 9
        assert rows[4].n_ws_tokens == 2
        assert rows[0].n_chars == len(DOCS[0][1])

    def test_fingerprint_matches_python_fold(self, spark, docs_df):
        rows = {r.doc_id: r.fingerprint for r in text.fingerprint(docs_df).collect()}
        for doc_id, t in DOCS:
            fp = 0
            for w in t.split(" "):
                fp = (fp * text.FNV_PRIME + h32_py(w)) % text.FOLD_MOD
            assert rows[doc_id] == fp, doc_id
        # order sensitivity: same words reordered → different fingerprint
        assert rows[0] != rows[1]

    def test_lang_id(self, spark, docs_df):
        rows = {r.doc_id: r.pred_lang for r in text.lang_id(docs_df).collect()}
        assert rows[0] == "en"
        assert rows[5] == "fr"
        assert rows[4] == "und"  # no stopword hits

    def test_repetition_features(self, spark):
        df = spark.createDataFrame(
            [
                (0, "a b c a b c a b c"),  # "a b c" ×3 (and others ×2)
                (1, "all words here are unique now"),
                (2, "x y"),  # < 3 words → no row
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in text.repetition_features(df).collect()}
        assert 2 not in out
        assert out[1].n_repeated == 0 and out[1].rep_ratio == 0.0
        # doc 0: grams = [abc, bca, cab, abc, bca, cab, abc] → 3 distinct,
        # 7 total, all 3 repeat, all 7 occurrences are of repeated grams
        assert out[0].n_distinct_grams == 3
        assert out[0].n_grams == 7
        assert out[0].n_repeated == 3
        assert out[0].rep_ratio == 1.0

    def test_pii_pattern_counts(self, spark):
        df = spark.createDataFrame(
            [
                (0, "contact me at someone@example.org or call 5551234"),
                (1, "no pii here just words"),
                (2, "ids 123 4567 and a@b.c"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in text.pii_pattern_counts(df).collect()}
        assert (out[0].n_emails, out[0].n_digit_runs, out[0].has_pii_surface) == (1, 1, 1)
        assert (out[1].n_emails, out[1].n_digit_runs, out[1].has_pii_surface) == (0, 0, 0)
        assert (out[2].n_emails, out[2].n_digit_runs, out[2].has_pii_surface) == (1, 2, 1)

    def test_sketch_stats_within_error_bounds(self, spark):
        # HLL++ (rsd 2 %) and percentile_approx (accuracy 10k) estimates must
        # sit within their published error bounds of the exact answers
        rows = [
            (i, i % 997, "t" + str(i % 3), float((i * 37) % 1000))
            for i in range(20_000)
        ]
        df = spark.createDataFrame(
            rows, "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
        )
        approx = {
            r.event_type: r
            for r in df.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=0.02).alias("u"),
                F.percentile_approx("value", 0.5, 10000).alias("p50"),
            )
            .collect()
        }
        exact = {
            r.event_type: r
            for r in df.groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("u"),
                F.expr("percentile(value, 0.5)").alias("p50"),
            )
            .collect()
        }
        for k in exact:
            assert abs(approx[k].u - exact[k].u) <= max(3, 0.06 * exact[k].u)
            assert abs(approx[k].p50 - exact[k].p50) <= 10.0

    def test_corpus_curation_verdicts(self, spark):
        from stream_reader_mzxml_spark.pipeline.curation import curate

        good = "the quick brown fox jumps of the lazy dog and it runs to town"
        rows = [
            (0, good),                                   # keeps
            (1, "too few"),                              # quality (< 5 words)
            # passes quality (stopword-rich, 24 words) but every 3-gram repeats
            (2, " ".join(["the spam of and to in"] * 4)),
            (3, good + " mail me at a@b.org please ok"),  # pii
            (4, good),                                   # duplicate of 0
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r for r in curate(df).collect()}
        assert out[0].keep == 1 and out[0].drop_reason is None
        assert out[1].keep == 0 and out[1].drop_reason == "quality"
        assert out[2].keep == 0 and out[2].drop_reason == "repetition"
        assert out[3].keep == 0 and out[3].drop_reason == "pii"
        assert out[4].keep == 0 and out[4].drop_reason == "duplicate"
        assert out[0].pred_lang == "en"

    def test_quality_features(self, spark, docs_df):
        rows = {r.doc_id: r for r in text.quality_features(docs_df).collect()}
        assert rows[4].quality_score == 0.0  # < 5 words
        # recompute exactly
        ws = DOCS[0][1].split(" ")
        n_stop = sum(1 for w in ws if w in text.LANG_STOPWORDS["en"])
        assert rows[0].n_stopwords == n_stop


@pytest.mark.spark
class TestDedup:
    def test_exact_dedup(self, spark, docs_df):
        out = {r.text_hash: r for r in dedup.exact_dedup(docs_df).collect()}
        h = hashlib.md5(DOCS[0][1].encode()).hexdigest()
        assert out[h].n_copies == 2
        assert out[h].keeper_doc_id == 0
        assert sum(r.n_copies for r in out.values()) == len(DOCS)

    def test_ngram_jaccard_pairs(self, spark, docs_df):
        pairs = {
            (r.a_id, r.b_id): r.jaccard
            for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.1).collect()
        }
        # exact dup pair: jaccard 1.0
        assert pairs[(0, 3)] == 1.0
        # near-dup (one word differs at the end): 6/8 shared 3-gram shingles
        sh = lambda t: {
            (a, b, c)
            for a, b, c in zip(t.split()[:-2], t.split()[1:-1], t.split()[2:])
        }
        s0, s1 = sh(DOCS[0][1]), sh(DOCS[1][1])
        expected = len(s0 & s1) / len(s0 | s1)
        assert pairs[(0, 1)] == pytest.approx(expected, abs=1e-6)

    def test_minhash_exact_dup_full_signature_match(self, spark, docs_df):
        out = {
            (r.a_id, r.b_id): r.est_jaccard
            for r in dedup.minhash_lsh_pairs(docs_df, threshold=0.0).collect()
        }
        assert out[(0, 3)] == 1.0  # identical docs → identical signatures
        assert (0, 1) in out  # near-dups share at least one band

    def test_minhash_signature_python_parity(self, spark, docs_df):
        row = (
            docs_df.filter(F.col("doc_id") == 0)
            .select(dedup.minhash_signature(F.col("text")).alias("sig"))
            .collect()[0]
        )
        ws = DOCS[0][1].split(" ")
        shingles = {h32_py("|".join(ws[i : i + 3])) for i in range(len(ws) - 2)}
        for got, (a, b) in zip(row.sig, dedup.MINHASH_PERMS):
            exp = min((h * a + b) % dedup.MINHASH_PRIME for h in shingles)
            assert got == exp

    def test_simhash_identical_and_banding_recall(self, spark, docs_df):
        sigs = {
            r.doc_id: r.sim
            for r in docs_df.select(
                "doc_id", dedup.simhash_sig(F.col("text")).alias("sim")
            ).collect()
        }
        assert sigs[0] == sigs[3]
        assert all(0 <= s < (1 << dedup.SIMHASH_BITS) for s in sigs.values())
        got = {
            (r.a_id, r.b_id): r.hamming
            for r in dedup.simhash_neardup_pairs(docs_df, max_hamming=3).collect()
        }
        # oracle: all-pairs hamming over collected signatures
        ids = sorted(sigs)
        exp = {
            (a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3
        }
        assert got == exp  # banded plan ≡ all-pairs plan (pigeonhole recall=1)

    def test_simhash_candidate_volume_bounded(self, spark):
        # 120 docs in two well-separated content families: the 4×15-bit band
        # join must NOT degenerate to all-pairs — candidate count stays far
        # below n(n-1)/2 because unrelated docs share no 15-bit band.
        rng = np.random.RandomState(5)
        vocab_a = [f"alpha{i}" for i in range(200)]
        vocab_b = [f"beta{i}" for i in range(200)]
        rows = []
        for d in range(120):
            vocab = vocab_a if d % 2 == 0 else vocab_b
            rows.append((d, " ".join(rng.choice(vocab, 30))))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        # reuse the operator's internal candidate stage by running with the
        # hamming filter wide open at the pigeonhole limit
        n = len(rows)
        cands = dedup.simhash_neardup_pairs(df, max_hamming=3).count()
        assert cands < n * (n - 1) / 2 * 0.05  # << all-pairs

    def test_ngram_jaccard_stopphrase_skew_pruned(self, spark):
        # a planted stop-phrase shared by EVERY doc would make the inverted-
        # index self-join quadratic; with max_df pruning the hot shingles are
        # dropped and only genuinely similar pairs survive.
        boiler = "terms and conditions apply to all content"
        rows = [(i, f"{boiler} unique{i} filler{i} tail{i}") for i in range(40)]
        rows.append((100, "the quick brown fox jumps over the lazy dog"))
        rows.append((101, "the quick brown fox jumps over the lazy dog"))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            (r.a_id, r.b_id): r.jaccard
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=0.5, max_df=10
            ).collect()
        }
        # boilerplate-only pairs are gone (their only shared shingles had
        # df=41 > 10); the true exact-dup pair survives at jaccard 1.0
        assert out == {(100, 101): 1.0}
        # unpruned form: every boilerplate pair shares shingles → quadratic
        # candidates (sanity: pruning actually changed the candidate set)
        unpruned = dedup.ngram_jaccard_pairs(df, threshold=0.01, max_df=None)
        assert unpruned.count() > 40 * 39 / 2

    def test_embedding_cosine_pairs(self, spark):
        rng = np.random.RandomState(3)
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        vecs[7] = vecs[2] * 1.5 + 0.01  # planted near-dup
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id INT, embedding ARRAY<FLOAT>",
        )
        got = {
            (r.a_id, r.b_id): r.cosine
            for r in dedup.embedding_cosine_pairs(df, threshold=0.9).collect()
        }
        v = vecs.astype(np.float64)
        cos = (v @ v.T) / (
            np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
        )
        exp = {
            (a, b): round(cos[a, b], 6)
            for a in range(20)
            for b in range(a + 1, 20)
            if round(cos[a, b], 6) >= 0.9
        }
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=2e-6)


@pytest.mark.spark
class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        rng = np.random.RandomState(5)
        vecs = rng.standard_normal((40, similarity.DIM)).astype(np.float32)
        return (
            spark.createDataFrame(
                [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
                "vec_id INT, embedding ARRAY<FLOAT>",
            ),
            vecs,
        )

    def test_cosine_topk_matches_numpy(self, spark, emb_df):
        df, vecs = emb_df
        got = similarity.cosine_topk(df, n_probes=3, k=5).collect()
        v = vecs.astype(np.float64)
        cos = (v @ v.T) / (
            np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
        )
        for p in range(3):
            order = sorted(
                (i for i in range(40) if i != p),
                key=lambda i: (-round(cos[p, i], 6), i),
            )[:5]
            mine = [r.n_id for r in sorted(got, key=lambda r: r.rank) if r.p_id == p]
            assert mine == order, p

    def test_lsh_buckets_deterministic_and_ranked(self, spark, emb_df):
        df, vecs = emb_df
        out = similarity.lsh_ann_topk(df, n_probes=3, k=5).collect()
        planes = similarity.hyperplanes()
        v = vecs.astype(np.float64)
        buckets = ((v @ planes.T) >= 0).astype(int) @ (1 << np.arange(similarity.N_PLANES))
        for r in out:
            # multi-probe: matched bucket is the NEIGHBOR's bucket, which must
            # be within hamming ≤ 1 of the probe's own bucket
            assert buckets[r.n_id] == r.bucket
            assert bin(int(buckets[r.p_id]) ^ int(r.bucket)).count("1") <= 1
        # recall lift: rank-for-rank, multi-probe cosines dominate the
        # single-bucket variant's (a wider candidate set can only improve
        # the top-k, never worsen it)
        sp = similarity.lsh_ann_topk(df, n_probes=3, k=5, multi_probe=False).collect()
        for p in range(3):
            mp_cos = [r.cosine for r in sorted(out, key=lambda r: r.rank) if r.p_id == p]
            sp_cos = [r.cosine for r in sorted(sp, key=lambda r: r.rank) if r.p_id == p]
            assert len(mp_cos) >= len(sp_cos)
            assert all(m >= s for m, s in zip(mp_cos, sp_cos))
        # within each probe, ranks are 1..n with descending cosine
        for p in range(3):
            rows = sorted((r for r in out if r.p_id == p), key=lambda r: r.rank)
            assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
            assert all(
                rows[i].cosine >= rows[i + 1].cosine for i in range(len(rows) - 1)
            )


@pytest.mark.spark
class TestMultimodal:
    def test_featurize_stub_matches_python(self, spark, docs_df):
        media = multimodal.documents_as_media(docs_df)
        got = {r.doc_id: r for r in multimodal.featurize(media).collect()}
        for doc_id, t in DOCS:
            exp = multimodal._fake_feature(t.encode())
            assert got[doc_id].n_bytes == len(t.encode())
            assert got[doc_id].feature == pytest.approx(exp, abs=1e-9)
            assert got[doc_id].media_type == "text/plain"

    def test_featurize_real_decode_raises_for_unsupported(self, spark, docs_df):
        # text/plain has no real codec in this container — the non-stub path
        # must fail loudly, not silently fake features
        media = multimodal.documents_as_media(docs_df)
        with pytest.raises(Exception, match="NotImplementedError|real decode"):
            multimodal.featurize(media, decode_stub=False).collect()

    @staticmethod
    def _ppm(width, height, pixels, maxval=255, comment=False):
        """Assemble a binary P6 payload; pixels = flat RGB byte list."""
        hdr = b"P6\n" + (b"# test comment\n" if comment else b"")
        hdr += f"{width} {height}\n{maxval}\n".encode()
        if maxval > 255:
            import struct

            return hdr + b"".join(struct.pack(">H", v) for v in pixels)
        return hdr + bytes(pixels)

    def test_decode_pnm_golden(self):
        # 2×2 P6, comment in header: channel means hand-computed
        # R: (10+20+30+40)/4=25, G: (0+100+200+50)/4=87.5, B: 255 everywhere
        px = [10, 0, 255, 20, 100, 255, 30, 200, 255, 40, 50, 255]
        arr, w, h = multimodal.decode_pnm(self._ppm(2, 2, px, comment=True))
        assert (w, h) == (2, 2) and arr.shape == (2, 2, 3)
        assert multimodal._pnm_feature(self._ppm(2, 2, px, comment=True)) == [
            25.0, 87.5, 255.0, 0.0,
        ]

    def test_decode_pnm_16bit_pgm(self):
        # P5 with maxval 65535 → big-endian 2-byte samples
        import struct

        buf = b"P5\n2 1\n65535\n" + struct.pack(">HH", 1000, 3000)
        arr, w, h = multimodal.decode_pnm(buf)
        assert (w, h) == (2, 1) and arr.shape == (1, 2, 1)
        assert arr.reshape(-1).tolist() == [1000.0, 3000.0]
        assert multimodal._pnm_feature(buf) == [2000.0, 0.0, 0.0, 0.0]

    def test_decode_pnm_rejects_garbage(self):
        with pytest.raises(ValueError):
            multimodal.decode_pnm(b"not an image")
        with pytest.raises(ValueError):
            multimodal.decode_pnm(self._ppm(4, 4, [0, 0, 0]))  # truncated

    def test_featurize_real_ppm_decode(self, spark):
        # the non-stub path REALLY decodes PNM payloads, distributed via
        # mapInPandas — rows must match the local decoder exactly
        px_a = [10, 0, 255, 20, 100, 255, 30, 200, 255, 40, 50, 255]
        pay_a = self._ppm(2, 2, px_a)
        pay_b = self._ppm(1, 2, [5, 5, 5, 7, 9, 11], comment=True)
        media = spark.createDataFrame(
            [
                (1, "image/ppm", bytearray(pay_a), (len(pay_a), 2, 2)),
                (2, "image/ppm", bytearray(pay_b), (len(pay_b), 1, 2)),
                (3, "image/ppm", None, (0, 0, 0)),
            ],
            multimodal.MEDIA_SCHEMA,
        )
        got = {
            r.doc_id: r
            for r in multimodal.featurize(media, decode_stub=False).collect()
        }
        assert got[1].feature == [25.0, 87.5, 255.0, 0.0]
        assert got[2].feature == multimodal._pnm_feature(pay_b)
        assert got[3].feature is None

    def test_media_schema_columns(self, spark, docs_df):
        media = multimodal.documents_as_media(docs_df)
        assert [f.name for f in media.schema.fields] == [
            "doc_id",
            "media_type",
            "payload",
            "meta",
        ]
        assert media.schema["payload"].dataType.typeName() == "binary"


@pytest.mark.spark
class TestDecontam:
    """Benchmark n-gram decontamination vs a hand-computed Python oracle."""

    def test_overlap_counts_match_python(self, spark, docs_df):
        from stream_reader_mzxml_spark.pipeline import decontam

        bench = docs_df.filter(F.col("doc_id") == 0)
        corpus = docs_df.filter(F.col("doc_id") != 0)
        got = {
            r.doc_id: r
            for r in decontam.ngram_decontaminate(corpus, bench, n=3).collect()
        }

        def grams(s):
            ws = s.split(" ")
            return {
                h32_py("|".join(ws[i : i + 3])) for i in range(len(ws) - 2)
            } if len(ws) >= 3 else set()

        bg = grams(DOCS[0][1])
        for doc_id, txt in DOCS[1:]:
            g = grams(txt)
            assert got[doc_id].n_grams == len(g), doc_id
            assert got[doc_id].n_hit == len(g & bg), doc_id
        # exact dup of the benchmark doc is fully contaminated
        assert got[3].contam_frac == 1.0 and got[3].contaminated == 1
        # disjoint doc is clean
        assert got[2].n_hit == 0 and got[2].contaminated == 0

    def test_doc_shorter_than_n_is_clean(self, spark, docs_df):
        from stream_reader_mzxml_spark.pipeline import decontam

        bench = docs_df.filter(F.col("doc_id") == 0)
        got = {
            r.doc_id: r
            for r in decontam.ngram_decontaminate(
                docs_df.filter(F.col("doc_id") == 4), bench, n=3
            ).collect()
        }
        # "short text" has 2 words -> no grams -> clean by definition
        assert got[4].n_grams == 0 and got[4].contam_frac == 0.0
        assert got[4].contaminated == 0


@pytest.mark.spark
class TestIVF:
    def test_ivf_plan_matches_numpy_replication(self, spark):
        rng = np.random.RandomState(5)
        vecs = rng.standard_normal((40, similarity.DIM)).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id INT, embedding ARRAY<FLOAT>",
        )
        stride, nprobe, k, n_probes = 13, 2, 5, 3
        got = similarity.ivf_topk(
            df, n_probes=n_probes, k=k, stride=stride, nprobe=nprobe
        ).collect()

        v = vecs.astype(np.float64)
        norms = np.linalg.norm(v, axis=1)
        cids = [i for i in range(40) if i % stride == 0]
        ccos = (v @ v[cids].T) / (norms[:, None] * norms[cids][None, :])
        # argmax with cid-asc tie-break == first max in cid order
        assign = [cids[int(np.argmax(ccos[i]))] for i in range(40)]
        cos = (v @ v.T) / (norms[:, None] * norms[None, :])
        by_probe = {}
        for r in got:
            by_probe.setdefault(r.p_id, []).append(r)
        for p in range(n_probes):
            probed = [
                cids[j] for j in np.argsort(-ccos[p], kind="stable")[:nprobe]
            ]
            cand = [
                i for i in range(40) if i != p and assign[i] in probed
            ]
            order = sorted(cand, key=lambda i: (-round(cos[p, i], 6), i))[:k]
            mine = [r.n_id for r in sorted(by_probe[p], key=lambda r: r.rank)]
            assert mine == order, p
            # every returned neighbor really lives in a probed partition
            for r in by_probe[p]:
                assert assign[r.n_id] == r.cluster and r.cluster in probed

    def test_ivf_rank_window_is_salted_free_but_bounded(self, spark):
        # structural: k rows max per probe, ranks contiguous from 1
        rng = np.random.RandomState(6)
        vecs = rng.standard_normal((30, similarity.DIM)).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id INT, embedding ARRAY<FLOAT>",
        )
        got = similarity.ivf_topk(df, n_probes=2, k=4, stride=7, nprobe=2).collect()
        for p in {r.p_id for r in got}:
            ranks = sorted(r.rank for r in got if r.p_id == p)
            assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 4


@pytest.mark.spark
class TestDomainCaps:
    def test_caps_and_priority_selection(self, spark):
        from stream_reader_mzxml_spark.pipeline.curation import domain_caps

        rows = [(i, "hot" if i < 40 else f"cold{i % 3}") for i in range(52)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        got = domain_caps(df, cap=5).collect()
        by_src = {}
        for r in got:
            by_src.setdefault(r.source, []).append(r)
        # every source capped; hot source (40 docs) reduced to exactly 5
        assert len(by_src["hot"]) == 5
        for src, rs in by_src.items():
            assert len(rs) <= 5
            expect = sorted(
                (i for i, s in rows if s == src),
                key=lambda i: (h32_py("cap:" + str(i)), i),
            )[:5]
            assert [r.doc_id for r in sorted(rs, key=lambda r: r.rank)] == expect


@pytest.mark.spark
class TestSegmentDedup:
    def test_shared_segment_counted(self, spark):
        w = dedup.SEGMENT_WIDTH
        shared = " ".join(f"s{i}" for i in range(w))
        uniq_a = " ".join(f"a{i}" for i in range(w))
        uniq_b = " ".join(f"b{i}" for i in range(w))
        docs = [
            (0, f"{shared} {uniq_a}"),  # both segments duplicated (doc1, doc2)
            (1, f"{shared} {uniq_b}"),  # 2 segments, 1 duplicated
            (2, uniq_a + " tail"),      # 1 segment ("tail" partial dropped);
                                        # hashes match doc0's SECOND chunk —
                                        # content-hashed, alignment-free
            (3, "tiny"),                # < w words -> 0 segments
        ]
        got = {
            r.doc_id: r
            for r in dedup.segment_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"])
            ).collect()
        }
        assert (got[0].n_segments, got[0].n_dup_segments) == (2, 2)
        assert got[0].dup_frac == 1.0
        assert (got[1].n_segments, got[1].n_dup_segments) == (2, 1)
        assert got[1].dup_frac == 0.5
        assert (got[2].n_segments, got[2].n_dup_segments) == (1, 1)
        assert (got[3].n_segments, got[3].n_dup_segments) == (0, 0)
        assert got[3].dup_frac == 0.0


@pytest.mark.spark
class TestContextChunks:
    def test_chunking_matches_python(self, spark):
        docs = [
            (0, " ".join(f"w{i}" for i in range(70))),  # 2 full + tail 6 -> drop
            (1, " ".join(f"w{i}" for i in range(75))),  # 2 full + tail 11 -> keep
            (2, " ".join(f"w{i}" for i in range(32))),  # exactly 1 full
            (3, "w0 w1 w2"),                            # 3 < min_tail -> none
        ]
        got = sorted(
            map(
                tuple,
                text.context_chunks(
                    spark.createDataFrame(docs, ["doc_id", "text"])
                ).collect(),
            )
        )

        exp = []
        for doc_id, t in docs:
            hs = [h32_py(w) for w in t.split(" ")]
            n_full, tail = len(hs) // 32, len(hs) % 32
            n_chunks = n_full + (1 if tail >= 8 else 0)
            for i in range(n_chunks):
                chunk = hs[i * 32 : i * 32 + 32]
                acc = 0
                for x in chunk:
                    acc = (acc * text.FNV_PRIME + x) % text.FOLD_MOD
                exp.append((doc_id, i, len(chunk), acc))
        assert got == sorted(exp)
        assert (0, 2, 6, 0) not in [e[:3] + (0,) for e in exp]  # tail 6 dropped
        lens = {(d, i): ln for d, i, ln, _ in exp}
        assert lens[(1, 2)] == 11 and (0, 2) not in lens and (3, 0) not in lens


@pytest.mark.spark
class TestSourceDrift:
    def test_kl_tv_match_python(self, spark):
        import math

        rows = [
            (0, "a b c d e f g h", "s0"),
            (1, "a a a a b b c d", "s0"),
            (2, "x y z x y z x y", "s1"),
            (3, "a b x y c d z w", "s1"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = {r.source: r for r in text.source_drift(df, n_buckets=8).collect()}

        from collections import Counter

        c_sb, c_b = Counter(), Counter()
        for _, t, s in rows:
            for w in t.split(" "):
                bkt = h32_py(w) % 8
                c_sb[(s, bkt)] += 1
                c_b[bkt] += 1
        tot = sum(c_b.values())
        for s in ("s0", "s1"):
            c_s = sum(v for (src, _), v in c_sb.items() if src == s)
            kl = tv = 0.0
            for bkt in sorted(c_b):  # ordered fold, buckets ascending
                p = c_sb.get((s, bkt), 0) / c_s
                q = c_b[bkt] / tot
                kl += p * math.log(p / q) if p > 0 else 0.0
                tv += abs(p - q)
            assert got[s].n_tokens == c_s
            assert got[s].kl_divergence == pytest.approx(round(kl, 6), abs=2e-6)
            assert got[s].tv_distance == pytest.approx(round(tv / 2.0, 6), abs=2e-6)
        # a source identical to the corpus mixture would have kl == tv == 0;
        # these two differ from the pooled distribution
        assert got["s1"].kl_divergence > 0


@pytest.mark.spark
class TestConnectedComponents:
    def test_chain_star_and_singleton_pair(self, spark):
        from stream_reader_mzxml_spark.pipeline.dedup import connected_components

        # chain 1-2-3-4-5 (diameter > 1 forces real label propagation),
        # star 10-{11,12,13}, isolated pair (20, 21), duplicate + reversed
        # edges and a self-loop that must be ignored
        edges = [
            (2, 1), (2, 3), (4, 3), (4, 5),
            (10, 11), (10, 12), (13, 10),
            (20, 21), (21, 20), (7, 7),
        ]
        df = spark.createDataFrame(edges, "a_id BIGINT, b_id BIGINT")
        got = {
            (r["doc_id"], r["component_id"], r["cluster_size"])
            for r in connected_components(df).collect()
        }
        exp = (
            {(n, 1, 5) for n in (1, 2, 3, 4, 5)}
            | {(n, 10, 4) for n in (10, 11, 12, 13)}
            | {(n, 20, 2) for n in (20, 21)}
        )
        assert got == exp

    def test_long_chain_converges_in_log_rounds(self, spark):
        from stream_reader_mzxml_spark.pipeline.dedup import connected_components

        # a 64-node chain: naive min-label propagation needs ~63 rounds;
        # large-star/small-star must finish within the max_iter=12 cap
        edges = [(i, i + 1) for i in range(64)]
        df = spark.createDataFrame(edges, "a_id BIGINT, b_id BIGINT")
        out = connected_components(df, max_iter=12).collect()
        assert len(out) == 65
        assert all(r["component_id"] == 0 and r["cluster_size"] == 65 for r in out)


@pytest.mark.spark
class TestDedupApply:
    def test_keeper_assignment(self, spark):
        from stream_reader_mzxml_spark.pipeline.curation import dedup_apply

        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id BIGINT")
        comps = spark.createDataFrame(
            # cluster {1,3,4} keeps 1; doc 0, 2, 5 unclustered
            [(1, 1, 3), (3, 1, 3), (4, 1, 3)],
            "doc_id BIGINT, component_id BIGINT, cluster_size BIGINT",
        )
        got = {
            (r["doc_id"], r["keeper_doc_id"], r["keep"])
            for r in dedup_apply(docs, comps).collect()
        }
        assert got == {
            (0, 0, 1), (1, 1, 1), (2, 2, 1), (3, 1, 0), (4, 1, 0), (5, 5, 1),
        }


@pytest.mark.spark
class TestTfIdf:
    def test_matches_python(self, spark):
        import math
        from collections import Counter

        from stream_reader_mzxml_spark.pipeline.text import (
            TFIDF_MIN_TF,
            tfidf_scores,
        )
        from stream_reader_mzxml_spark.pipeline.text import h32 as _h32
        import hashlib

        rows = [
            (0, "a b a c a b"),
            (1, "a d d e"),
            (2, "f f f a"),
        ]
        docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

        def h(w):
            return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)

        tf = {(d, h(w)): c for d, t in rows for w, c in Counter(t.split(" ")).items()}
        df = Counter(term for (_, term) in tf)
        n = len(rows)
        exp = {
            (d, term, c, df[term],
             round(c * (math.log((n + 1) / (df[term] + 1)) + 1), 6))
            for (d, term), c in tf.items() if c >= TFIDF_MIN_TF
        }
        got = {tuple(r) for r in tfidf_scores(docs).collect()}
        assert got == exp


@pytest.mark.spark
class TestMixing:
    """mixture_sample / sequence_packing vs hand-computed Python oracles."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        from stream_reader_mzxml_spark.pipeline import mixing  # noqa: F401

        # two sources: one fat (must be downsampled), one thin (rate 1.0);
        # doc_ids interleave so range buckets mix sources.
        rows = []
        for i in range(40):
            src = "fat" if i % 2 == 0 else "thin"
            n_words = 12 if src == "fat" else 3
            rows.append((i, src, " ".join(f"w{i}x{j}" for j in range(n_words))))
        return spark.createDataFrame(rows, ["doc_id", "source", "text"])

    def test_mixture_rates_and_determinism(self, spark, corpus):
        from stream_reader_mzxml_spark.pipeline import mixing

        out = {
            r.doc_id: r
            for r in mixing.mixture_sample(
                corpus, target_tokens=100
            ).collect()
        }
        assert len(out) == 40
        # thin source: 20 docs * 3 tokens = 60 <= 100 -> rate 1.0, all sampled
        for i in range(1, 40, 2):
            assert out[i].keep_rate == 1.0 and out[i].sampled == 1
        # fat source: 240 tokens -> rate 100/240; decision is the exact
        # integer test the module documents
        for i in range(0, 40, 2):
            r = out[i]
            assert r.src_tokens == 240
            expect = int((h32_py(str(i)) % 1_000_000) * 240 < 100 * 1_000_000)
            assert r.sampled == expect
        # both verdicts occur (not a degenerate all-keep / all-drop split)
        fat = [out[i].sampled for i in range(0, 40, 2)]
        assert 0 < sum(fat) < len(fat)

    def test_packing_matches_serial_oracle(self, spark, corpus):
        from stream_reader_mzxml_spark.pipeline import mixing

        budget, width = 16, 4  # force multi-bucket prefix sums per source
        got = {
            r.doc_id: r
            for r in mixing.sequence_packing(
                corpus, budget=budget, bucket_width=width
            ).collect()
        }
        # serial oracle: concat per source in doc_id order
        by_src: dict[str, int] = {}
        for i in range(40):
            src = "fat" if i % 2 == 0 else "thin"
            n = 12 if src == "fat" else 3
            cum = by_src.get(src, 0)
            r = got[i]
            assert r.n_tokens == n
            assert r.cum_before == cum, f"doc {i}"
            assert r.offset_in_seq == cum % budget
            assert r.first_seq == cum // budget
            assert r.last_seq == (cum + n - 1) // budget
            assert r.n_seqs == r.last_seq - r.first_seq + 1
            by_src[src] = cum + n
        # every in-sequence offset is within the budget
        assert all(0 <= r.offset_in_seq < budget for r in got.values())

    def test_packing_zero_token_doc(self, spark):
        from stream_reader_mzxml_spark.pipeline import mixing

        df = spark.createDataFrame(
            [(0, "s", "a b c"), (1, "s", ""), (2, "s", "d e")],
            ["doc_id", "source", "text"],
        )
        got = {r.doc_id: r for r in mixing.sequence_packing(df, budget=4).collect()}
        assert got[1].n_tokens == 0
        # a zero-token doc spans exactly the one sequence its offset is in
        assert got[1].first_seq == got[1].last_seq and got[1].n_seqs == 1
        assert got[2].cum_before == 3  # the empty doc adds nothing


@pytest.mark.spark
class TestPiiRedact:
    def test_redaction_golden(self, spark):
        df = spark.createDataFrame(
            [
                (0, "mail me at bob.smith@host123.com or call 5551234 now"),
                (1, "no pii here at all"),
                (2, "codes 123 and 4567 twice"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in text.pii_redact(df).collect()}
        # doc 0: the email (which contains '123') is redacted FIRST, so only
        # the phone digit-run remains to count as a <NUM> redaction
        assert got[0].n_email_redactions == 1
        assert got[0].n_num_redactions == 1
        expect0 = "mail me at <EMAIL> or call <NUM> now"
        assert got[0].redacted_len == len(expect0)
        assert got[0].redacted_md5 == hashlib.md5(expect0.encode()).hexdigest()
        assert got[1].n_email_redactions == 0 and got[1].n_num_redactions == 0
        assert got[2].n_num_redactions == 2
        expect2 = "codes <NUM> and <NUM> twice"
        assert got[2].redacted_md5 == hashlib.md5(expect2.encode()).hexdigest()


@pytest.mark.spark
class TestKMeansStep:
    def test_step_matches_numpy_lloyd(self, spark):
        from stream_reader_mzxml_spark.pipeline.similarity import (
            KM_QUANT,
            kmeans_step,
        )

        rng = np.random.RandomState(60)
        X = rng.standard_normal((40, 64)).astype(np.float32)
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in X[i]]) for i in range(40)],
            ["vec_id", "embedding"],
        )
        stride = 13  # seeds: 0, 13, 26, 39
        got = kmeans_step(emb, stride=stride).collect()

        # numpy oracle in the same exact fixed-point arithmetic
        Q = np.round(X.astype(np.float64) * KM_QUANT).astype(np.int64)
        seeds = [i for i in range(40) if i % stride == 0]
        C = Q[seeds]
        d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (40, 4)
        assign = np.array([seeds[j] for j in d2.argmin(axis=1)])
        by = {}
        for cl in sorted(set(assign)):
            m = assign == cl
            by[cl] = (
                int(m.sum()),
                int(d2[m, seeds.index(cl)].sum()),
                Q[m].sum(axis=0),
            )
        assert {r.cluster_id for r in got} == set(by)
        for r in got:
            n, inertia, sums = by[r.cluster_id]
            assert r.n_members == n
            assert r.inertia_q == inertia
            assert r.sum_q == int(sums[r.dim - 1])
            # the engine rounds in exact integer arithmetic (half away
            # from zero at 6 dp) — replicate the same integers here
            sq = int(sums[r.dim - 1])
            numer, denom = abs(sq) * 1_000_000, n * KM_QUANT
            sign = -1 if sq < 0 else 1
            exp_mean = sign * ((2 * numer + denom) // (2 * denom)) / 1e6
            assert r.mean == exp_mean


@pytest.mark.spark
class TestBpePairs:
    def test_pair_counts_match_python(self, spark):
        from collections import Counter

        rows = [(0, "banana band"), (1, "an ban a"), (2, "x")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = [(r.pair, r.cnt) for r in text.bpe_pair_counts(df, k=5).collect()]
        c = Counter()
        for _, t in rows:
            for w in t.split(" "):
                for i in range(len(w) - 1):
                    c[w[i : i + 2]] += 1
        exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert got == exp


@pytest.mark.spark
class TestPiiRedactStreaming:
    def test_redact_runs_on_stream(self, spark, tmp_path):
        # pii_redact is one stateless projection — it must run unchanged on
        # a stream and emit the batch rows row-for-row
        import uuid

        rows = [
            (i, f"doc {i} mail a{i}@b{i}.org code {1000 + i}") for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        src = str(tmp_path / "docs_stream")
        df.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"redact_{uuid.uuid4().hex[:8]}"
        q = (
            text.pii_redact(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(map(tuple, text.pii_redact(df).collect()))
        assert len(exp) == 60
        assert got == exp


@pytest.mark.spark
class TestTrainingManifest:
    def test_stage_attribution_is_monotone(self, spark):
        from stream_reader_mzxml_spark.pipeline.curation import (
            training_manifest,
        )

        good = "the quick brown fox jumps of the lazy dog and it runs to town"
        rows = [(i, f"s{i % 2}", good + f" tail{i}") for i in range(20)]
        rows.append((20, "s0", "too few"))      # dropped at curation
        rows.append((21, "s1", good + " tail1"))  # exact dup of doc 1
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = {r.doc_id: r for r in training_manifest(df).collect()}
        assert len(out) == 22
        for r in out.values():
            # stage verdicts are monotone: NULL after the first drop
            if r.keep_curation == 0:
                assert r.keep_dedup is None and r.sampled is None
                assert r.first_seq is None
            elif r.keep_dedup == 0:
                assert r.sampled is None and r.first_seq is None
            elif r.sampled == 0:
                assert r.first_seq is None
            else:
                assert r.first_seq is not None and r.last_seq >= r.first_seq
        assert out[20].keep_curation == 0
        assert out[21].keep_curation == 0  # exact dup loses to doc 1
        # at least one doc reaches the packed stage
        assert any(r.first_seq is not None for r in out.values())


@pytest.mark.spark
class TestKMeansIterated:
    def test_three_iterations_match_numpy_fixed_point_lloyd(self, spark):
        from stream_reader_mzxml_spark.pipeline.similarity import (
            KM_QUANT,
            kmeans_iterate,
        )

        rng = np.random.RandomState(63)
        X = rng.standard_normal((50, 64)).astype(np.float32)
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in X[i]]) for i in range(50)],
            ["vec_id", "embedding"],
        )
        stride = 17  # seeds 0, 17, 34
        got = kmeans_iterate(emb, n_iters=3, stride=stride).collect()

        def me6(s, n):  # exact-integer 6-dp mean, half away from zero
            sign = -1 if s < 0 else 1
            return sign * ((2 * abs(s) * 1_000_000 + n * KM_QUANT)
                           // (2 * n * KM_QUANT))

        Q = np.round(X.astype(np.float64) * KM_QUANT).astype(np.int64)
        seeds = [i for i in range(50) if i % stride == 0]
        cents = {s: Q[s] for s in seeds}
        for _ in range(3):
            cids = sorted(cents)
            C = np.stack([cents[c] for c in cids])
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.array([cids[j] for j in d2.argmin(axis=1)])
            inert = {c: int(d2[assign == c, cids.index(c)].sum())
                     for c in set(assign)}
            new = {}
            for c in sorted(set(assign)):
                m = assign == c
                sums = Q[m].sum(axis=0)
                new[c] = np.array(
                    [me6(int(s), int(m.sum())) for s in sums], dtype=np.int64
                )
            counts = {c: int((assign == c).sum()) for c in set(assign)}
            final = (assign, counts, inert, {c: Q[assign == c].sum(axis=0)
                                             for c in set(assign)})
            cents = new
        assign, counts, inert, sums = final
        assert {r.cluster_id for r in got} == set(counts)
        for r in got:
            assert r.n_members == counts[r.cluster_id]
            assert r.inertia_q == inert[r.cluster_id]
            assert r.sum_q == int(sums[r.cluster_id][r.dim - 1])
            assert r.mean == me6(int(sums[r.cluster_id][r.dim - 1]),
                                 counts[r.cluster_id]) / 1e6


@pytest.mark.spark
class TestSegmentDedupApply:
    def test_rewrite_drops_cross_doc_segments_keeper_keeps(self, spark):
        # width-4 segments; docs 0 and 1 share their first segment, doc 0
        # (min doc_id) is the keeper; tails are always kept
        w = 4
        seg = "a b c d"
        rows = [
            (0, seg + " x y z"),          # keeper: keeps everything
            (1, seg + " p q r s t"),      # drops seg, keeps "p q r s" + tail "t"
            (2, "u v w only three here"), # one unique segment + tail
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.doc_id: r for r in
               dedup.segment_dedup_apply(df, width=w).collect()}
        exp = {
            0: seg + " x y z",
            1: "p q r s t",
            2: "u v w only three here",
        }
        assert got[0].n_dropped == 0 and got[1].n_dropped == 1
        assert got[2].n_dropped == 0
        for i, t in exp.items():
            assert got[i].new_len == len(t), i
            assert got[i].new_md5 == hashlib.md5(t.encode()).hexdigest(), i

    def test_all_segments_dropped_rebuilds_empty(self, spark):
        w = 4
        rows = [(0, "a b c d e f g h"), (1, "a b c d e f g h")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.doc_id: r for r in
               dedup.segment_dedup_apply(df, width=w).collect()}
        assert got[0].n_dropped == 0          # keeper
        assert got[1].n_dropped == 2 and got[1].new_len == 0
        assert got[1].new_md5 == hashlib.md5(b"").hexdigest()


@pytest.mark.spark
class TestCurationGatesStreaming:
    def test_gates_run_on_stream(self, spark, tmp_path):
        import uuid

        from stream_reader_mzxml_spark.pipeline.curation import curation_gates

        good = "the quick brown fox jumps of the lazy dog and it runs to town"
        rows = [(i, good + f" tail{i}") for i in range(30)]
        rows += [(30, "too few"), (31, good + " mail a@b.org")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        src = str(tmp_path / "gates_stream")
        df.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"gates_{uuid.uuid4().hex[:8]}"
        q = (
            curation_gates(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(map(tuple, curation_gates(df).collect()))
        assert got == exp
        by_id = {r[0]: r for r in got}
        assert by_id[30][4] == 0 and by_id[30][5] == "quality"
        assert by_id[31][4] == 0 and by_id[31][5] == "pii"
        assert by_id[0][4] == 1


@pytest.mark.spark
class TestSequenceManifest:
    def test_slots_conserve_tokens_and_fill_budget(self, spark):
        from stream_reader_mzxml_spark.pipeline import mixing

        rows = []
        for i in range(30):
            n = (i % 7) + 1  # 1..7 words
            rows.append((i, "s" + str(i % 2), " ".join("w" * 1 for _ in range(n))))
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        budget = 10
        man = {(r.source, r.seq_id): r for r in
               mixing.sequence_manifest(df, budget=budget, bucket_width=4)
               .collect()}
        # conservation: manifest token slots == corpus tokens per source
        per_src = {}
        for i, s, t in rows:
            per_src[s] = per_src.get(s, 0) + len(t.split(" "))
        for s, total in per_src.items():
            seqs = sorted(k[1] for k in man if k[0] == s)
            assert seqs == list(range(len(seqs)))  # contiguous from 0
            assert sum(man[(s, q)].n_tokens for q in seqs) == total
            # every sequence but the last is exactly full
            for q in seqs[:-1]:
                assert man[(s, q)].n_tokens == budget
            # doc spans are monotone: a later sequence never starts before
            # the previous one's last contributing doc
            for q in seqs[:-1]:
                assert man[(s, q + 1)].first_doc >= man[(s, q)].last_doc


@pytest.mark.spark
class TestCorpusWriter:
    def test_partitioned_roundtrip_and_file_caps(self, spark, tmp_path):
        import os

        from stream_reader_mzxml_spark.sources.sinks import write_corpus

        rows = [(i, f"s{i % 3}", f"doc number {i}") for i in range(90)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        path = str(tmp_path / "corpus")
        write_corpus(df, path, max_records_per_file=10)
        # directory partitions per source
        parts = sorted(
            d for d in os.listdir(path) if d.startswith("source=")
        )
        assert parts == ["source=s0", "source=s1", "source=s2"]
        # file cap honored: 30 rows per source / 10 per file -> >= 3 files
        files = [
            f for f in os.listdir(os.path.join(path, "source=s0"))
            if f.endswith(".parquet")
        ]
        assert len(files) >= 3
        back = spark.read.parquet(path)
        assert sorted(map(tuple, back.select("doc_id", "source", "text")
                          .collect())) == sorted(rows)

    def test_bucketed_join_is_exchange_free(self, spark, tmp_path):
        import uuid

        from stream_reader_mzxml_spark.sources.sinks import (
            write_corpus_bucketed,
        )

        rows = [(i, f"doc {i}") for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        t1, t2 = (f"bt_{uuid.uuid4().hex[:8]}" for _ in range(2))
        write_corpus_bucketed(df, t1, str(tmp_path / "b1"), n_buckets=4)
        write_corpus_bucketed(df, t2, str(tmp_path / "b2"), n_buckets=4)
        # force the sort-merge path: tiny test tables would otherwise be
        # broadcast, which bypasses (and so can't demonstrate) bucketing
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(t1).join(spark.table(t2), "doc_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # bucketing metadata elides the shuffle: no hash-partitioning
            # exchange on either side of the join
            assert "Exchange hashpartitioning" not in plan
            assert "SortMergeJoin" in plan
            assert joined.count() == 200
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql(f"DROP TABLE {t1}")
            spark.sql(f"DROP TABLE {t2}")


@pytest.mark.spark
class TestMixtureStreaming:
    def test_mixture_runs_on_stream_row_for_row(self, spark, tmp_path):
        # with per-source totals precomputed (the production shape: rates
        # are decided from corpus stats ahead of time), mixture_sample is a
        # stream-static broadcast join + scan projection — append-mode safe
        # and row-for-row equal to the batch run given the same totals
        import uuid

        from stream_reader_mzxml_spark.pipeline import mixing

        rows = [
            (i, f"s{i % 3}", " ".join(f"w{j}" for j in range((i % 9) + 1)))
            for i in range(90)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        totals = df.select(
            "source", mixing._ws_tokens("text").alias("n")
        ).groupBy("source").agg(F.sum("n").alias("src_tokens"))

        src = str(tmp_path / "mix_stream")
        df.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id BIGINT, source STRING, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"mix_{uuid.uuid4().hex[:8]}"
        q = (
            mixing.mixture_sample(stream, target_tokens=100, totals=totals)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(
            map(
                tuple,
                mixing.mixture_sample(
                    df, target_tokens=100, totals=totals
                ).collect(),
            )
        )
        assert len(exp) == 90
        assert got == exp
        # and the precomputed-totals batch form equals the self-computed one
        self_computed = sorted(
            map(tuple, mixing.mixture_sample(df, target_tokens=100).collect())
        )
        assert exp == self_computed


@pytest.mark.spark
class TestContextChunksStreaming:
    def test_chunks_run_on_stream_row_for_row(self, spark, tmp_path):
        # context_chunks is a zero-shuffle posexplode projection — must run
        # unchanged on a stream and emit the batch rows row-for-row
        import uuid

        from stream_reader_mzxml_spark.pipeline import text as t

        rows = [
            (i, " ".join(f"tok{i}_{j}" for j in range((i % 40) + 1)))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        src = str(tmp_path / "chunk_stream")
        df.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"chunks_{uuid.uuid4().hex[:8]}"
        q = (
            t.context_chunks(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(map(tuple, t.context_chunks(df).collect()))
        assert len(exp) > 60  # multi-chunk docs exist
        assert got == exp


@pytest.mark.spark
class TestHoldoutSplit:
    def test_split_disjoint_exhaustive_stable(self, spark):
        """Every doc gets exactly one split; rates track the ppm thresholds;
        membership is a pure function of doc_id (stable under corpus
        growth: the same doc keeps its split in a larger corpus)."""
        from stream_reader_mzxml_spark.pipeline.curation import holdout_split

        small = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"), F.lit("src_a").alias("source")
        )
        out = holdout_split(small).collect()
        assert len(out) == 2000
        by_split = {}
        for r in out:
            assert r.split in ("train", "val", "test")
            by_split.setdefault(r.split, set()).add(r.doc_id)
        # rates within 3 sigma of 10% val / 5% test
        assert abs(len(by_split["val"]) - 200) < 3 * (2000 * 0.1 * 0.9) ** 0.5
        assert abs(len(by_split["test"]) - 100) < 3 * (2000 * 0.05 * 0.95) ** 0.5
        # growth stability: the first 2000 docs keep their split in a 4000-doc corpus
        big = spark.range(0, 4000).select(
            F.col("id").alias("doc_id"), F.lit("src_a").alias("source")
        )
        big_map = {
            r.doc_id: r.split
            for r in holdout_split(big).collect()
            if r.doc_id < 2000
        }
        assert all(big_map[r.doc_id] == r.split for r in out)

    def test_split_draw_independent_of_mixture_draw(self, spark):
        """The 'split:' salt decorrelates this draw from mixture_sample's
        unsalted h32(doc_id): among mixture-favored (low unsalted hash)
        docs, the test+val fraction stays at the configured rate."""
        from stream_reader_mzxml_spark.pipeline.curation import holdout_split
        from stream_reader_mzxml_spark.pipeline.text import h32

        docs = spark.range(0, 4000).select(
            F.col("id").alias("doc_id"), F.lit("s").alias("source")
        )
        joined = (
            holdout_split(docs)
            .withColumn("unsalted", h32(F.col("doc_id").cast("string")))
        )
        low_half = joined.filter(
            F.col("unsalted") < F.lit(2**31)
        )
        n = low_half.count()
        eval_n = low_half.filter(F.col("split") != "train").count()
        p = 0.15
        assert abs(eval_n - p * n) < 4 * (n * p * (1 - p)) ** 0.5

    def test_split_runs_on_stream_row_for_row(self, spark, tmp_path):
        """Zero-shuffle scan projection — must run unchanged on a stream."""
        import uuid

        from stream_reader_mzxml_spark.pipeline.curation import holdout_split

        df = spark.createDataFrame(
            [(i, f"src_{i % 3}") for i in range(100)], ["doc_id", "source"]
        )
        src = str(tmp_path / "split_stream")
        df.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id BIGINT, source STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"split_{uuid.uuid4().hex[:8]}"
        q = (
            holdout_split(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(map(tuple, holdout_split(df).collect()))
        assert got == exp


class TestWavCodec:
    """decode_wav goldens: hand-built RIFF/PCM payloads, no audio library."""

    @staticmethod
    def _wav(samples, n_channels=1, bits=16, rate=8000, fmt=1, extra_chunk=False):
        import struct

        if bits == 16:
            data = b"".join(struct.pack("<h", v) for v in samples)
        else:
            data = bytes(samples)
        block = n_channels * bits // 8
        fmt_body = struct.pack(
            "<HHIIHH", fmt, n_channels, rate, rate * block, block, bits
        )
        chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        if extra_chunk:  # odd-sized chunk before data: exercises pad-byte walk
            chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_decode_wav_golden_stereo16(self):
        # 3 frames, 2 channels interleaved: ch0 = (100, -200, 300) mean 66.67,
        # ch1 = (-1000, 2000, 3000) mean 1333.33
        buf = self._wav([100, -1000, -200, 2000, 300, 3000], n_channels=2)
        samples, rate = multimodal.decode_wav(buf)
        assert rate == 8000 and samples.shape == (3, 2)
        assert samples[:, 0].tolist() == [100.0, -200.0, 300.0]
        assert samples[:, 1].tolist() == [-1000.0, 2000.0, 3000.0]
        assert multimodal._wav_feature(buf) == [
            round(200 / 3, 6), round(4000 / 3, 6), 0.0, 0.0,
        ]

    def test_decode_wav_8bit_mono_and_chunk_padding(self):
        # 8-bit unsigned centers at 128; odd-sized LIST chunk must be skipped
        buf = self._wav([128, 130, 126, 128], bits=8, extra_chunk=True)
        samples, _ = multimodal.decode_wav(buf)
        assert samples.reshape(-1).tolist() == [0.0, 2.0, -2.0, 0.0]

    def test_decode_wav_rejects_bad_payloads(self):
        with pytest.raises(ValueError):
            multimodal.decode_wav(b"not audio")
        with pytest.raises(ValueError, match="non-PCM"):
            multimodal.decode_wav(self._wav([0, 0], fmt=3))
        trunc = self._wav([1, 2, 3, 4])[:-3]
        with pytest.raises(ValueError):
            multimodal.decode_wav(trunc)

    def test_featurize_real_wav_decode(self, spark):
        pay = self._wav([100, -1000, -200, 2000, 300, 3000], n_channels=2)
        media = spark.createDataFrame(
            [
                (1, "audio/wav", bytearray(pay), (len(pay), 0, 0)),
                (2, "audio/wav", None, (0, 0, 0)),
            ],
            multimodal.MEDIA_SCHEMA,
        )
        got = {
            r.doc_id: r
            for r in multimodal.featurize(media, decode_stub=False).collect()
        }
        assert got[1].feature == multimodal._wav_feature(pay)
        assert got[2].feature is None

    def test_wav_fixture_roundtrip(self, spark):
        # the q70 fixture's payloads really decode to the analytic means
        docs = spark.range(0, 3).select(F.col("id").alias("doc_id"))
        rows = multimodal.wav_fixture_media(docs, n=3).collect()
        assert len(rows) == 3
        for r in rows:
            samples, rate = multimodal.decode_wav(bytes(r.payload))
            assert rate == multimodal.WAV_FIX_RATE
            assert samples.shape == (
                multimodal.WAV_FIX_FRAMES, multimodal.WAV_FIX_CH,
            )
            s = np.arange(samples.size, dtype=np.int64)
            exp = ((r.doc_id * 131 + s * 17) % 65536) - 32768
            assert samples.reshape(-1).tolist() == exp.astype(float).tolist()


class TestPngCodec:
    """Round-5 PNG codec: inflate + all five unfilter paths, CRC, variants."""

    def test_roundtrip_all_filters(self):
        # png_encode cycles filter type r % 5 → ≥5 rows exercises them all
        rng = np.random.default_rng(7)
        for w, h, ch in [(16, 8, 3), (5, 7, 1), (9, 11, 4), (1, 6, 3)]:
            raster = rng.integers(0, 256, size=h * w * ch).astype(np.uint8)
            px, W, H = multimodal.decode_png(multimodal.png_encode(raster, w, h, ch))
            assert (W, H) == (w, h)
            assert np.array_equal(px.astype(np.uint8).reshape(-1), raster)

    @staticmethod
    def _chunked(ihdr_tail, scan, extra=b""):
        import zlib

        m = multimodal
        return (
            m._PNG_SIG
            + m._png_chunk(b"IHDR", ihdr_tail)
            + extra
            + m._png_chunk(b"IDAT", zlib.compress(bytes(scan)))
            + m._png_chunk(b"IEND", b"")
        )

    def test_16bit_grayscale(self):
        w, h = 3, 4
        vals = (np.arange(w * h) * 1000 % 65536).astype(">u2")
        rows = vals.reshape(h, w)
        scan = bytearray()
        prev = np.zeros(w * 2, dtype=np.int64)
        for r in range(h):  # alternate None / Up filters
            rb = np.frombuffer(rows[r].tobytes(), dtype=np.uint8).astype(np.int64)
            if r % 2 == 0:
                scan += bytes([0]) + rb.astype(np.uint8).tobytes()
            else:
                scan += bytes([2]) + ((rb - prev) % 256).astype(np.uint8).tobytes()
            prev = rb
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])
        px, W, H = multimodal.decode_png(self._chunked(ihdr, scan))
        assert np.array_equal(px.reshape(-1), vals.astype(np.float64))

    def test_palette_expansion(self):
        m = multimodal
        pal = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], dtype=np.uint8
        )
        idx = np.array([0, 1, 2, 3, 3, 2, 1, 0], dtype=np.uint8).reshape(4, 2)
        scan = bytearray()
        for r in range(4):
            scan += bytes([0]) + idx[r].tobytes()
        ihdr = (2).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
        px, W, H = m.decode_png(
            self._chunked(ihdr, scan, extra=m._png_chunk(b"PLTE", pal.tobytes()))
        )
        assert px.shape == (4, 2, 3)
        assert np.array_equal(px[0, 0], [255.0, 0.0, 0.0])
        assert np.array_equal(px[1, 1], [9.0, 8.0, 7.0])  # idx row1 = [2, 3]
        assert np.array_equal(px[3, 0], [0.0, 255.0, 0.0])  # idx row3 = [1, 0]

    def test_crc_corruption_detected(self):
        buf = bytearray(
            multimodal.png_encode(np.zeros(16 * 8 * 3, dtype=np.uint8), 16, 8, 3)
        )
        buf[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            multimodal.decode_png(bytes(buf))

    def test_rejects_garbage_and_interlace(self):
        with pytest.raises(ValueError):
            multimodal.decode_png(b"not a png")
        ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 1])
        with pytest.raises(ValueError, match="interlaced"):
            multimodal.decode_png(self._chunked(ihdr, bytearray(b"\x00" * 14)))

    def test_featurize_real_png_decode(self, spark):
        # distributed non-stub decode matches the local decoder exactly
        raster = ((np.arange(2 * 2 * 3) * 11 + 3) % 256).astype(np.uint8)
        pay = multimodal.png_encode(raster, 2, 2, 3)
        media = spark.createDataFrame(
            [(1, "image/png", bytearray(pay), (len(pay), 2, 2))],
            multimodal.MEDIA_SCHEMA,
        )
        got = multimodal.featurize(media, decode_stub=False).collect()[0]
        assert got.feature == multimodal._png_feature(pay)
        px = raster.reshape(2, 2, 3).astype(np.float64)
        assert got.feature[:3] == [round(float(px[:, :, c].mean()), 6) for c in range(3)]


class TestSimhashPackedLanes:
    """Round-5 q27 width experiment: 3 counters per BIGINT lane (20+1 agg
    columns) must produce BIT-IDENTICAL signatures to the 60-column form."""

    def test_packed_equals_unpacked_signatures(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        tf = (
            docs.select("doc_id", F.explode(dedup.words(F.col("text"))).alias("w"))
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).alias("tf"))
            .select("doc_id", "tf", dedup.h60(F.col("w")).alias("h"))
        )
        a = {
            r.doc_id: r.sim
            for r in dedup.simhash_signatures(tf, dedup.SIMHASH_BITS, packed=True).collect()
        }
        b = {
            r.doc_id: r.sim
            for r in dedup.simhash_signatures(tf, dedup.SIMHASH_BITS, packed=False).collect()
        }
        assert a == b and len(a) == docs.count()

    def test_tie_bit_set_like_signed_form(self, spark):
        # a doc whose word set makes 2*S_j == T exactly must set bit j (the
        # signed form's s_j >= 0 includes zero) in BOTH forms
        rows = [(1, "aa bb"), (2, "aa aa bb bb cc cc dd dd")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        tf = (
            df.select("doc_id", F.explode(dedup.words(F.col("text"))).alias("w"))
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).alias("tf"))
            .select("doc_id", "tf", dedup.h60(F.col("w")).alias("h"))
        )
        for packed in (True, False):
            sigs = {
                r.doc_id: r.sim
                for r in dedup.simhash_signatures(tf, dedup.SIMHASH_BITS, packed=packed).collect()
            }
            # independent recompute in python
            import collections

            for doc_id, text in rows:
                cnt = collections.Counter(text.split())
                t_total = sum(cnt.values())
                want = 0
                for j in range(dedup.SIMHASH_BITS):
                    s_j = sum(
                        c for w, c in cnt.items()
                        if (h60_py(w) >> j) & 1
                    )
                    if 2 * s_j >= t_total:
                        want |= 1 << j
                assert sigs[doc_id] == want, (packed, doc_id)


@pytest.mark.spark
class TestStreamingManifest:
    """Round-5 ingest-time manifest: watermark dedup + gates + pre-decided
    mixture, append-mode, row-for-row equal to its batch twin."""

    def _rows(self):
        base = [
            (
                i,
                f"s{i % 3}",
                " ".join(f"w{(i * 7 + j) % 23}" for j in range((i % 11) + 2))
                + (" john@example.com" if i % 13 == 0 else ""),
                f"2024-01-01 00:00:{i % 50:02d}",
            )
            for i in range(60)
        ]
        # re-ingestion duplicates: same doc, same text, later arrival —
        # must be dropped by the watermark dedup on BOTH sides
        dups = [(i, s, t, "2024-01-01 00:02:00") for (i, s, t, _) in base[:20]]
        return base, dups

    def test_row_for_row_vs_batch_twin(self, spark, tmp_path):
        import uuid

        from stream_reader_mzxml_spark.pipeline import curation, mixing

        base, dups = self._rows()
        schema = "doc_id BIGINT, source STRING, text STRING, event_time STRING"
        to_df = lambda rows: spark.createDataFrame(rows, schema).withColumn(
            "event_time", F.to_timestamp("event_time")
        )
        df_base, df_dups = to_df(base), to_df(dups)
        totals = (
            df_base.select("source", mixing._ws_tokens("text").alias("n"))
            .groupBy("source")
            .agg(F.sum("n").alias("src_tokens"))
        )

        src = str(tmp_path / "manifest_stream")
        # two files, written in arrival order: originals then re-ingestions
        df_base.coalesce(1).write.parquet(src)
        df_dups.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(
                "doc_id BIGINT, source STRING, text STRING, event_time TIMESTAMP"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"manifest_{uuid.uuid4().hex[:8]}"
        q = (
            curation.streaming_manifest(stream, totals)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(
            map(
                tuple,
                curation.ingest_manifest_batch(
                    df_base.unionByName(df_dups), totals
                ).collect(),
            )
        )
        assert got == exp
        # the dedup stage actually fired: 60 first-seen rows, not 80
        assert len(got) == 60
        # verdict variety: both kept and dropped rows exist at each stage
        sel = [r[-1] for r in got]
        gates = [r[7] for r in got]
        assert 0 < sum(sel) < len(sel)
        assert 0 < sum(gates) <= len(gates)

    def test_verdicts_match_mixture_operator(self, spark):
        # the inlined mixture decision must equal mixture_sample(totals=...)
        from stream_reader_mzxml_spark.pipeline import curation, mixing

        base, _ = self._rows()
        df = spark.createDataFrame(
            base, "doc_id BIGINT, source STRING, text STRING, event_time STRING"
        ).withColumn("event_time", F.to_timestamp("event_time"))
        totals = (
            df.select("source", mixing._ws_tokens("text").alias("n"))
            .groupBy("source")
            .agg(F.sum("n").alias("src_tokens"))
        )
        man = {
            r["doc_id"]: r["sampled"]
            for r in curation.ingest_manifest_batch(df, totals).collect()
        }
        mix = {
            r["doc_id"]: r["sampled"]
            for r in mixing.mixture_sample(df, totals=totals).collect()
        }
        assert man == mix


@pytest.mark.spark
class TestIvfArrowAssign:
    def test_arrow_assign_equals_expr(self, spark, sf_dir):
        # round-5 scale fix: numpy-matmul centroid assignment must produce
        # the SAME top-k rows as the expression-fold form (same tie-break:
        # cos desc, cid asc via stable argsort over cid-ascending columns)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = sorted(map(tuple, similarity.ivf_topk(emb, n_probes=5, k=10).collect()))
        b = sorted(
            map(
                tuple,
                similarity.ivf_topk(emb, n_probes=5, k=10, assign="arrow").collect(),
            )
        )
        assert a == b and len(a) > 0


@pytest.mark.spark
class TestLshProbeBits:
    def test_pb2_dominates_pb1(self, spark):
        # the ±2-bit probe set is a superset of the ±1-bit set, so per-rank
        # cosines can only improve and row counts can only grow
        rng = np.random.RandomState(9)
        vecs = rng.standard_normal((60, similarity.DIM)).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id INT, embedding ARRAY<FLOAT>",
        )
        pb1 = similarity.lsh_ann_topk(df, n_probes=3, k=5).collect()
        pb2 = similarity.lsh_ann_topk(df, n_probes=3, k=5, probe_bits=2).collect()
        for p in range(3):
            c1 = [r.cosine for r in sorted(pb1, key=lambda r: r.rank) if r.p_id == p]
            c2 = [r.cosine for r in sorted(pb2, key=lambda r: r.rank) if r.p_id == p]
            assert len(c2) >= len(c1)
            assert all(two >= one for two, one in zip(c2, c1))
        # matched bucket stays within hamming ≤ 2 of the probe's own bucket
        planes = similarity.hyperplanes()
        v = vecs.astype(np.float64)
        buckets = ((v @ planes.T) >= 0).astype(int) @ (1 << np.arange(similarity.N_PLANES))
        for r in pb2:
            assert bin(int(buckets[r.p_id]) ^ int(r.bucket)).count("1") <= 2


class TestAviCodec:
    """decode_avi goldens: hand-built RIFF/AVI raw-DIB payloads, no video
    library — the round-5 frame-sample path (q75)."""

    @staticmethod
    def _frames(d=7, nf=None, w=None, h=None):
        nf = nf or multimodal.VID_FIX_FRAMES
        w, h = w or multimodal.VID_FIX_W, h or multimodal.VID_FIX_H
        s = np.arange(w * h * 3, dtype=np.int64).reshape(h, w, 3)
        return np.stack([(d * 31 + f * 13 + s * 7) % 256 for f in range(nf)])

    def test_avi_roundtrip(self):
        frames = self._frames()
        out, fps = multimodal.decode_avi(multimodal.avi_encode(frames))
        assert fps == multimodal.VID_FIX_FPS
        assert out.shape == frames.shape
        assert (out == frames).all()

    def test_dib_raster_rules_are_real(self):
        # bottom-up + BGR + stride padding: w=6 rows are 18 bytes padded
        # to 20; first stored byte is the BLUE sample of the BOTTOM-LEFT px
        frame = self._frames(nf=1)[0]
        packed = multimodal._dib_pack(frame.astype(np.uint8))
        h, w = frame.shape[:2]
        assert len(packed) == 20 * h
        assert packed[0] == frame[h - 1, 0, 2]
        assert packed[18:20] == b"\x00\x00"  # row padding
        assert (multimodal._dib_unpack(packed, w, h) == frame).all()

    def test_top_down_dib_negative_height(self):
        # negative biHeight = rows stored top-down (no bottom-up flip):
        # the decoded raster must come back identical, not vertically
        # mirrored
        frames = self._frames(nf=2)
        buf = bytearray(multimodal.avi_encode(frames))
        i = buf.find(b"strf") + 8
        h = multimodal.VID_FIX_H
        # rewrite biHeight negative AND re-store each frame top-down
        buf[i + 8 : i + 12] = (-h).to_bytes(4, "little", signed=True)
        stride = multimodal._dib_stride(multimodal.VID_FIX_W)
        pos = 0
        for f in range(2):
            pos = buf.find(b"00db", pos) + 8
            flipped = np.frombuffer(
                bytes(buf[pos : pos + stride * h]), dtype=np.uint8
            ).reshape(h, stride)[::-1]
            buf[pos : pos + stride * h] = flipped.tobytes()
        out, _ = multimodal.decode_avi(bytes(buf))
        assert (out == frames).all()

    def test_compressed_avi_raises(self):
        buf = bytearray(multimodal.avi_encode(self._frames(nf=2)))
        i = buf.find(b"strf") + 8  # chunk body start
        buf[i + 16 : i + 20] = b"MJPG"  # biCompression
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            multimodal.decode_avi(bytes(buf))
        with pytest.raises(ValueError):
            multimodal.decode_avi(b"RIFFxxxxWAVE")

    def test_frame_sample_spark_matches_numpy(self, spark):
        docs = spark.range(0, 4).select(F.col("id").alias("doc_id"))
        media = multimodal.avi_fixture_media(docs, n=4)
        got = {
            (r.doc_id, r.frame_idx): r
            for r in multimodal.frame_sample(media, every_k=3).collect()
        }
        nf = multimodal.VID_FIX_FRAMES
        assert set(got) == {(d, f) for d in range(4) for f in range(0, nf, 3)}
        for (d, f), r in got.items():
            frames = self._frames(d=d)
            assert r.n_frames == nf
            assert (r.width, r.height) == (
                multimodal.VID_FIX_W, multimodal.VID_FIX_H,
            )
            exp = [
                round(float(frames[f, :, :, c].mean()), 6) for c in range(3)
            ]
            assert r.feature == exp

    def test_featurize_routes_raw_video(self, spark):
        pay = multimodal.avi_encode(self._frames(d=3))
        media = spark.createDataFrame(
            [(3, "video/x-msvideo", bytearray(pay), (len(pay), 0, 0))],
            multimodal.MEDIA_SCHEMA,
        )
        (row,) = multimodal.featurize(media, decode_stub=False).collect()
        assert row.feature == multimodal._avi_feature(pay)


class TestResize:
    """resize_raster / resize_images — the round-5 image-resize path (q74)."""

    def test_box_resize_is_block_mean(self):
        px = np.arange(16 * 8 * 3, dtype=np.float64).reshape(8, 16, 3)
        rz = multimodal.resize_raster(px, 8, 4, "box")
        assert rz.shape == (4, 8, 3)
        for y in range(4):
            for x in range(8):
                blk = px[2 * y : 2 * y + 2, 2 * x : 2 * x + 2]
                assert np.allclose(rz[y, x], blk.mean(axis=(0, 1)))

    def test_box_requires_integer_factors(self):
        px = np.zeros((8, 16, 3))
        with pytest.raises(ValueError, match="integer"):
            multimodal.resize_raster(px, 7, 4, "box")

    def test_nearest_arbitrary_geometry(self):
        px = np.arange(5 * 7 * 1, dtype=np.float64).reshape(5, 7, 1)
        rz = multimodal.resize_raster(px, 3, 2, "nearest")
        yi, xi = (np.arange(2) * 5) // 2, (np.arange(3) * 7) // 3
        assert (rz == px[yi][:, xi]).all()
        # identity: resize to same size returns the same raster
        assert (multimodal.resize_raster(px, 7, 5, "nearest") == px).all()

    def test_resize_images_spark_both_codecs(self, spark):
        # PNM and PNG payloads with the SAME value function resize to the
        # SAME stats — proving the decode → resize path is codec-agnostic
        docs = spark.range(0, 3).select(F.col("id").alias("doc_id"))
        pnm = multimodal.resize_images(
            multimodal.pnm_fixture_media(docs, n=3), 8, 4
        )
        png = multimodal.resize_images(
            multimodal.png_fixture_media(docs, n=3), 8, 4
        )
        a = {r.doc_id: (r.ch_mean, r.ch_wsum) for r in pnm.collect()}
        b = {r.doc_id: (r.ch_mean, r.ch_wsum) for r in png.collect()}
        assert a == b and len(a) == 3
        # wsum pins geometry: recompute doc 0 channel 0 by hand
        s = np.arange(16 * 8 * 3, dtype=np.int64)
        px = ((0 * 31 + s * 7) % 256).astype(np.float64).reshape(8, 16, 3)
        rz = multimodal.resize_raster(px, 8, 4, "box")
        wts = np.arange(1, 33, dtype=np.float64).reshape(4, 8)
        assert a[0][1][0] == round(float((rz[:, :, 0] * wts).sum()), 6)


class TestMultimodalStreaming:
    """Multimodal decode at INGEST time: frame_sample / resize_images are
    stateless mapInPandas projections, so they must run unchanged as
    streaming queries and emit the batch rows row-for-row — the shape a
    media-ingest pipeline uses (decode at arrival, features into the
    table, payload bytes never shuffled or retained)."""

    def _roundtrip(self, spark, tmp_path, op, tag):
        import uuid

        docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
        src = str(tmp_path / f"media_stream_{tag}")
        docs.repartition(4).write.parquet(src)
        stream_docs = (
            spark.readStream.schema("doc_id BIGINT")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"mm_{tag}_{uuid.uuid4().hex[:8]}"
        q = (
            op(stream_docs)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        exp = sorted(map(tuple, op(docs).collect()))
        assert got == exp and len(exp) > 0

    def test_frame_sample_streams_row_for_row(self, spark, tmp_path):
        op = lambda d: multimodal.frame_sample(
            multimodal.avi_fixture_media(d, n=8), every_k=3
        )
        self._roundtrip(spark, tmp_path, op, "avi")

    def test_resize_streams_row_for_row(self, spark, tmp_path):
        op = lambda d: multimodal.resize_images(
            multimodal.pnm_fixture_media(d, n=8), 8, 4
        )
        self._roundtrip(spark, tmp_path, op, "rz")
