"""The reference's flagship end-to-end analytic — ``CandidateIons``
(libCandidateIons.sc:100-193) — recomposed Spark-first over the driver's
``embeddings`` table.

Reference stages → graft stages:

1. MS1 scan + rt gate (libCandidateIons.sc:112-117)    → derived spectra
   table (rt, peak structs) in the scan's project.
2. noise filter ``intensity > noise`` (:121-123)       → relational filter
   on the exploded peak table.
3. precursor-list match (:125-131): spectrum rt within ``ion.rt ± window``
   AND ``|ion.m0 − mz| < tol``                         → theta-join against
   the BROADCAST ion list (the reference materializes the MS2-derived list
   fully in memory; broadcast is the faithful-and-scalable analog).
4. ``l.head.fragments`` (:137) — the FIRST matching ion in **list order**
   wins                                                → ``row_number()``
   over (spectrum, peak) ordered by ion index; rank 1. Stream-order
   tie-break, proven by a hand golden in tests.
5. isotope probes ``findClosestValueMz(mz+Δ1), (mz+Δ2)`` (:142-147;
   Spectrum.scala:39-41 ``minBy`` = first minimal in traversal order) →
   ordered ``F.aggregate`` fold over the FULL peak array (noise peaks
   included, exactly as the reference probes the unfiltered list) with a
   strict ``<`` comparator, which keeps the earlier element on ties —
   ``minBy`` semantics, bit-identical to the DuckDB ``list_reduce`` oracle.
6. double ppm gate (:146-152) and the four isotope-abundance band filters
   (:162-180, the C/S abundance envelope) → plain column predicates.
7. Ion record render (:180-190)                        → final select with
   rounded m/z columns + the ';'-joined fragment string (C10).

Scale: one explode (no shuffle), one broadcast theta-join, one window whose
key (vec_id, pos) is high-cardinality, one hash join back to the spectra
arrays for the few winners. No cartesian, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_reader_mzxml_spark.sources.readers import spread_scan

# re-scaled tolerances (reference values in comments; the graft's value
# density is ~10 units/σ vs the reference's ~0.01 m/z grid)
NOISE_INTENSITY = 100.0  # noiseIntensity
RT_WINDOW = 300.0        # ion rt ± window   (reference ±2 s, :128)
MZ_TOL = 0.5             # |ion.m0 − mz|     (reference 0.01, :129)
DELTA_MP0_MP1 = 1.0      # deltaMp0Mp1 (default, :108)
DELTA_MP0_MP2 = 1.996    # deltaMp0Mp2 (default, :109)
PPM_PRECISION = 10000.0  # isotope ppm gate (re-scaled)
BAND1_LO, BAND1_HI = 0.1, 3.0   # int1/int0 envelope (C-abundance analog)
BAND2_LO, BAND2_HI = 0.05, 5.0  # int2/int0 envelope (S-abundance analog)
N_IONS = 20
PEAK_DIM = 64


def ion_list() -> list[tuple[int, float, float, str]]:
    """The ``listPrecMz`` analog: a deterministic literal precursor-ion list
    (ion_id, rt0, m0, fragments). Small — the broadcast side.

    Ions ``p`` and ``p + N_IONS/2`` share m0 with rt windows offset by only
    50 s (heavily overlapping): real precursor lists carry the same compound
    at multiple retention times, and peaks in the overlap match BOTH ions —
    the case where the reference's ``l.head`` (:137) stream-order tie-break
    decides the answer."""
    out = []
    half = N_IONS // 2
    for p in range(N_IONS):
        family = p % half
        rt0 = float((family * 181) % 3600 + (p // half) * 50)
        m0 = 100.0 + ((family * 17) % 41) - 20.0
        fragments = ";".join(str(p * 3 + j) for j in (1, 2))
        out.append((p, rt0, m0, fragments))
    return out


def spectra_from_embeddings(emb: DataFrame, keep_embedding: bool = False) -> DataFrame:
    """Spectrum model over embeddings: rt = (vec_id·7) mod 3600; peak i has
    mz = 100 + component·10 and a portable arithmetic-hash intensity.

    ``keep_embedding=True`` carries the raw embedding column through the
    projection — for programs (q44) that derive BOTH the peak list and a
    second per-row structure from the same source row; keeping it row-local
    avoids a self-join (and therefore keeps those plans shuffle-free and
    streaming-safe)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    peaks = F.transform(
        F.sequence(F.lit(0), F.lit(PEAK_DIM - 1)),
        lambda j: F.struct(
            (F.lit(100.0) + F.element_at(v, (j + 1).cast("int")) * 10).alias("mz"),
            F.pmod((F.col("vec_id") * PEAK_DIM + j) * 37, F.lit(1000))
            .cast("double")
            .alias("intensity"),
        ),
    )
    cols = [
        F.col("vec_id"),
        F.pmod(F.col("vec_id") * 7, F.lit(3600)).cast("double").alias("rt"),
        peaks.alias("peaks"),
    ]
    if keep_embedding:
        cols.insert(1, F.col("embedding"))
    return emb.select(*cols)


def _nearest(peaks_col, d):
    """``findClosestValueMz`` (Spectrum.scala:39-41): first argmin of
    |peak.mz − d| in list order, as an ordered left fold."""
    return F.aggregate(
        peaks_col,
        F.element_at(peaks_col, 1),
        lambda acc, p: F.when(
            F.abs(p["mz"] - d) < F.abs(acc["mz"] - d), p
        ).otherwise(acc),
    )


def match_winners(spark, spectra: DataFrame) -> DataFrame:
    """Stages 2-4: noise filter → broadcast ion theta-join → head tie-break.
    Exposed separately so tests can pin the stream-order tie-break golden."""
    ions = spark.createDataFrame(
        ion_list(), "ion_id INT, rt0 DOUBLE, m0 DOUBLE, fragments STRING"
    )

    pk = spectra.select(
        "vec_id", "rt", F.posexplode("peaks").alias("j", "peak")
    ).select(
        "vec_id",
        "rt",
        (F.col("j") + 1).alias("pos"),
        F.col("peak.mz").alias("mz0"),
        F.col("peak.intensity").alias("int0"),
    ).filter(F.col("int0") > NOISE_INTENSITY)

    cand = pk.join(
        F.broadcast(ions),
        (F.col("rt") >= F.col("rt0") - RT_WINDOW)
        & (F.col("rt") <= F.col("rt0") + RT_WINDOW)
        & (F.abs(F.col("m0") - F.col("mz0")) < MZ_TOL),
    )
    # stage 4: head-of-list tie-break — first matching ion in list order
    w = Window.partitionBy("vec_id", "pos").orderBy("ion_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "rt", "pos", "mz0", "int0", "ion_id", "fragments")
    )


def _ion_array():
    """The ion list as an in-plan literal array<struct> (broadcast-free: the
    constants live inside the expression tree, like the reference's closed-over
    ``listPrecMz``)."""
    return F.array(
        *[
            F.struct(
                F.lit(p).alias("ion_id"),
                F.lit(rt0).alias("rt0"),
                F.lit(m0).alias("m0"),
                F.lit(frag).alias("fragments"),
            )
            for p, rt0, m0, frag in ion_list()
        ]
    )


def candidate_ions_fused(df_or_stream: DataFrame) -> DataFrame:
    """The SAME program as ``candidate_ions``, fused into a single stateless
    per-row projection — the shape of the reference itself, which runs the
    whole chain inside one per-spectrum closure (libCandidateIons.sc:119-191).

    Every stage is a JVM higher-order function over the row's own arrays:
    ion match + ``head`` = ``element_at(filter(ION_LITERALS, ...), 1)`` (F.filter
    preserves list order, so element 1 IS the stream-order head), isotope
    probes = ordered ``aggregate`` folds, gates = plain predicates, and only
    the surviving candidates are exploded at the end.

    Scale consequences: ZERO shuffles and no joins — the plan is
    scan → project → generate, trivially parallel at any cluster size, and
    because it is stateless it runs unchanged on a STREAMING DataFrame (no
    watermark needed). The relational form (``candidate_ions``) remains the
    reference plan the oracle checks both against; equality is enforced by
    q39 sharing q35's oracle and by ``test_fused_equals_relational``."""
    spectra = spectra_from_embeddings(df_or_stream)
    ions = _ion_array()
    d0 = lambda mz: mz + F.lit(DELTA_MP0_MP1)  # noqa: E731
    d1 = lambda mz: mz + F.lit(DELTA_MP0_MP2)  # noqa: E731

    def nearest(d):
        return F.aggregate(
            F.col("peaks"),
            F.element_at(F.col("peaks"), 1),
            lambda acc, p: F.when(
                F.abs(p["mz"] - d) < F.abs(acc["mz"] - d), p
            ).otherwise(acc),
        )

    def ion_match(peak):
        # try_element_at: NULL (no match) instead of an error on empty lists
        return F.try_element_at(
            F.filter(
                ions,
                lambda ion: (F.col("rt") >= ion["rt0"] - F.lit(RT_WINDOW))
                & (F.col("rt") <= ion["rt0"] + F.lit(RT_WINDOW))
                & (F.abs(ion["m0"] - peak["mz"]) < F.lit(MZ_TOL)),
            ),
            F.lit(1),
        )

    idx = F.sequence(F.lit(1), F.lit(PEAK_DIM))
    cands = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(F.col("peaks"), i.cast("int")).alias("peak"),
            ion_match(F.element_at(F.col("peaks"), i.cast("int"))).alias("ion"),
        ),
    )
    kept = F.filter(
        cands,
        lambda c: (c["peak"]["intensity"] > F.lit(NOISE_INTENSITY))
        & c["ion"].isNotNull(),
    )
    probed = F.transform(
        kept,
        lambda c: F.struct(
            c["pos"].alias("pos"),
            c["peak"].alias("peak"),
            c["ion"].alias("ion"),
            nearest(d0(c["peak"]["mz"])).alias("near1"),
            nearest(d1(c["peak"]["mz"])).alias("near2"),
        ),
    )

    def passes(c):
        mz0, int0 = c["peak"]["mz"], c["peak"]["intensity"]
        ppm0 = F.abs((c["near1"]["mz"] - d0(mz0)) / d0(mz0)) * 1e6
        ppm1 = F.abs((c["near2"]["mz"] - d1(mz0)) / d1(mz0)) * 1e6
        return (
            (ppm0 < F.lit(PPM_PRECISION))
            & (ppm1 < F.lit(PPM_PRECISION))
            & (c["near1"]["intensity"] >= int0 * F.lit(BAND1_LO))
            & (c["near1"]["intensity"] < int0 * F.lit(BAND1_HI))
            & (c["near2"]["intensity"] >= int0 * F.lit(BAND2_LO))
            & (c["near2"]["intensity"] < int0 * F.lit(BAND2_HI))
        )

    out = spectra.select(
        "vec_id", "rt", F.explode(F.filter(probed, passes)).alias("c")
    )
    return out.select(
        F.col("vec_id").alias("num"),
        "rt",
        F.col("c.pos").alias("pos"),
        F.round(F.col("c.peak.mz"), 6).alias("mz0"),
        F.col("c.peak.intensity").alias("int0"),
        F.round(F.col("c.near1.mz"), 6).alias("mz1"),
        F.col("c.near1.intensity").alias("int1"),
        F.round(F.col("c.near2.mz"), 6).alias("mz2"),
        F.col("c.near2.intensity").alias("int2"),
        F.col("c.ion.ion_id").alias("ion_id"),
        F.col("c.ion.fragments").alias("fragments"),
    )


def candidate_ions(spark, emb: DataFrame, spread: bool = False) -> DataFrame:
    """The end-to-end program; returns the rendered Ion rows.

    ``spread`` — see :func:`sources.readers.spread_scan`. Default False:
    measured on the single-file local table, the peaks projection is cheap
    enough that the round-robin exchange costs more than it parallelizes
    (3.2s vs 5.4s at sf0.1 once the codegen cache is sized); the flag stays
    for corpora whose per-row probe work dominates."""
    spectra = spectra_from_embeddings(spread_scan(emb, spread))
    winners = match_winners(spark, spectra)

    # stage 5: isotope probes over the FULL peak array (noise included)
    probed = winners.join(spectra.select("vec_id", "peaks"), ["vec_id"])
    d0 = F.col("mz0") + F.lit(DELTA_MP0_MP1)
    d1 = F.col("mz0") + F.lit(DELTA_MP0_MP2)
    probed = (
        probed.withColumn("near1", _nearest(F.col("peaks"), d0))
        .withColumn("near2", _nearest(F.col("peaks"), d1))
        .select(
            "vec_id", "rt", "pos", "mz0", "int0", "ion_id", "fragments",
            F.col("near1.mz").alias("mz1"),
            F.col("near1.intensity").alias("int1"),
            F.col("near2.mz").alias("mz2"),
            F.col("near2.intensity").alias("int2"),
        )
    )

    ppm0 = F.abs((F.col("mz1") - d0) / d0) * 1e6
    ppm1 = F.abs((F.col("mz2") - d1) / d1) * 1e6
    out = probed.filter(
        (ppm0 < PPM_PRECISION)
        & (ppm1 < PPM_PRECISION)
        & (F.col("int1") >= F.col("int0") * BAND1_LO)
        & (F.col("int1") < F.col("int0") * BAND1_HI)
        & (F.col("int2") >= F.col("int0") * BAND2_LO)
        & (F.col("int2") < F.col("int0") * BAND2_HI)
    )
    return out.select(
        F.col("vec_id").alias("num"),
        "rt",
        "pos",
        F.round("mz0", 6).alias("mz0"),
        "int0",
        F.round("mz1", 6).alias("mz1"),
        "int1",
        F.round("mz2", 6).alias("mz2"),
        "int2",
        "ion_id",
        "fragments",
    )


# ---------------------------------------------------------------------------
# MainGlucosinolates over REAL variable-length spectra (round 5)
# ---------------------------------------------------------------------------


def glucosinolate_candidates(
    spectra: DataFrame,
    min_intensity: float = 7500.0,
    delta_mp0_mp2: float = 1.9958,
    precision_mz: float = 0.0001,
    carbon_min: float = 3.0,
    carbon_max: float = 35.0,
    sulfur_min: float = 1.5,
    sulfur_max: float = 5.0,
) -> DataFrame:
    """``MainGlucosinolates.processSpectrum`` (:163-191) at the REFERENCE
    defaults, over a spectra frame with VARIABLE-length peak arrays.

    Unlike q45 (which runs a re-scaled variant on the fixed-width synthetic
    spectra), this is the program verbatim: candidate peaks are those above
    ``minIntensity`` (:165); each probes the FULL unfiltered peak list for
    the nearest m/z to mz0+1.0 and mz0+deltaMp0Mp2 (:168-169,
    Spectrum.scala:39-41 ``minBy`` = first argmin); the M2-offset gate
    (:173) and the C/S abundance envelope (:181-191) keep the survivors,
    emitted as (rt, M0, M1, M2) rows sorted by −M0_mz (:133).

    Input: ``(num, rt, peaks array<struct<mz,intensity>>)`` — e.g. the real
    mzXML ingest (``sources.mzxml``) with
    ``arrays_zip(mz, intensity)``-formed peaks. All expression-level: one
    scan projection + one explode, no shuffle before the final sort.
    """
    from stream_reader_mzxml_spark.functions.chem import ABUNDANCE_ISOTOPE

    ab_c1 = ABUNDANCE_ISOTOPE["C"][1]
    ab_s2 = ABUNDANCE_ISOTOPE["S"][2]
    peaks = F.col("peaks")
    kept = F.filter(peaks, lambda p: p["intensity"] > F.lit(min_intensity))

    def nearest(d):
        return F.aggregate(
            peaks,
            F.element_at(peaks, 1),
            lambda acc, p: F.when(
                F.abs(p["mz"] - d) < F.abs(acc["mz"] - d), p
            ).otherwise(acc),
        )

    probed = F.transform(
        kept,
        lambda x: F.struct(
            x.alias("p0"),
            nearest(x["mz"] + F.lit(1.0)).alias("p1"),
            nearest(x["mz"] + F.lit(delta_mp0_mp2)).alias("p2"),
        ),
    )

    def passes(t):
        mz0, int0 = t["p0"]["mz"], t["p0"]["intensity"]
        int1, int2 = t["p1"]["intensity"], t["p2"]["intensity"]
        return (
            (F.abs(t["p2"]["mz"] - mz0 - F.lit(delta_mp0_mp2)) < F.lit(precision_mz))
            & (int1 >= int0 * F.lit(ab_c1 * carbon_min))
            & (int1 < int0 * F.lit(ab_c1 * carbon_max))
            & (int2 >= int0 * F.lit(ab_s2 * sulfur_min))
            & (int2 < int0 * F.lit(ab_s2 * sulfur_max))
        )

    return (
        spectra.select(
            F.col("rt").cast("double").alias("rt"),
            F.explode(F.filter(probed, passes)).alias("t"),
        )
        .select(
            "rt",
            F.col("t.p0.mz").alias("m0_mz"),
            F.col("t.p0.intensity").alias("m0_intensity"),
            F.col("t.p1.mz").alias("m1_mz"),
            F.col("t.p1.intensity").alias("m1_intensity"),
            F.col("t.p2.mz").alias("m2_mz"),
            F.col("t.p2.intensity").alias("m2_intensity"),
        )
        .orderBy(F.col("m0_mz").desc())
    )
