"""LD r² pairs (operators/ld.py, new r10): planted-genotype semantics.
Value parity vs DuckDB at sf0.001/0.01 is covered by the registry sweep
(seq_ld_pairs); these pin the math and the pairing rules."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqarray_spark.operators.ld import ld_pairs  # noqa: E402


def _mk(spark, calls):
    variants = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 200), (3, "1", 10_000), (4, "2", 150)],
        "variant_id long, chromosome string, position int",
    )
    cdf = spark.createDataFrame(
        [(v, s, a) for v, s, a in calls],
        "variant_id long, sample_id string, alleles array<int>",
    )
    return variants, cdf


def test_ld_perfect_and_anti_correlation(spark):
    # v1 == v2 dosage-wise (r2=1); v3 out of the 5kb window from v2's 200
    # (9800 > 5000) but inside from... nothing; v4 on another chromosome
    calls = []
    for i, d in enumerate([0, 1, 2, 0, 2]):
        al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
        inv = [0, 0] if d == 2 else ([0, 1] if d == 1 else [1, 1])
        calls += [(1, f"S{i}", al), (2, f"S{i}", inv), (3, f"S{i}", al), (4, f"S{i}", al)]
    v, c = _mk(spark, calls)
    out = {(r["va"], r["vb"]): r for r in ld_pairs(v, c, bp_window=5000).collect()}
    assert set(out) == {(1, 2)}  # v3 beyond window, v4 other chromosome
    r = out[(1, 2)]
    assert r["n_used"] == 5
    # anti-correlated dosage still has r^2 == 1
    assert math.isclose(r["r2"], 1.0)


def test_ld_monomorphic_null_and_missing_excluded(spark):
    calls = [
        (1, "S0", [0, 1]), (1, "S1", [1, 1]), (1, "S2", [0, 0]),
        (2, "S0", [0, 0]), (2, "S1", [0, 0]), (2, "S2", [0, 0]),  # monomorphic
        (1, "S3", [None, 1]), (2, "S3", [0, 1]),  # v1 missing at S3
    ]
    v, c = _mk(spark, calls)
    out = {(r["va"], r["vb"]): r for r in ld_pairs(v, c, bp_window=5000).collect()}
    r = out[(1, 2)]
    assert r["n_used"] == 3  # S3's half-missing call drops the sample
    assert r["r2"] is None  # zero variance on v2


def test_ld_duplicate_observations_min_rule(spark):
    # duplicate (variant, sample) observations collapse to MIN(dosage)
    calls = [
        (1, "S0", [1, 1]), (1, "S0", [0, 0]),   # -> 0
        (1, "S1", [0, 1]),
        (2, "S0", [0, 0]), (2, "S1", [0, 1]),
    ]
    v, c = _mk(spark, calls)
    out = {(r["va"], r["vb"]): r for r in ld_pairs(v, c, bp_window=5000).collect()}
    r = out[(1, 2)]
    assert r["n_used"] == 2
    # v1 collapses to (0, 1); v2 is (0, 1): identical -> r2 == 1
    assert math.isclose(r["r2"], 1.0)


def test_ld_plan_is_binned_equijoin_not_cross(spark):
    from seqarray_spark.plans import explain as E

    calls = [(1, "S0", [0, 1]), (2, "S0", [1, 1]), (3, "S0", [0, 0]), (4, "S0", [0, 1])]
    v, c = _mk(spark, calls)
    plan = E.plan_string(ld_pairs(v, c, bp_window=5000), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ld_prune_drops_dominated_later_variant(spark):
    from seqarray_spark.operators.ld import ld_prune

    # v1 at 100 and v2 at 200 perfectly correlated -> the LATER (v2)
    # drops; v4 (other chromosome) and v3 (out of window) stay
    calls = []
    for i, d in enumerate([0, 1, 2, 0, 2]):
        al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
        calls += [(1, f"S{i}", al), (2, f"S{i}", al), (3, f"S{i}", al), (4, f"S{i}", al)]
    v, c = _mk(spark, calls)
    kept = {r["variant_id"] for r in ld_prune(v, c, bp_window=5000, tau=0.3).collect()}
    assert kept == {1, 3, 4}


def test_grm_pairs_planted(spark):
    """GRM semantics on a planted trio: identical samples get a high
    positive estimate, the unrelated one a negative/low estimate;
    monomorphic variants are excluded from m_used."""
    from seqarray_spark.operators.ld import grm_pairs

    rows = []
    # 6 polymorphic variants; S0 == S1; S2 complements
    doses = [(0, 0, 2), (2, 2, 0), (1, 1, 1), (0, 0, 2), (2, 2, 0), (1, 1, 2)]
    for vid, (d0, d1, d2) in enumerate(doses, start=1):
        for s, d in (("S0", d0), ("S1", d1), ("S2", d2)):
            al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
            rows.append((vid, s, al))
    # one monomorphic variant — must not count toward m_used
    rows += [(99, "S0", [0, 0]), (99, "S1", [0, 0]), (99, "S2", [0, 0])]
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    out = {(r["sample_i"], r["sample_j"]): r for r in grm_pairs(calls).collect()}
    assert set(out) == {("S0", "S1"), ("S0", "S2"), ("S1", "S2")}
    assert out[("S0", "S1")]["m_used"] == 6
    assert out[("S0", "S1")]["grm"] > 0.5
    assert out[("S0", "S2")]["grm"] < out[("S0", "S1")]["grm"]


def test_grm_blas_matches_relation_form(spark):
    """grm_pairs_blas (blocked matmul) must reproduce grm_pairs up to
    the relation form's 1e-6 quantization grid (sf0.001 gcalls: 100
    samples, 200 variants, real missingness + duplicate observations)."""
    import numpy as np

    from seqarray_spark.operators.ld import grm_pairs, grm_pairs_blas
    from seqarray_spark.sources import testdata as td

    c = td.gcalls(spark, "/root/testdata/sf0.001")
    a = grm_pairs(c).toPandas().set_index(["sample_i", "sample_j"]).sort_index()
    b = (
        grm_pairs_blas(c, blocks=4)
        .toPandas()
        .set_index(["sample_i", "sample_j"])
        .sort_index()
    )
    assert (a.index == b.index).all()
    assert (a["m_used"] == b["m_used"]).all()
    assert np.abs(a["grm"] - b["grm"]).max() < 2e-6


def _packed_frame(spark, codes, sids):
    import numpy as np

    V, S = codes.shape
    stride = (S + 3) // 4
    rows = []
    for v in range(V):
        padded = np.concatenate([codes[v], np.full(stride * 4 - S, 3, np.uint8)])
        b = bytearray(stride)
        for k in range(stride * 4):
            b[k // 4] |= int(padded[k]) << (2 * (k % 4))
        rows.append((v, S, bytes(b)))
    return spark.createDataFrame(rows, "variant_id long, n_samples int, packed binary")


def test_grm_from_packed_matches_blas(spark):
    """Packed-column GRM == long-format blas GRM on data where the
    2-bit dosage semantics coincide (full-missing-only): float64 to
    ~1e-15, float32 within 1e-4 (the documented fast-mode contract)."""
    import numpy as np

    from seqarray_spark.operators.ld import grm_from_packed, grm_pairs_blas

    rng = np.random.default_rng(7)
    V, S = 300, 40
    codes = rng.integers(0, 3, size=(V, S)).astype(np.uint8)
    codes[rng.random((V, S)) < 0.07] = 3
    sids = [f"S{i:03d}" for i in range(S)]
    packed = _packed_frame(spark, codes, sids)
    rows = []
    for v in range(V):
        for s in range(S):
            c = int(codes[v, s])
            al = (
                None
                if c == 3
                else ([0, 0] if c == 0 else ([0, 1] if c == 1 else [1, 1]))
            )
            rows.append((v, sids[s], al))
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    a = (
        grm_pairs_blas(calls, blocks=4, assume_unique=True)
        .toPandas()
        .set_index(["sample_i", "sample_j"])
        .sort_index()
    )
    for dt, tol in [("float64", 1e-9), ("float32", 1e-4)]:
        b = (
            grm_from_packed(packed, sids, dtype=dt)
            .toPandas()
            .set_index(["sample_i", "sample_j"])
            .sort_index()
        )
        assert (a.index == b.index).all()
        assert (a["m_used"] == b["m_used"]).all()
        assert np.abs(a["grm"] - b["grm"]).max() < tol


def test_grm_from_packed_guards(spark):
    import numpy as np
    import pytest

    from seqarray_spark.operators.ld import grm_from_packed

    codes = np.zeros((4, 8), dtype=np.uint8)
    packed = _packed_frame(spark, codes, [f"S{i}" for i in range(8)])
    with pytest.raises(ValueError, match="float32 or float64"):
        grm_from_packed(packed, [f"S{i}" for i in range(8)], dtype="int8")
    with pytest.raises(ValueError, match=">= 2 samples"):
        grm_from_packed(packed, ["S0"])
    # n_samples mismatch surfaces as a kernel error
    with pytest.raises(Exception, match="n_samples"):
        grm_from_packed(packed, [f"S{i}" for i in range(12)]).collect()


def test_ld_pairs_from_packed_bit_identical(spark):
    """Packed-column LD == relation-form ld_pairs BIT-FOR-BIT on data
    where the dosage semantics coincide (full-missing-only): both
    pipelines are exact-int64 sums ending in the identical float ops."""
    import numpy as np

    from seqarray_spark.operators.ld import ld_pairs, ld_pairs_from_packed

    rng = np.random.default_rng(11)
    V, S = 400, 30
    codes = rng.integers(0, 3, size=(V, S)).astype(np.uint8)
    codes[rng.random((V, S)) < 0.1] = 3
    sids = [f"S{i:02d}" for i in range(S)]
    packed = _packed_frame(spark, codes, sids)
    vrows, crows = [], []
    for v in range(V):
        vrows.append((v, str(1 + v % 3), 100 + (v // 3) * 997))
        for s in range(S):
            c = int(codes[v, s])
            al = (
                None
                if c == 3
                else ([0, 0] if c == 0 else ([0, 1] if c == 1 else [1, 1]))
            )
            crows.append((v, sids[s], al))
    variants = spark.createDataFrame(
        vrows, "variant_id long, chromosome string, position int"
    )
    calls = spark.createDataFrame(
        crows, "variant_id long, sample_id string, alleles array<int>"
    )
    a = ld_pairs(variants, calls, bp_window=5000).toPandas()
    b = ld_pairs_from_packed(packed, variants, bp_window=5000).toPandas()
    a = a.set_index(["va", "vb"]).sort_index()
    b = b.set_index(["va", "vb"]).sort_index()
    assert len(a) == len(b) and set(a.index) == set(b.index)
    assert (a["n_used"] == b["n_used"]).all()
    am, bm = a["r2"].isna(), b["r2"].isna()
    assert (am == bm).all()
    assert (a["r2"][~am] == b["r2"][~bm]).all()  # bit-identical


def test_ibs_from_packed_planted(spark):
    """IBS semantics: identical rows -> 1.0; one allele apart -> 0.75
    mean on half the variants; opposite homozygotes -> 0.0; missing
    cells drop from m_used."""
    import math

    import numpy as np

    from seqarray_spark.operators.ld import ibs_from_packed

    sids = ["S0", "S1", "S2", "S3"]
    # variants x samples codes: S0 == S1; S2 opposite-homozygote of S0;
    # S3 = one allele apart from S0 everywhere; last variant missing on S3
    codes = np.array(
        [
            [0, 0, 2, 1],
            [2, 2, 0, 1],
            [0, 0, 2, 1],
            [2, 2, 0, 3],
        ],
        dtype=np.uint8,
    )
    packed = _packed_frame(spark, codes, sids)
    out = {
        (r["sample_i"], r["sample_j"]): r
        for r in ibs_from_packed(packed, sids).collect()
    }
    assert out[("S0", "S1")]["m_used"] == 4
    assert out[("S0", "S1")]["ibs"] == 1.0
    assert out[("S0", "S2")]["ibs"] == 0.0
    r = out[("S0", "S3")]
    assert r["m_used"] == 3  # the missing cell drops
    assert math.isclose(r["ibs"], (2 * 3 - 3) / (2 * 3))  # |d|=1 each -> 0.5


def test_ld_prune_accepts_precomputed_pairs(spark):
    from seqarray_spark.operators.ld import ld_pairs, ld_prune

    calls = []
    for i, d in enumerate([0, 1, 2, 0, 2]):
        al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
        calls += [(1, f"S{i}", al), (2, f"S{i}", al), (3, f"S{i}", al), (4, f"S{i}", al)]
    v, c = _mk(spark, calls)
    pre = ld_pairs(v, c, bp_window=5000)
    a = sorted(r["variant_id"] for r in ld_prune(v, c, bp_window=5000, tau=0.3).collect())
    b = sorted(r["variant_id"] for r in ld_prune(v, None, tau=0.3, pairs=pre).collect())
    assert a == b == [1, 3, 4]
    import pytest

    with pytest.raises(ValueError, match="calls= or pairs="):
        ld_prune(v, None)


def test_grm_pca_separates_planted_populations(spark):
    """Two planted populations (distinct allele-frequency profiles)
    must separate on PC1, and eigenvector sign is deterministic."""
    import numpy as np

    from seqarray_spark.operators.ld import grm_from_packed, grm_pca

    rng = np.random.default_rng(3)
    V, S = 500, 30
    pops = np.array([0] * 15 + [1] * 15)
    codes = np.empty((V, S), dtype=np.uint8)
    for v in range(V):
        p = (0.1, 0.9) if v % 2 == 0 else (0.9, 0.1)
        for s in range(S):
            maf = p[pops[s]]
            codes[v, s] = (rng.random() < maf) + (rng.random() < maf)
    sids = [f"S{i:02d}" for i in range(S)]
    grm = grm_from_packed(_packed_frame(spark, codes, sids), sids)
    out = {r["sample_id"]: r["pc"] for r in grm_pca(grm, k=2).collect()}
    pc1 = np.array([out[s][0] for s in sids])
    g0, g1 = pc1[pops == 0], pc1[pops == 1]
    # the two populations occupy disjoint PC1 ranges
    assert max(g0.max(), g1.max()) > 0 and (g0.max() < g1.min() or g1.max() < g0.min())
    # determinism across two runs
    out2 = {r["sample_id"]: r["pc"] for r in grm_pca(grm, k=2).collect()}
    assert out == out2


def test_king_from_packed_planted_relationships(spark):
    """KING-robust semantics: duplicate samples -> phi == 0.5 on het
    sites (hh == het counts, no opposite homozygotes); unrelated
    opposite-profile samples -> strongly negative; all-homozygous pair
    -> NULL (denominator 0)."""
    import numpy as np

    from seqarray_spark.operators.ld import king_from_packed

    sids = ["DUP1", "DUP2", "HOMA", "HOMB", "OPP"]
    # 6 variants: DUP1 == DUP2 (mixed het/hom); OPP = opposite
    # homozygote on DUP1's het sites; HOMA/HOMB all-homozygous
    codes = np.array(
        [
            [1, 1, 0, 2, 1],
            [0, 0, 0, 0, 2],
            [1, 1, 2, 0, 1],
            [2, 2, 0, 2, 0],
            [1, 1, 0, 0, 1],
            [0, 0, 2, 2, 2],
        ],
        dtype=np.uint8,
    )
    packed = _packed_frame(spark, codes, sids)
    out = {
        (r["sample_i"], r["sample_j"]): r
        for r in king_from_packed(packed, sids).collect()
    }
    dup = out[("DUP1", "DUP2")]
    # identical: hh = 3 het sites, opp = 0, het_i + het_j = 6 -> 0.5
    assert dup["kinship"] == 0.5
    # DUP1 vs OPP: het-mirroring at 3 sites (hh = 3), opposite
    # homozygotes at the other 3 (opp = 3), het sums 3 + 3
    # -> (3 - 6) / 6 = -0.5
    assert out[("DUP1", "OPP")]["kinship"] == -0.5
    # two all-homozygous samples: zero het on both sides -> NULL
    assert out[("HOMA", "HOMB")]["kinship"] is None
    assert out[("HOMA", "HOMB")]["m_used"] == 6


def _planted_grm(spark, seed=5, n=40, lam_top=(12.0, 6.0, 3.0)):
    """Synthetic GRM pair relation G = Q diag(lam) Q^T with a
    well-separated top spectrum (so the randomized path is expected to
    agree with the exact eigensolve to tight tolerance)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.concatenate([list(lam_top), np.linspace(0.4, 0.1, n - len(lam_top))])
    g = (q * lam) @ q.T
    ids = [f"S{i:02d}" for i in range(n)]
    rows = [
        (ids[i], ids[j], 100, float(g[i, j]))
        for i in range(n)
        for j in range(i + 1, n)
    ]
    grm = spark.createDataFrame(
        rows, "sample_i string, sample_j string, m_used int, grm double"
    )
    return grm, g, ids


def test_grm_pca_block_assembly_matches_numpy(spark):
    """The blocked-Arrow assembly (r11: no per-pair Row objects) must
    reproduce the direct numpy eigensolve exactly — same matrix, same
    eigh, same sign rule — including with a block size smaller than n
    (multiple tiles per axis)."""
    import numpy as np

    from seqarray_spark.operators.ld import _fix_signs, grm_pca

    grm, g, ids = _planted_grm(spark, n=25)
    a = g.copy()
    np.fill_diagonal(a, 1.0)
    vals, vecs = np.linalg.eigh(a)
    order = np.argsort(vals)[::-1][:3]
    want = _fix_signs(vecs[:, order])
    got = np.array(
        [r["pc"] for r in grm_pca(grm, k=3, block=8).orderBy("sample_id").collect()]
    )
    assert np.allclose(got, want, atol=1e-12)


def test_grm_pca_sample_ids_keeps_isolated_samples(spark):
    """ADVICE r10: a sample with no surviving pair silently vanishes
    unless the cohort list is passed; with sample_ids= it appears (its
    row is diag-only, so its loading is whatever the eigensolve gives a
    decoupled coordinate — presence is the contract)."""
    from seqarray_spark.operators.ld import grm_pca

    grm, _, ids = _planted_grm(spark, n=10)
    out_derived = grm_pca(grm, k=2)
    assert out_derived.count() == 10
    out_pinned = grm_pca(grm, k=2, sample_ids=ids + ["ZZ_ISOLATED"])
    assert out_pinned.count() == 11
    assert out_pinned.where("sample_id = 'ZZ_ISOLATED'").count() == 1
    try:
        grm_pca(grm, k=2, sample_ids=ids + [ids[0]])
        raise AssertionError("duplicate sample_ids must raise")
    except ValueError:
        pass


def test_grm_pca_distributed_matches_exact(spark):
    """The randomized range-finder path (never assembles G) agrees with
    the exact eigensolve on a separated spectrum, and is deterministic
    (seeded Omega)."""
    import numpy as np

    from seqarray_spark.operators.ld import grm_pca, grm_pca_distributed

    grm, _, ids = _planted_grm(spark, n=40)
    exact = np.array(
        [r["pc"] for r in grm_pca(grm, k=3).orderBy("sample_id").collect()]
    )
    sk = np.array(
        [
            r["pc"]
            for r in grm_pca_distributed(grm, k=3, power_iters=6)
            .orderBy("sample_id")
            .collect()
        ]
    )
    assert np.allclose(sk, exact, atol=1e-3)
    sk2 = np.array(
        [
            r["pc"]
            for r in grm_pca_distributed(grm, k=3, power_iters=6)
            .orderBy("sample_id")
            .collect()
        ]
    )
    assert np.array_equal(sk, sk2)


def test_grm_sketch_y_matches_matmul_kernel(spark):
    """grm_sketch_y (the oracle-checkable DataFrame form of ONE
    range-finder pass) agrees with the _grm_matmul kernel
    grm_pca_distributed actually iterates, on the same Rademacher
    Omega — the gate-the-replayable-form / ship-the-fast-form pairing
    (grm_pairs vs grm_pairs_blas precedent). Tolerance is the sketch
    form's documented 1e-9 unit grid."""
    import hashlib

    import numpy as np

    from seqarray_spark.operators.ld import (
        _grm_matmul,
        _grm_pair_positions,
        grm_sketch_y,
    )

    grm, _, ids = _planted_grm(spark, n=15)
    n_cols = 4
    omega = np.array(
        [
            [
                1.0
                if hashlib.md5(f"{s}:{c}".encode()).hexdigest()[0] in "02468ace"
                else -1.0
                for c in range(n_cols)
            ]
            for s in ids
        ]
    )
    pairs = _grm_pair_positions(grm, ids)
    want = _grm_matmul(pairs, len(ids), omega, diag=1.0)
    got_rows = {
        r["sample_id"]: [r[f"y_{c}"] for c in range(n_cols)]
        for r in grm_sketch_y(grm, n_cols=n_cols, diag=1.0).collect()
    }
    got = np.array([got_rows[s] for s in ids])
    assert np.allclose(got, want, atol=1e-6)


def test_packed_stack_on_reference_container(spark):
    """VERDICT r10 item 5: the r10 packed pair kernels compose with the
    r8/r9 GDS container reader on the reference's own released bytes —
    1KG chr22 fixture (inst/extdata/1KG_phase1_release_v3_chr22.gds) ->
    from_gds -> pack_2bit_genotypes -> grm_from_packed /
    king_from_packed, with the GRM cross-checked against the
    long-format relation twin on the SAME container data and KING
    against a direct numpy replay of the Manichaikul estimator."""
    import os

    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    KG = "/root/reference/inst/extdata/1KG_phase1_release_v3_chr22.gds"
    if not os.path.exists(KG):
        pytest.skip("reference fixtures not available")

    from seqarray_spark.operators.ld import (
        grm_from_packed,
        grm_pairs_blas,
        king_from_packed,
    )
    from seqarray_spark.sources.gds_spark import from_gds
    from seqarray_spark.sources.packed import pack_2bit_genotypes

    probe = from_gds(spark, KG, block_variants=2048)
    sids = [
        r["sample_id"]
        for r in probe.samples.orderBy("sample_ordinal").limit(12).collect()
    ]
    ds = from_gds(spark, KG, block_variants=2048, samples=sids)
    ds.set_filter_variant(F.col("variant_id") <= 800)
    packed = pack_2bit_genotypes(ds, sorted(sids))

    # GRM: packed kernel vs the long-format twin on identical data
    a = (
        grm_pairs_blas(ds.calls, blocks=4, assume_unique=True)
        .toPandas()
        .set_index(["sample_i", "sample_j"])
        .sort_index()
    )
    b = (
        grm_from_packed(packed, sorted(sids))
        .toPandas()
        .set_index(["sample_i", "sample_j"])
        .sort_index()
    )
    assert len(b) == 12 * 11 // 2 and (a.index == b.index).all()
    assert (a["m_used"] == b["m_used"]).all()
    assert np.abs(a["grm"] - b["grm"]).max() < 1e-9

    # KING: packed kernel vs a direct numpy replay from the same calls
    dose = {
        (r["variant_id"], r["sample_id"]): r["d"]
        for r in ds.calls.select(
            "variant_id",
            "sample_id",
            F.expr(
                "CASE WHEN alleles IS NULL OR size(filter(alleles, x -> x IS NULL)) > 0 "
                "THEN 3 ELSE size(filter(alleles, x -> x > 0)) END"
            ).alias("d"),
        ).collect()
    }
    vids = sorted({v for v, _ in dose})
    ss = sorted(sids)
    mat = np.array(
        [[dose.get((v, s), 3) for s in ss] for v in vids], dtype=np.int64
    )
    got = {
        (r["sample_i"], r["sample_j"]): (r["m_used"], r["kinship"])
        for r in king_from_packed(packed, ss).collect()
    }
    assert len(got) == 12 * 11 // 2
    for i in range(len(ss)):
        for j in range(i + 1, len(ss)):
            di, dj = mat[:, i], mat[:, j]
            both = (di != 3) & (dj != 3)
            hh = int(((di == 1) & (dj == 1) & both).sum())
            opp = int((((di == 0) & (dj == 2)) | ((di == 2) & (dj == 0)))[both].sum())
            het = int((di[both] == 1).sum()) + int((dj[both] == 1).sum())
            m_used, phi = got[(ss[i], ss[j])]
            assert m_used == int(both.sum())
            if het == 0:
                assert phi is None
            else:
                want = (hh - 2.0 * opp) / het
                assert abs(phi - want) < 1e-12


def test_ld_prune_greedy_vs_dominated(spark):
    """The r11 greedy mode replays SNPRelate's kept-set semantics: on
    the chain A—B—C (r2(A,B) and r2(B,C) > tau, r2(A,C) <= tau) greedy
    KEEPS C because its only strong correlate B was itself dropped,
    while the dominated rule drops both B and C (kept_dominated ⊆
    kept_greedy — the documented divergence). Fed via pairs= so the
    fixture is the hand-computed pair skeleton itself."""
    from seqarray_spark.operators.ld import ld_prune

    variants = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 150), (3, "1", 200)],
        "variant_id long, chromosome string, position int",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 10, 0.9), (2, 3, 10, 0.9), (1, 3, 10, 0.1)],
        "va long, vb long, n_used long, r2 double",
    )
    dom = sorted(
        r["variant_id"]
        for r in ld_prune(variants, None, tau=0.2, pairs=pairs).collect()
    )
    greedy = sorted(
        r["variant_id"]
        for r in ld_prune(
            variants, None, tau=0.2, pairs=pairs, method="greedy"
        ).collect()
    )
    assert dom == [1]
    assert greedy == [1, 3]
    assert set(dom) <= set(greedy)

    # unknown method refuses
    import pytest

    with pytest.raises(ValueError, match="method"):
        ld_prune(variants, None, pairs=pairs, method="plink")


def test_pca_loadings_projection_roundtrip(spark):
    """Real-use PCA workflow (r11 — SNPRelate snpgdsPCASNPLoading /
    snpgdsPCASampLoading): sample PCs from grm_pca -> variant loadings
    (Z'W) -> project the SAME samples (Z'L). For the training cohort
    the projection is Z'Z W = m-weighted GRM-ish W, so projected
    component 1 must separate the planted populations exactly as PC1
    does, and the projection must correlate with the PCs
    component-wise (|r| > 0.99 on this clean fixture)."""
    import numpy as np
    from pyspark.sql import functions as F

    from seqarray_spark.operators.ld import (
        grm_from_packed,
        grm_pca,
        pca_project_samples,
        pca_snp_loadings,
    )

    rng = np.random.default_rng(3)
    V, S = 400, 30
    pops = np.array([0] * 15 + [1] * 15)
    codes = np.empty((V, S), dtype=np.uint8)
    for v in range(V):
        p = (0.1, 0.9) if v % 2 == 0 else (0.9, 0.1)
        for s in range(S):
            maf = p[pops[s]]
            codes[v, s] = (rng.random() < maf) + (rng.random() < maf)
    sids = [f"S{i:02d}" for i in range(S)]
    rows = []
    for v in range(V):
        for s in range(S):
            c = int(codes[v, s])
            al = [0, 0] if c == 0 else ([0, 1] if c == 1 else [1, 1])
            rows.append((v, sids[s], al))
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    grm = grm_from_packed(_packed_frame(spark, codes, sids), sids)
    pcs = {r["sample_id"]: r["pc"] for r in grm_pca(grm, k=2).collect()}
    weights = spark.createDataFrame(
        [(s, [float(x) for x in pcs[s]]) for s in sids],
        "sample_id string, w array<double>",
    )
    loadings = pca_snp_loadings(calls, weights)
    assert loadings.count() > 0
    proj = {
        r["sample_id"]: r["p"]
        for r in pca_project_samples(calls, loadings).collect()
    }
    p1 = np.array([proj[s][0] for s in sids])
    g0, g1 = p1[pops == 0], p1[pops == 1]
    assert g0.max() < g1.min() or g1.max() < g0.min()
    pc_mat = np.array([pcs[s] for s in sids])
    pr_mat = np.array([proj[s] for s in sids])
    for c in range(2):
        r = np.corrcoef(pc_mat[:, c], pr_mat[:, c])[0, 1]
        assert abs(r) > 0.99, (c, r)


def test_ibd_mom_planted_relationships(spark):
    """PLINK MoM semantics on planted pedigree structure: duplicates
    -> k0~0, kinship~0.5; unrelated pairs -> k0~1, kinship~0;
    parent-child (one allele inherited from each parent) -> k1
    dominant, kinship~0.25. Raw unconstrained estimates, so tolerances
    are statistical, not exact."""
    import numpy as np

    from seqarray_spark.operators.ld import ibd_mom_from_packed

    rng = np.random.default_rng(17)
    V = 3000
    p = rng.uniform(0.2, 0.8, V)

    def draw():
        return (rng.random(V) < p).astype(np.uint8) + (
            rng.random(V) < p
        ).astype(np.uint8)

    # haplotype-level parent-child: child inherits one allele from
    # each parent
    pa_h = np.stack([(rng.random(V) < p), (rng.random(V) < p)])
    ma_h = np.stack([(rng.random(V) < p), (rng.random(V) < p)])
    father = pa_h.sum(axis=0).astype(np.uint8)
    mother = ma_h.sum(axis=0).astype(np.uint8)
    child = (
        pa_h[rng.integers(0, 2, V), np.arange(V)]
        + ma_h[rng.integers(0, 2, V), np.arange(V)]
    ).astype(np.uint8)
    u1, u2 = draw(), draw()
    # background cohort so the per-variant allele-frequency estimate
    # (the expectation side of MoM) isn't dominated by the planted
    # samples — raw MoM has the small-sample bias PLINK's Ajk
    # corrections exist for, and n=6 leaves k0 ~15% off for unrelated
    bg = [draw() for _ in range(14)]
    codes = np.stack([u1, u1, u2, father, mother, child] + bg, axis=1)
    sids = ["dupA", "dupB", "lone", "father", "mother", "child"] + [
        f"bg{i:02d}" for i in range(14)
    ]
    out = {
        (r["sample_i"], r["sample_j"]): r
        for r in ibd_mom_from_packed(
            _packed_frame(spark, codes, sids), sids
        ).collect()
    }
    dup = out[("dupA", "dupB")]
    assert dup["k0"] < 0.05 and abs(dup["kinship"] - 0.5) < 0.05
    unrel = out[("dupA", "lone")]
    assert abs(unrel["k0"] - 1.0) < 0.1 and abs(unrel["kinship"]) < 0.05  # noqa: E501
    pc = out[("father", "child")]
    assert pc["k1"] > 0.8 and abs(pc["kinship"] - 0.25) < 0.05
    parents = out[("father", "mother")]
    assert abs(parents["k0"] - 1.0) < 0.1


def test_inbreeding_coeff_planted(spark):
    """MoM inbreeding semantics: a fully-homozygous (inbred) sample ->
    F near 1; HWE-drawn samples -> F near 0; the monomorphic-exclusion
    and NULL-denominator rules hold."""
    import numpy as np

    from seqarray_spark.operators.ld import inbreeding_coeff

    rng = np.random.default_rng(23)
    V, S = 2000, 12
    p = rng.uniform(0.2, 0.8, V)
    rows = []
    for s in range(S):
        for v in range(V):
            if s == 0:  # fully homozygous: both alleles one draw
                a = int(rng.random() < p[v])
                al = [a, a]
            else:
                al = [int(rng.random() < p[v]), int(rng.random() < p[v])]
            rows.append((v, f"S{s:02d}", al))
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    out = {r["sample_id"]: r for r in inbreeding_coeff(calls).collect()}
    assert abs(out["S00"]["inbreeding"] - 1.0) < 0.05
    others = [out[f"S{s:02d}"]["inbreeding"] for s in range(1, S)]
    # raw MoM with p estimated from only 12 samples (one of them the
    # inbred outlier) carries the small-sample bias PLINK's n/(n-1)
    # factor corrects; ~0.1 swings are expected at this cohort size
    assert max(abs(f) for f in others) < 0.15
    assert all(out[k]["m_used"] > 0 for k in out)


def test_hwe_exact_p_matches_rational_reference(spark):
    """hwe_exact_p's float recurrence (Wigginton 2005) vs an
    independent EXACT-rational implementation (math.comb Fractions of
    the conditional het-count distribution) across random genotype
    tables and the degenerate cases; the chisq column's value parity
    is the seq_hwe gate."""
    import math
    from fractions import Fraction

    import numpy as np

    from seqarray_spark.operators.ld import hwe_exact_p

    def exact_ref(rr, het, aa):
        n = rr + het + aa
        rare = 2 * min(rr, aa) + het
        if n == 0 or rare == 0 or rare == 2 * n:
            return None
        # P(h) proportional to n! / (hom_r! h! hom_c!) * 2^h
        def weight(h):
            hom_r = (rare - h) // 2
            hom_c = n - h - hom_r
            if hom_r < 0 or hom_c < 0:
                return None
            return Fraction(
                math.factorial(n) * 2**h,
                math.factorial(hom_r)
                * math.factorial(h)
                * math.factorial(hom_c),
            )

        support = [
            h for h in range(rare % 2, rare + 1, 2)
            if weight(h) is not None
        ]
        ws = {h: weight(h) for h in support}
        tot = sum(ws.values())
        obs = ws[het]
        return float(sum(w for w in ws.values() if w <= obs) / tot)

    rng = np.random.default_rng(31)
    cases = [(5, 0, 5), (0, 10, 0), (10, 0, 0), (1469, 138, 5)]
    for _ in range(25):
        cases.append(tuple(int(x) for x in rng.integers(0, 40, 3)))
    df = spark.createDataFrame(
        [(i, rr, het, aa) for i, (rr, het, aa) in enumerate(cases)],
        "variant_id long, n_hom_ref long, n_het long, n_hom_alt long",
    )
    got = {
        r["variant_id"]: r["hwe_exact_p"]
        for r in hwe_exact_p(df).collect()
    }
    for i, (rr, het, aa) in enumerate(cases):
        want = exact_ref(rr, het, aa)
        if want is None:
            assert got[i] is None, (i, (rr, het, aa), got[i])
        else:
            assert got[i] is not None and abs(got[i] - want) < 1e-9, (
                i, (rr, het, aa), got[i], want,
            )


def test_grm_pca_rejects_partial_sample_ids(spark):
    """ADVICE r11: with an explicit sample_ids= list, a pair whose
    sample is ABSENT from the list must raise (naming the id) instead
    of being silently inner-joined away — a typo'd or partial cohort
    list must not yield PCs from a truncated relatedness matrix."""
    import pytest as _pytest

    from seqarray_spark.operators.ld import grm_pca

    grm = spark.createDataFrame(
        [("S1", "S2", 3, 0.5), ("S2", "S3", 3, 0.1)],
        "sample_i string, sample_j string, m_used int, grm double",
    )
    with _pytest.raises(Exception, match="absent from"):
        grm_pca(grm, k=1, sample_ids=["S1", "S2"]).collect()
    # the full cohort passes
    assert grm_pca(grm, k=1, sample_ids=["S1", "S2", "S3"]).count() == 3


def test_fst_wc_planted_two_populations(spark):
    """fst_wc (new r12 — W&C84 parity with snpgdsFst/vcftools) on a
    PLANTED two-population cohort, pinned against an independent
    scalar implementation straight from Weir & Cockerham 1984 eq. 2
    (numpy, per-population frequencies, no quantization): a fixation
    variant -> Fst near 1; an identically-distributed variant -> small
    (possibly negative — the estimator is unbiased, not clamped);
    genome-wide is the ratio of sums."""
    import numpy as np

    from seqarray_spark.operators.ld import fst_wc, fst_wc_genome

    # genotype matrix per variant: dict pop -> list of dosages
    planted = {
        # near-fixation: pop A ref-heavy, pop B alt-heavy
        1: {"A": [0] * 28 + [1, 1], "B": [2] * 27 + [1, 1, 0]},
        # identical distributions -> expect ~0
        2: {"A": [0, 1, 2] * 10, "B": [0, 1, 2] * 10},
        # moderate differentiation, unequal sizes
        3: {"A": [0] * 15 + [1] * 10 + [2] * 5, "B": [2] * 12 + [1] * 6 + [0] * 2},
        # monomorphic across both -> fst NULL
        4: {"A": [0] * 30, "B": [0] * 30},
    }

    rows = []
    for vid, pops in planted.items():
        for pop, doses in pops.items():
            for i, d in enumerate(doses):
                sid = f"{pop}{i:03d}"
                alleles = {0: [0, 0], 1: [0, 1], 2: [1, 1]}[d]
                rows.append((vid, sid, alleles, [False]))
    calls = spark.createDataFrame(
        rows,
        "variant_id int, sample_id string, alleles array<int>, "
        "phased array<boolean>",
    )
    sample_pops = spark.createDataFrame(
        sorted({(r[1], r[1][0]) for r in rows}),
        "sample_id string, population string",
    )

    def wc84_ref(pops):
        ns = np.array([len(v) for v in pops.values()], dtype=float)
        ps = np.array([sum(v) / (2 * len(v)) for v in pops.values()])
        hs = np.array(
            [sum(1 for d in v if d == 1) / len(v) for v in pops.values()]
        )
        r = len(ns)
        nb = ns.mean()
        nc = (ns.sum() - (ns**2).sum() / ns.sum()) / (r - 1)
        pb = (ns * ps).sum() / ns.sum()
        s2 = (ns * (ps - pb) ** 2).sum() / ((r - 1) * nb)
        hb = (ns * hs).sum() / ns.sum()
        a = (nb / nc) * (
            s2 - (pb * (1 - pb) - s2 * (r - 1) / r - hb / 4) / (nb - 1)
        )
        b = (nb / (nb - 1)) * (
            pb * (1 - pb)
            - s2 * (r - 1) / r
            - hb * (2 * nb - 1) / (4 * nb)
        )
        c = hb / 2
        return a, a + b + c

    out = {r["variant_id"]: r for r in fst_wc(calls, sample_pops).collect()}
    assert set(out) == {1, 2, 3, 4}
    for vid, pops in planted.items():
        a, abc = wc84_ref(pops)
        got = out[vid]
        assert got["n_pops"] == 2
        assert got["n_total"] == sum(len(v) for v in pops.values())
        if abc == 0.0:
            assert got["fst"] is None
        else:
            assert abs(got["wc_a"] - a) < 1e-6
            assert abs(got["wc_abc"] - abc) < 1e-6
            assert abs(got["fst"] - a / abc) < 1e-6
    assert out[1]["fst"] > 0.75
    assert abs(out[2]["fst"]) < 0.05
    assert out[4]["fst"] is None

    # genome-wide: ratio of sums over the defined variants
    per_v = fst_wc(calls, sample_pops)
    g = fst_wc_genome(per_v).collect()[0]
    sa = sd = 0.0
    for vid, pops in planted.items():
        a, abc = wc84_ref(pops)
        sa, sd = sa + a, sd + abc
    assert g["n_variants"] == 4
    assert abs(g["fst_genome"] - sa / sd) < 1e-6

    # windowed (vcftools --fst-window-size): per-window ratio of sums.
    # positions put variants 1,2 in windows [0,999]+[500,1499] overlap
    # zones and variant 3 alone in a later window; the monomorphic
    # variant 4 contributes nothing anywhere.
    from seqarray_spark.operators.ld import fst_wc_windows

    variants = spark.createDataFrame(
        [(1, "7", 100), (2, "7", 600), (3, "7", 2100), (4, "7", 2200)],
        "variant_id int, chromosome string, position int",
    )
    wrows = {
        (r["chromosome"], r["unit_start"], r["unit_end"]):
            (r["n_variants"], r["fst"])
        for r in fst_wc_windows(
            calls, sample_pops, variants, win_size=1000, win_shift=500
        ).collect()
    }
    a1, d1 = wc84_ref(planted[1])
    a2, d2 = wc84_ref(planted[2])
    a3, d3 = wc84_ref(planted[3])
    # window [0, 999]: variants 1 (pos 100) and 2 (pos 600)
    n, f = wrows[("7", 0, 999)]
    assert n == 2 and abs(f - (a1 + a2) / (d1 + d2)) < 1e-6
    # window [500, 1499]: variant 2 only
    n, f = wrows[("7", 500, 1499)]
    assert n == 1 and abs(f - a2 / d2) < 1e-6
    # window [2000, 2999]: variants 3 and 4 — the monomorphic 4 has
    # DEFINED zero components (wa = abc = 0, exactly vcftools'
    # treatment: counted in the window, contributing nothing to either
    # sum), so n=2 but fst is still a3/d3
    n, f = wrows[("7", 2000, 2999)]
    assert n == 2 and abs(f - a3 / d3) < 1e-6


def test_pca_family_on_reference_container(spark):
    """VERDICT r11 item 4: the r11 PCA estimators compose END-TO-END on
    the reference's own released container bytes the way the pair
    kernels provably do — from_gds(1KG chr22) -> pack_2bit_genotypes ->
    grm_from_packed -> {grm_pca exact, grm_pca_distributed} ->
    pca_snp_loadings -> pca_project_samples — pinning (a) the
    randomized eigensolver against the exact path on the real cohort
    subset and (b) self-projection against the PCs per component
    (P = Z'ZW ~ m*Lambda*W up to per-pair m_used variation and the
    imposed unit diagonal; measured |r| 0.987-0.996 per column on this
    subset, pinned at 0.95)."""
    import os

    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    KG = "/root/reference/inst/extdata/1KG_phase1_release_v3_chr22.gds"
    if not os.path.exists(KG):
        pytest.skip("reference fixtures not available")

    from seqarray_spark.operators.ld import (
        grm_from_packed,
        grm_pca,
        grm_pca_distributed,
        pca_snp_loadings,
        pca_project_samples,
    )
    from seqarray_spark.sources.gds_spark import from_gds
    from seqarray_spark.sources.packed import pack_2bit_genotypes

    probe = from_gds(spark, KG, block_variants=2048)
    sids = [
        r["sample_id"]
        for r in probe.samples.orderBy("sample_ordinal").limit(16).collect()
    ]
    ds = from_gds(spark, KG, block_variants=2048, samples=sids)
    ds.set_filter_variant(F.col("variant_id") <= 1200)
    ss = sorted(sids)
    grm = grm_from_packed(pack_2bit_genotypes(ds, ss), ss).persist()
    try:
        assert grm.count() == 16 * 15 // 2

        pcs_e = {
            r["sample_id"]: r["pc"]
            for r in grm_pca(grm, k=4, sample_ids=ss).collect()
        }
        pcs_d = {
            r["sample_id"]: r["pc"]
            for r in grm_pca_distributed(
                grm, k=4, sample_ids=ss, power_iters=8
            ).collect()
        }
        We = np.array([pcs_e[s] for s in ss])
        Wd = np.array([pcs_d[s] for s in ss])
        for c in range(4):
            r = abs(np.corrcoef(We[:, c], Wd[:, c])[0, 1])
            assert r > 0.99, (c, r)

        w = spark.createDataFrame(
            [(s, [float(x) for x in pcs_e[s]]) for s in ss],
            "sample_id string, w array<double>",
        )
        loadings = pca_snp_loadings(ds.calls, w, assume_unique=True)
        proj = pca_project_samples(ds.calls, loadings, assume_unique=True)
        pm = {r["sample_id"]: r["p"] for r in proj.collect()}
        assert set(pm) == set(ss)
        Pm = np.array([pm[s] for s in ss])
        for c in range(4):
            r = abs(np.corrcoef(We[:, c], Pm[:, c])[0, 1])
            assert r > 0.95, (c, r)
    finally:
        grm.unpersist()


def test_ld_composite_is_signed_dosage_correlation(spark, sf_dir):
    """ld_pairs(stat='composite') (new r12 — SNPRelate snpgdsLDMat's
    default method): Weir's composite-Delta correlation. The identity
    pq + D == var(dosage)/2 makes it the SIGNED genotype correlation,
    so its square must equal the r2 stat row for row, its sign must
    match the covariance, and the NULL rows (monomorphic loci) must
    coincide."""
    from seqarray_spark.operators.ld import ld_pairs
    from seqarray_spark.sources import testdata as td

    v = td.gvariants(spark, sf_dir)
    c = td.gcalls(spark, sf_dir)
    r2 = {
        (r["va"], r["vb"]): r["r2"]
        for r in ld_pairs(v, c, bp_window=5000).collect()
    }
    comp = {
        (r["va"], r["vb"]): r["ld_comp"]
        for r in ld_pairs(v, c, bp_window=5000, stat="composite").collect()
    }
    assert set(r2) == set(comp) and len(r2) > 100
    n_neg = 0
    for k, c_val in comp.items():
        if c_val is None:
            assert r2[k] is None, k
            continue
        assert r2[k] is not None
        assert abs(c_val * c_val - r2[k]) < 1e-12, (k, c_val, r2[k])
        n_neg += c_val < 0
    # the derived data must actually exercise the sign (else this test
    # would pass on |r|)
    assert n_neg > 0


def test_ld_em_planted_haplotypes(spark):
    """ld_pairs_em (new r12 — snpgdsLDMat method='r'/'dprime'): on
    PLANTED haplotype structure the EM must recover phase — perfect
    coupling -> r=1, D'=1; perfect repulsion -> r=-1, D'=-1; an
    independent pair -> |r| small — and on a mixed-phase table with
    genuine double-het ambiguity it must match an independent
    run-to-convergence scalar EM."""
    import numpy as np

    from seqarray_spark.operators.ld import _ld_em_kernel, ld_pairs_em

    rng = np.random.default_rng(11)

    def calls_from_haps(vid_a, vid_b, haps):
        """haps: (n, 2) array of haplotype codes 0=AB 1=Ab 2=aB 3=ab;
        emit unphased diploid calls for both variants."""
        rows = []
        for i, (h1, h2) in enumerate(haps):
            sid = f"S{i:03d}"
            a_allele = lambda h: 1 if h in (0, 1) else 0
            b_allele = lambda h: 1 if h in (0, 2) else 0
            rows.append((vid_a, sid, [a_allele(h1), a_allele(h2)], [False]))
            rows.append((vid_b, sid, [b_allele(h1), b_allele(h2)], [False]))
        return rows

    n = 60
    rows = []
    # pair (1, 2): perfect coupling AB/ab only
    hap_pool = np.array([0, 3])
    rows += calls_from_haps(1, 2, hap_pool[rng.integers(0, 2, (n, 2))])
    # pair (3, 4): perfect repulsion Ab/aB only
    hap_pool = np.array([1, 2])
    rows += calls_from_haps(3, 4, hap_pool[rng.integers(0, 2, (n, 2))])
    # pair (5, 6): independent loci (all four haplotypes, p=0.25 each)
    rows += calls_from_haps(5, 6, rng.integers(0, 4, (n, 2)))
    # pair (7, 8): mixed-phase with real double-het mass
    probs = np.array([0.45, 0.15, 0.1, 0.3])
    rows += calls_from_haps(
        7, 8, rng.choice(4, size=(n, 2), p=probs)
    )
    calls = spark.createDataFrame(
        rows,
        "variant_id int, sample_id string, alleles array<int>, "
        "phased array<boolean>",
    )
    variants = spark.createDataFrame(
        [(i, "1", 100 * i) for i in range(1, 9)],
        "variant_id int, chromosome string, position int",
    )
    out = {
        (r["va"], r["vb"]): r
        for r in ld_pairs_em(variants, calls, bp_window=5000).collect()
    }
    assert out[(1, 2)]["ld_r"] > 0.999 and out[(1, 2)]["d_prime"] > 0.999
    assert out[(3, 4)]["ld_r"] < -0.999 and out[(3, 4)]["d_prime"] < -0.999
    assert abs(out[(5, 6)]["ld_r"]) < 0.25

    # mixed-phase pair vs an independent run-to-convergence scalar EM
    def em_converged(cells):
        n22, n21, n12, n20, n02, n11, n10, n01, n00 = cells
        ntot = sum(cells)
        c_ab = 2 * n22 + n21 + n12
        c_Ab = 2 * n20 + n21 + n10
        c_aB = 2 * n02 + n12 + n01
        c_xx = 2 * n00 + n10 + n01
        x = 0.5
        for _ in range(100_000):
            p_ab = (c_ab + x * n11) / (2 * ntot)
            p_xx = (c_xx + x * n11) / (2 * ntot)
            p_Ab = (c_Ab + (1 - x) * n11) / (2 * ntot)
            p_aB = (c_aB + (1 - x) * n11) / (2 * ntot)
            den = p_ab * p_xx + p_Ab * p_aB
            x_new = (p_ab * p_xx) / den if den > 0 else 0.5
            if abs(x_new - x) < 1e-14:
                x = x_new
                break
            x = x_new
        return (c_ab + x * n11) / (2 * ntot)

    # rebuild the pair's genotype table driver-side
    import collections

    dose = collections.defaultdict(dict)
    for vid, sid, alleles, _ in rows:
        if vid in (7, 8):
            dose[sid][vid] = sum(1 for a in alleles if a > 0)
    cells = collections.Counter(
        (d[7], d[8]) for d in dose.values()
    )
    order = [(2, 2), (2, 1), (1, 2), (2, 0), (0, 2), (1, 1), (1, 0),
             (0, 1), (0, 0)]
    cvec = [cells.get(k, 0) for k in order]
    want_pab = em_converged(cvec)
    got = out[(7, 8)]
    assert abs(got["p_ab"] - want_pab) < 1e-6
    # and the Spark path must equal the local fixed-30 kernel exactly
    k = _ld_em_kernel(
        np.array([sum(cvec)]),
        *(np.array([c]) for c in cvec),
        iters=30,
    )
    assert abs(got["p_ab"] - k[0][0]) < 1e-15
    assert abs(got["ld_r"] - k[1][0]) < 1e-15
    assert abs(got["d_prime"] - k[2][0]) < 1e-15


def test_pca_snp_corr_planted(spark):
    """pca_snp_corr (new r12 — snpgdsPCACorr): on a planted
    two-population cohort the differentiated variants must carry the
    highest |corr| against the separating PC, and every value must
    match a direct numpy Pearson correlation of (dosage, weight) to
    within the 1e-6 weight-quantization grid."""
    import numpy as np

    from seqarray_spark.operators.ld import (
        grm_pairs,
        grm_pca,
        pca_snp_corr,
    )

    rng = np.random.default_rng(23)
    n_per, n_var = 20, 30
    samples = [f"A{i:02d}" for i in range(n_per)] + [
        f"B{i:02d}" for i in range(n_per)
    ]
    pop = np.array([0] * n_per + [1] * n_per)
    doses = np.zeros((n_var, 2 * n_per), dtype=np.int64)
    for v in range(n_var):
        if v < 10:  # differentiated: pop A ref-ish, pop B alt-ish
            pa, pb = 0.1, 0.9
        else:  # shared frequency
            pa = pb = rng.uniform(0.2, 0.8)
        p = np.where(pop == 0, pa, pb)
        doses[v] = rng.binomial(2, p)
    rows = []
    for v in range(n_var):
        for s in range(2 * n_per):
            d = int(doses[v, s])
            al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
            rows.append((v, samples[s], al))
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    pcs = {
        r["sample_id"]: r["pc"]
        for r in grm_pca(
            grm_pairs(calls), k=2, sample_ids=samples
        ).collect()
    }
    w = spark.createDataFrame(
        [(s, [float(x) for x in pcs[s]]) for s in samples],
        "sample_id string, w array<double>",
    )
    out = {
        r["variant_id"]: r
        for r in pca_snp_corr(calls, w, assume_unique=True).collect()
    }
    assert set(out) == set(range(n_var))
    wmat = np.array([pcs[s] for s in samples])
    for v in range(n_var):
        got = out[v]["corr"]
        assert out[v]["n_used"] == 2 * n_per
        for c in range(2):
            x = doses[v].astype(float)
            y = wmat[:, c]
            if x.std() == 0 or y.std() == 0:
                assert got[c] is None
            else:
                want = np.corrcoef(x, y)[0, 1]
                assert abs(got[c] - want) < 1e-5, (v, c, got[c], want)
    # PC1 separates the populations, so the 10 differentiated variants
    # must dominate the |corr| ranking on that component
    pc_sep = int(
        np.argmax(
            [abs(np.corrcoef(pop, wmat[:, c])[0, 1]) for c in range(2)]
        )
    )
    ranked = sorted(
        range(n_var), key=lambda v: -abs(out[v]["corr"][pc_sep] or 0.0)
    )
    assert set(ranked[:8]) <= set(range(10))


def test_pca_snp_corr_wide_cohort_no_overflow(spark):
    """r12 review: with unit-magnitude weights on the 1e-6 grid,
    n*sww - sw^2 passes int64 at n >= ~3037 samples — the variance
    terms must run in DECIMAL(38,0), not wrap. 5000 samples with
    Rademacher weights must still match numpy Pearson exactly."""
    import numpy as np

    from seqarray_spark.operators.ld import pca_snp_corr

    rng = np.random.default_rng(5)
    n = 5000
    sids = [f"S{i:05d}" for i in range(n)]
    w = rng.choice([-1.0, 1.0], size=n)
    doses = rng.integers(0, 3, size=(3, n))
    rows = []
    for v in range(3):
        for i in range(n):
            d = int(doses[v, i])
            al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
            rows.append((v, sids[i], al))
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    wdf = spark.createDataFrame(
        [(sids[i], [float(w[i])]) for i in range(n)],
        "sample_id string, w array<double>",
    )
    out = {
        r["variant_id"]: r["corr"][0]
        for r in pca_snp_corr(calls, wdf, assume_unique=True).collect()
    }
    for v in range(3):
        want = np.corrcoef(doses[v].astype(float), w)[0, 1]
        assert abs(out[v] - want) < 1e-9, (v, out[v], want)


def test_inbreeding_weir_planted(spark):
    """inbreeding_coeff_weir (new r12 — snpgdsIndInb('mom.weir') /
    GCTA F-hat-III): an inbred sample (excess homozygosity) scores
    high positive, an HWE-consistent one near 0; every value matches
    the direct numpy mean of standardized terms; and the two moment
    estimators agree in RANKING but not value (the documented
    rare-variant weighting divergence)."""
    import numpy as np

    from seqarray_spark.operators.ld import (
        inbreeding_coeff,
        inbreeding_coeff_weir,
    )

    rng = np.random.default_rng(29)
    n_s, n_v = 24, 60
    sids = [f"S{i:02d}" for i in range(n_s)]
    doses = np.zeros((n_v, n_s), dtype=np.int64)
    for v in range(n_v):
        p = rng.uniform(0.1, 0.9)
        # samples 0-7 inbred (F=0.6): draw one allele, duplicate w.p. F
        for s in range(n_s):
            if s < 8:
                if rng.random() < 0.6:
                    doses[v, s] = 2 * rng.binomial(1, p)
                else:
                    doses[v, s] = rng.binomial(2, p)
            else:
                doses[v, s] = rng.binomial(2, p)
    rows = []
    for v in range(n_v):
        for s in range(n_s):
            d = int(doses[v, s])
            al = [0, 0] if d == 0 else ([0, 1] if d == 1 else [1, 1])
            rows.append((v, sids[s], al))
    calls = spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )
    got = {
        r["sample_id"]: r
        for r in inbreeding_coeff_weir(calls, assume_unique=True).collect()
    }
    # numpy replay: per-variant p over called samples, standardized term
    p_hat = doses.mean(axis=1) / 2.0
    poly = (p_hat > 0) & (p_hat < 1)
    for s in range(n_s):
        x = doses[poly, s].astype(float)
        p = p_hat[poly]
        terms = (x * x - (1 + 2 * p) * x + 2 * p * p) / (2 * p * (1 - p))
        want = terms.mean()
        assert got[sids[s]]["m_used"] == int(poly.sum())
        assert abs(got[sids[s]]["inbreeding_weir"] - want) < 1e-6
    inbred = np.mean([got[sids[s]]["inbreeding_weir"] for s in range(8)])
    outbred = np.mean(
        [got[sids[s]]["inbreeding_weir"] for s in range(8, n_s)]
    )
    assert inbred > 0.35 and abs(outbred) < 0.15
    # both moment estimators separate the planted groups
    gv = {
        r["sample_id"]: r["inbreeding"]
        for r in inbreeding_coeff(calls, assume_unique=True).collect()
    }
    assert np.mean([gv[sids[s]] for s in range(8)]) > 0.35


def test_unrelated_samples_kept_set_semantics(spark):
    """unrelated_samples (new r12 — KING --unrelated / PLINK2
    --king-cutoff): on the chain A~B, B~C (A!~C) the walk keeps A,
    drops B, and KEEPS C because its only relative was itself dropped
    — the kept-set semantics, same as greedy LD pruning; pair-less
    samples from the universe always survive, NULL kinship never
    blocks."""
    from seqarray_spark.operators.ld import unrelated_samples

    kin = spark.createDataFrame(
        [
            ("A", "B", 100, 0.25),
            ("B", "C", 100, 0.25),
            ("A", "C", 100, 0.01),
            ("A", "D", 100, None),  # NULL kinship: never blocks
        ],
        "sample_i string, sample_j string, m_used int, kinship double",
    )
    universe = spark.createDataFrame(
        [("A",), ("B",), ("C",), ("D",), ("E",)], "sample_id string"
    )
    kept = {
        r["sample_id"]
        for r in unrelated_samples(kin, tau=0.0884, samples=universe).collect()
    }
    assert kept == {"A", "C", "D", "E"}
    # derived-universe form: E (absent from pairs) is unknown there
    kept2 = {
        r["sample_id"] for r in unrelated_samples(kin, tau=0.0884).collect()
    }
    assert kept2 == {"A", "C", "D"}


def test_ibd_mle_planted_relationships(spark):
    """snpgdsIBDMLE semantics (Milligan 2003 EM) on planted pedigree
    structure: duplicates -> k2 dominant, kinship~0.5; unrelated ->
    k0~1; parent-child -> k1 dominant, kinship~0.25; full sibs ->
    (k0,k1,k2)~(1/4,1/2,1/4), kinship~0.25 — the state the MoM
    estimator can't pin without the likelihood. Statistical
    tolerances: raw EM estimates on 3000 planted variants."""
    import numpy as np

    from seqarray_spark.operators.ld import ibd_mle_from_packed

    rng = np.random.default_rng(29)
    V = 3000
    p = rng.uniform(0.2, 0.8, V)

    def draw():
        return (rng.random(V) < p).astype(np.uint8) + (
            rng.random(V) < p
        ).astype(np.uint8)

    # NB: uint8 haplotypes, NOT bool — numpy bool + bool is logical
    # OR, which silently caps planted children at genotype 1 and
    # flattens the likelihood surface the MLE needs
    pa_h = np.stack(
        [(rng.random(V) < p), (rng.random(V) < p)]
    ).astype(np.uint8)
    ma_h = np.stack(
        [(rng.random(V) < p), (rng.random(V) < p)]
    ).astype(np.uint8)
    father = pa_h.sum(axis=0).astype(np.uint8)
    mother = ma_h.sum(axis=0).astype(np.uint8)

    def child():
        return (
            pa_h[rng.integers(0, 2, V), np.arange(V)]
            + ma_h[rng.integers(0, 2, V), np.arange(V)]
        ).astype(np.uint8)

    sib1, sib2 = child(), child()
    u1 = draw()
    # MLE is sensitive to allele-frequency error (the snpgdsIBDMLE
    # docs say to bring reference-panel frequencies): 40 background
    # samples keep the p estimate honest, where MoM got by with 14
    bg = [draw() for _ in range(40)]
    codes = np.stack(
        [u1, u1, father, mother, sib1, sib2] + bg, axis=1
    )
    sids = ["dupA", "dupB", "father", "mother", "sib1", "sib2"] + [
        f"bg{i:02d}" for i in range(40)
    ]
    out = {
        (r["sample_i"], r["sample_j"]): r
        for r in ibd_mle_from_packed(
            # 150 steps: the full-sib interior point converges slower
            # than the corner states the 30-step default resolves
            _packed_frame(spark, codes, sids), sids, em_iters=150
        ).collect()
    }
    dup = out[("dupA", "dupB")]
    assert dup["k0"] < 0.02 and dup["k1"] < 0.1
    assert abs(dup["kinship"] - 0.5) < 0.03
    unrel = out[("dupA", "father")]
    assert unrel["k0"] > 0.9 and abs(unrel["kinship"]) < 0.03
    pc = out[("father", "sib1")]
    assert pc["k1"] > 0.8 and abs(pc["kinship"] - 0.25) < 0.05
    sibs = out[("sib1", "sib2")]
    assert abs(sibs["k0"] - 0.25) < 0.1
    assert abs(sibs["k1"] - 0.5) < 0.12
    assert abs(sibs["kinship"] - 0.25) < 0.05
    parents = out[("father", "mother")]
    assert parents["k0"] > 0.9
    # every pair saw (nearly) all informative variants
    assert all(r["m_used"] > 2500 for r in out.values())


def test_ibd_mle_validation_and_grid(spark):
    """n_bins must be a power of two (dyadic p-grid = exact float64);
    coarser grids shrink the cell table but keep estimates close."""
    import numpy as np
    import pytest

    from seqarray_spark.operators.ld import ibd_mle_from_packed

    rng = np.random.default_rng(31)
    V = 800
    p = rng.uniform(0.2, 0.8, V)
    codes = np.stack(
        [
            (rng.random(V) < p).astype(np.uint8)
            + (rng.random(V) < p).astype(np.uint8)
            for _ in range(6)
        ],
        axis=1,
    )
    sids = [f"S{i}" for i in range(6)]
    pf = _packed_frame(spark, codes, sids)
    with pytest.raises(ValueError, match="power of two"):
        ibd_mle_from_packed(pf, sids, n_bins=100)
    with pytest.raises(ValueError, match="em_iters"):
        ibd_mle_from_packed(pf, sids, em_iters=0)
    with pytest.raises(ValueError, match=">= 2 samples"):
        ibd_mle_from_packed(pf, ["S0"])
    fine = {
        (r["sample_i"], r["sample_j"]): r["k0"]
        for r in ibd_mle_from_packed(pf, sids, n_bins=128).collect()
    }
    coarse = {
        (r["sample_i"], r["sample_j"]): r["k0"]
        for r in ibd_mle_from_packed(pf, sids, n_bins=32).collect()
    }
    assert set(fine) == set(coarse) and len(fine) == 15
    for k in fine:
        assert abs(fine[k] - coarse[k]) < 0.06, (k, fine[k], coarse[k])


def test_greedy_kept_walk_matches_naive_reference():
    """Property test (no Spark): the shared array-backed kernel agrees
    with the obvious sequential set-based walk on random graphs,
    including backward pairs (pred >= node, which the kernel must
    ignore) and hub-heavy degree skew."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from seqarray_spark.operators.ld import _greedy_kept_walk

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(min_value=0, max_value=40))
        n_pairs = data.draw(st.integers(min_value=0, max_value=120))
        if n == 0:
            pred = np.array([], dtype=np.int64)
            node = np.array([], dtype=np.int64)
        else:
            pred = np.array(
                data.draw(
                    st.lists(
                        st.integers(0, n - 1),
                        min_size=n_pairs,
                        max_size=n_pairs,
                    )
                ),
                dtype=np.int64,
            )
            node = np.array(
                data.draw(
                    st.lists(
                        st.integers(0, n - 1),
                        min_size=n_pairs,
                        max_size=n_pairs,
                    )
                ),
                dtype=np.int64,
            )
        kept = _greedy_kept_walk(n, pred, node)
        # naive reference: visit 0..n-1, drop j iff some forward pair
        # (p < j) has p kept
        preds_of: dict = {}
        for p_, j_ in zip(pred, node):
            if p_ < j_:
                preds_of.setdefault(int(j_), []).append(int(p_))
        ref = np.zeros(n, dtype=bool)
        for j in range(n):
            ref[j] = not any(ref[p_] for p_ in preds_of.get(j, ()))
        assert (kept == ref).all(), (n, pred, node, kept, ref)

    run()
