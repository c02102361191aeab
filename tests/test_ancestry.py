"""EIGMIX + admixture-proportion tests: planted 3-population mixture
recovery, eigmix-vs-GRM relation sanity, admix_prop validation. The
engine/oracle float-tree parity is covered by the seq_eigmix /
seq_admix_prop gates in tests/test_registry_sweep.py."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _calls_from_codes(spark, codes, sids):
    rows = []
    for v in range(codes.shape[0]):
        for s, sid in enumerate(sids):
            d = int(codes[v, s])
            rows.append(
                (v, sid, [1 if d >= 1 else 0, 1 if d >= 2 else 0])
            )
    return spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )


def _planted_admixture(rng, V=1500, per_pop=8):
    """3 ancestral populations with divergent frequencies, pure
    reference panels, and admixed targets with KNOWN proportions."""
    import numpy as np

    # ancestral frequencies: a common base drifted per population
    base = rng.uniform(0.1, 0.9, V)
    freqs = []
    for _ in range(3):
        f = np.clip(base + rng.normal(0, 0.25, V), 0.02, 0.98)
        freqs.append(f)

    def draw(f):
        return (
            (rng.random(V) < f).astype(np.uint8)
            + (rng.random(V) < f).astype(np.uint8)
        )

    codes, sids, truth = [], [], {}
    for pop in range(3):
        for i in range(per_pop):
            sid = f"P{pop}_{i:02d}"
            codes.append(draw(freqs[pop]))
            sids.append(sid)
            truth[sid] = [1.0 if j == pop else 0.0 for j in range(3)]
    mixes = {"mixAB": [0.5, 0.5, 0.0], "mixAC": [0.5, 0.0, 0.5],
             "mix3": [0.34, 0.33, 0.33]}
    for sid, w in mixes.items():
        f = w[0] * freqs[0] + w[1] * freqs[1] + w[2] * freqs[2]
        codes.append(draw(f))
        sids.append(sid)
        truth[sid] = w
    import numpy as np

    return np.stack(codes, axis=1), sids, truth


def test_eigmix_separates_and_admix_recovers_proportions(spark):
    """End to end: eigmix eigenvectors separate 3 planted populations;
    admix_prop on the pure panels recovers the planted mixture
    weights of held-out admixed samples."""
    import numpy as np

    from seqarray_spark.operators.ancestry import admix_prop, eigmix

    rng = np.random.default_rng(47)
    codes, sids, truth = _planted_admixture(rng)
    calls = _calls_from_codes(spark, codes, sids)
    coords = eigmix(calls, k=2)
    groups = spark.createDataFrame(
        [(s, s.split("_")[0]) for s in sids if "_" in s],
        "sample_id string, population string",
    )
    out = {
        r["sample_id"]: list(r["prop"])
        for r in admix_prop(coords, groups).collect()
    }
    assert set(out) == set(sids)
    for sid, want in truth.items():
        got = out[sid]
        assert len(got) == 3
        for a, b in zip(got, want):
            assert abs(a - b) < 0.12, (sid, got, want)
    # proportions sum to exactly 1 by construction
    for got in out.values():
        assert abs(sum(got) - 1.0) < 1e-9


def test_eigmix_pairs_ratio_of_sums_vs_grm(spark):
    """eigmix's ratio-of-sums must equal the GCTA mean-of-ratios on
    data where every variant has the SAME heterozygosity (the two
    normalizations coincide), and differ when a rare variant is
    planted (EIGMIX damps it; GCTA's per-variant weight inflates)."""
    import numpy as np

    from seqarray_spark.operators.ancestry import eigmix_pairs
    from seqarray_spark.operators.ld import grm_pairs

    rng = np.random.default_rng(53)
    V, S = 400, 8
    # constant-p block: every variant drawn at p=0.5
    codes = np.stack(
        [rng.binomial(2, 0.5, S) for _ in range(V)], axis=0
    ).astype(np.uint8)
    calls = _calls_from_codes(spark, codes, [f"S{i}" for i in range(S)])
    em = {
        (r["sample_i"], r["sample_j"]): r["eigmix"]
        for r in eigmix_pairs(calls).collect()
    }
    gm = {
        (r["sample_i"], r["sample_j"]): r["grm"]
        for r in grm_pairs(calls).collect()
    }
    assert set(em) == set(gm)
    # not exactly equal (per-variant 2pq varies with the realized
    # sample freq), but the two estimators track tightly here
    diffs = [abs(em[k] - gm[k]) for k in em]
    assert max(diffs) < 0.2
    corr = np.corrcoef(
        [em[k] for k in sorted(em)], [gm[k] for k in sorted(gm)]
    )[0, 1]
    assert corr > 0.95


def test_admix_prop_validation(spark):
    from seqarray_spark.operators.ancestry import admix_prop

    coords = spark.createDataFrame(
        [("A", [1.0, 0.0]), ("B", [0.0, 1.0]), ("C", [0.0, 0.0]),
         ("D", [0.5, 0.5])],
        "sample_id string, pc array<double>",
    )
    groups = spark.createDataFrame(
        [("A", "g1"), ("B", "g2"), ("C", "g3")],
        "sample_id string, population string",
    )
    out = {
        r["sample_id"]: list(r["prop"])
        for r in admix_prop(coords, groups).collect()
    }
    # pure references sit at simplex corners; D halfway between g1/g2
    assert out["A"] == pytest.approx([1.0, 0.0, 0.0], abs=1e-12)
    assert out["B"] == pytest.approx([0.0, 1.0, 0.0], abs=1e-12)
    assert out["C"] == pytest.approx([0.0, 0.0, 1.0], abs=1e-12)
    assert out["D"] == pytest.approx([0.5, 0.5, 0.0], abs=1e-12)
    with pytest.raises(ValueError, match=">= 2 reference groups"):
        admix_prop(coords, groups.where("population = 'g1'"))
    with pytest.raises(ValueError, match="dims"):
        admix_prop(
            coords.select(
                "sample_id", F_slice_one(coords)
            ),
            groups,
        )
    # collinear centroids
    coords2 = spark.createDataFrame(
        [("A", [0.0, 0.0]), ("B", [1.0, 1.0]), ("C", [2.0, 2.0])],
        "sample_id string, pc array<double>",
    )
    with pytest.raises(ValueError, match="collinear"):
        admix_prop(coords2, groups)


def F_slice_one(coords):
    from pyspark.sql import functions as F

    return F.slice("pc", 1, 1).alias("pc")


def test_admix_prop_general_k_matches_closed_form(spark):
    """K=4 path (numpy solve) agrees with hand-checkable barycentric
    geometry in 3 dims: corners recover identity."""
    from seqarray_spark.operators.ancestry import admix_prop

    corners = {
        "A": [0.0, 0.0, 0.0],
        "B": [1.0, 0.0, 0.0],
        "C": [0.0, 1.0, 0.0],
        "D": [0.0, 0.0, 1.0],
    }
    rows = [(s, v) for s, v in corners.items()]
    rows.append(("M", [0.25, 0.25, 0.25]))
    coords = spark.createDataFrame(
        rows, "sample_id string, pc array<double>"
    )
    groups = spark.createDataFrame(
        [(s, f"g{s}") for s in corners],
        "sample_id string, population string",
    )
    out = {
        r["sample_id"]: list(r["prop"])
        for r in admix_prop(coords, groups).collect()
    }
    assert out["A"] == pytest.approx([1, 0, 0, 0], abs=1e-12)
    assert out["D"] == pytest.approx([0, 0, 0, 1], abs=1e-12)
    assert out["M"] == pytest.approx([0.25] * 4, abs=1e-12)


def test_hcluster_cut_recovers_planted_populations(spark):
    """UPGMA over 1-IBS distance + cut_tree(k=3) recovers 3 planted
    populations exactly; dendrogram heights are monotone
    non-decreasing (UPGMA on a metric-ish matrix)."""
    import numpy as np

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    from test_ld import _packed_frame

    from seqarray_spark.operators.ancestry import (
        cut_tree,
        hcluster_average,
        ibs_dist,
    )
    from seqarray_spark.operators.ld import ibs_from_packed

    rng = np.random.default_rng(59)
    V = 1200
    base = rng.uniform(0.1, 0.9, V)
    codes, sids, want = [], [], {}
    for pop in range(3):
        f = np.clip(base + rng.normal(0, 0.3, V), 0.02, 0.98)
        for i in range(6):
            sid = f"P{pop}_{i}"
            codes.append(
                (rng.random(V) < f).astype(np.uint8)
                + (rng.random(V) < f).astype(np.uint8)
            )
            sids.append(sid)
            want[sid] = pop
    mat = np.stack(codes, axis=1)
    dist = ibs_dist(
        ibs_from_packed(_packed_frame(spark, mat, sids), sids)
    )
    merges, ids = hcluster_average(dist)
    assert len(merges) == len(ids) - 1
    heights = [h for (_a, _b, h, _n) in merges]
    assert all(
        heights[i] <= heights[i + 1] + 1e-12
        for i in range(len(heights) - 1)
    )
    got = dict(cut_tree(merges, ids, k=3))
    # cluster labels are arbitrary; the PARTITION must match
    by_pop = {}
    for sid, cl in got.items():
        by_pop.setdefault(want[sid], set()).add(cl)
    assert all(len(v) == 1 for v in by_pop.values()), by_pop
    assert len({next(iter(v)) for v in by_pop.values()}) == 3
    # k=1 puts everyone together; k=n singles everyone out
    assert len({c for _s, c in cut_tree(merges, ids, k=1)}) == 1
    assert len({c for _s, c in cut_tree(merges, ids, k=len(ids))}) == len(ids)  # noqa: E501


def test_hcluster_matches_bruteforce_reference(spark):
    """The driver-side Lance-Williams agglomeration agrees with an
    independent O(n^3) recompute-from-scratch UPGMA on random
    matrices (heights and merge partitions)."""
    import numpy as np

    from seqarray_spark.operators.ancestry import hcluster_average

    rng = np.random.default_rng(61)
    n = 12
    m = rng.random((n, n))
    m = (m + m.T) / 2
    np.fill_diagonal(m, 0.0)
    ids = [f"S{i:02d}" for i in range(n)]
    rows = [
        (ids[i], ids[j], 1, float(m[i, j]))
        for i in range(n)
        for j in range(i + 1, n)
    ]
    dist = spark.createDataFrame(
        rows, "sample_i string, sample_j string, m_used int, dist double"
    )
    merges, axis = hcluster_average(dist)
    assert axis == ids

    # reference: recompute average linkage from scratch each step
    clusters = [{i} for i in range(n)]
    ref_heights = []
    while len(clusters) > 1:
        best = None
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                dd = np.mean(
                    [m[i, j] for i in clusters[a] for j in clusters[b]]
                )
                if best is None or dd < best[0] - 1e-15:
                    best = (dd, a, b)
        dd, a, b = best
        ref_heights.append(dd)
        clusters[a] = clusters[a] | clusters[b]
        del clusters[b]
    got_heights = [h for (_a, _b, h, _n) in merges]
    assert np.allclose(sorted(got_heights), sorted(ref_heights), atol=1e-9)


def test_beta_pairs_planted_relatedness(spark):
    """Weir-Goudet beta semantics: duplicates -> beta near the maximum
    (M=1 numerator), unrelated pairs -> beta near 0 (their matching IS
    the sample average), parent-child in between — all WITHOUT allele
    frequencies entering the estimator."""
    import numpy as np

    from seqarray_spark.operators.ancestry import beta_pairs

    rng = np.random.default_rng(67)
    V = 2500
    p = rng.uniform(0.2, 0.8, V)

    def draw():
        return (rng.random(V) < p).astype(np.uint8) + (
            rng.random(V) < p
        ).astype(np.uint8)

    pa_h = np.stack(
        [(rng.random(V) < p), (rng.random(V) < p)]
    ).astype(np.uint8)
    ma_h = np.stack(
        [(rng.random(V) < p), (rng.random(V) < p)]
    ).astype(np.uint8)
    father = pa_h.sum(axis=0).astype(np.uint8)
    mother = ma_h.sum(axis=0).astype(np.uint8)
    child = (
        pa_h[rng.integers(0, 2, V), np.arange(V)]
        + ma_h[rng.integers(0, 2, V), np.arange(V)]
    ).astype(np.uint8)
    u1 = draw()
    bg = [draw() for _ in range(14)]
    codes = np.stack([u1, u1, father, mother, child] + bg, axis=1)
    sids = ["dupA", "dupB", "father", "mother", "child"] + [
        f"bg{i:02d}" for i in range(14)
    ]
    calls = _calls_from_codes(spark, codes, sids)
    out = {
        (r["sample_i"], r["sample_j"]): r["beta"]
        for r in beta_pairs(calls).collect()
    }
    dup = out[("dupA", "dupB")]
    pc = out[("child", "father")]
    unrel = out[("dupA", "father")]
    # beta estimates COANCESTRY (kinship) relative to the sample
    # average: duplicates theta = 1/2, parent-child 1/4, unrelated 0
    # (pairs of 'average' relatedness define the zero point)
    assert abs(dup - 0.5) < 0.06, dup
    assert abs(pc - 0.25) < 0.06, pc
    assert abs(unrel) < 0.1, unrel
    assert dup > pc > unrel
