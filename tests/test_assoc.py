"""Association/pedigree-QC tests: hand-computed chi-square/OR/OLS on
planted tables, the exhaustive 27-cell Mendelian truth table, LD-score
identity against ld_pairs. Engine/oracle float-tree parity is covered
by the seq_assoc_* / seq_mendel / seq_dup_discord / seq_ld_score gates
in tests/test_registry_sweep.py."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _calls(spark, mat):
    """mat: per-variant list of per-sample dosages (None = missing)."""
    rows = []
    for v, doses in enumerate(mat):
        for s, d in enumerate(doses):
            al = (
                [None, None]
                if d is None
                else [1 if d >= 1 else 0, 1 if d >= 2 else 0]
            )
            rows.append((v + 1, f"S{s}", al))
    return spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>"
    )


def test_case_control_hand_computed(spark):
    from seqarray_spark.operators.assoc import case_control_assoc

    # 6 samples: S0..S2 cases, S3..S5 controls
    # variant 1: cases (2,1,1)=4 alt of 6; controls (0,0,1)=1 alt of 6
    # variant 2: monomorphic alt=0 -> chisq NULL (zero alt margin)
    calls = _calls(spark, [[2, 1, 1, 0, 0, 1], [0, 0, 0, 0, 0, 0]])
    ph = spark.createDataFrame(
        [(f"S{i}", 1 if i < 3 else 0) for i in range(6)],
        "sample_id string, is_case int",
    )
    out = {
        r["variant_id"]: r
        for r in case_control_assoc(calls, ph).collect()
    }
    r1 = out[1]
    assert (r1["case_ac"], r1["case_an"]) == (4, 6)
    assert (r1["ctrl_ac"], r1["ctrl_an"]) == (1, 6)
    # chi2 = N (ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    a, b, c, d = 4, 2, 1, 5
    n = 12
    exp = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert abs(r1["chisq_allelic"] - exp) < 1e-12
    assert abs(r1["odds_ratio"] - (a * d) / (b * c)) < 1e-12
    assert out[2]["chisq_allelic"] is None
    assert out[2]["odds_ratio"] is None


def test_trend_hand_computed(spark):
    from seqarray_spark.operators.assoc import trend_assoc

    calls = _calls(spark, [[2, 1, 1, 0, 0, 1], [1, 1, 1, 1, 1, 1]])
    ph = spark.createDataFrame(
        [(f"S{i}", 1 if i < 3 else 0) for i in range(6)],
        "sample_id string, is_case int",
    )
    out = {r["variant_id"]: r for r in trend_assoc(calls, ph).collect()}
    # variant 1: cases (r0,r1,r2)=(0,2,1), controls (s0,s1,s2)=(2,1,0)
    r = np.array([0, 2, 1])
    s = np.array([2, 1, 0])
    w = np.array([0, 1, 2])
    rr, ss = r.sum(), s.sum()
    nn = rr + ss
    t = float((w * (r * ss - s * rr)).sum())
    ni = r + s
    exp = t * t * nn / (rr * ss * (nn * (w * w * ni).sum() - (w * ni).sum() ** 2))
    assert abs(out[1]["chisq_trend"] - exp) < 1e-12
    # all-het variant: every w*n term identical across groups -> VarN
    # = R*S*(N*n1 - n1^2) with n1=N -> 0 -> NULL
    assert out[2]["chisq_trend"] is None


def test_linear_matches_lstsq(spark):
    from seqarray_spark.operators.assoc import linear_assoc

    rng = np.random.default_rng(7)
    n = 40
    doses = rng.integers(0, 3, n).tolist()
    y = rng.integers(-5, 30, n).tolist()
    calls = _calls(spark, [doses])
    ph = spark.createDataFrame(
        [(f"S{i}", int(y[i])) for i in range(n)], "sample_id string, y long"
    )
    row = linear_assoc(calls, ph).collect()[0]
    x = np.array(doses, float)
    yy = np.array(y, float)
    xm = np.vstack([x, np.ones(n)]).T
    beta, icpt = np.linalg.lstsq(xm, yy, rcond=None)[0]
    resid = yy - (beta * x + icpt)
    se = float(
        np.sqrt(resid @ resid / (n - 2) / ((x - x.mean()) @ (x - x.mean())))
    )
    assert row["n_used"] == n
    assert abs(row["beta"] - beta) < 1e-9
    assert abs(row["se"] - se) < 1e-9
    assert abs(row["t_stat"] - beta / se) < 1e-7


def test_linear_guards(spark):
    from seqarray_spark.operators.assoc import linear_assoc

    calls = _calls(spark, [[1, 1, 1, 1], [0, 1, 2, 0]])
    ph = spark.createDataFrame(
        [(f"S{i}", i) for i in range(4)], "sample_id string, y long"
    )
    with pytest.raises(ValueError):
        linear_assoc(calls, ph, min_n=2)
    out = {r["variant_id"]: r for r in linear_assoc(calls, ph).collect()}
    assert 1 not in out  # monomorphic: Sxx == 0 dropped
    assert 2 in out


def test_mendel_truth_table(spark):
    """All 27 (child, father, mother) dose combinations, one variant
    each: the engine's error set must equal the set computed from
    first principles (child draws one allele from each parent)."""
    from seqarray_spark.operators.assoc import mendel_errors

    combos = [
        (dc, df, dm) for dc in (0, 1, 2) for df in (0, 1, 2) for dm in (0, 1, 2)
    ]
    # sample 0 = child, 1 = father, 2 = mother
    calls = _calls(spark, [[dc, df, dm] for (dc, df, dm) in combos])
    trios = spark.createDataFrame(
        [("S0", "S1", "S2")], "child_id string, father_id string, mother_id string"
    )
    out = {
        r["variant_id"]: (r["n_trios"], r["n_errors"])
        for r in mendel_errors(calls, trios).collect()
    }
    gametes = {0: {0}, 1: {0, 1}, 2: {1}}
    for v, (dc, df, dm) in enumerate(combos, start=1):
        possible = {a + b for a in gametes[df] for b in gametes[dm]}
        assert out[v] == (1, 0 if dc in possible else 1), (dc, df, dm)


def test_mendel_missing_skipped(spark):
    from seqarray_spark.operators.assoc import mendel_errors

    # father missing -> trio uncalled at that variant -> no row
    calls = _calls(spark, [[2, None, 0]])
    trios = spark.createDataFrame(
        [("S0", "S1", "S2")], "child_id string, father_id string, mother_id string"
    )
    assert mendel_errors(calls, trios).count() == 0


def test_dup_discordance_hand_computed(spark):
    from seqarray_spark.operators.assoc import duplicate_discordance

    # pair (S0,S1): v1 agree hom, v2 discord het-vs-hom, v3 S1 missing,
    # v4 discord hom-vs-hom (no het side)
    calls = _calls(spark, [[0, 0], [1, 2], [2, None], [0, 2]])
    pairs = spark.createDataFrame([("S0", "S1")], "id_a string, id_b string")
    r = duplicate_discordance(calls, pairs).collect()[0]
    assert (r["n_both"], r["n_discord"], r["n_het_discord"]) == (3, 2, 1)
    assert abs(r["discord_rate"] - 2 / 3) < 1e-12


def test_ld_score_identity(spark):
    """ldscore == 1 + quantized-sum of ld_pairs r2 per endpoint, and a
    no-neighbor variant scores exactly 1 with n_pairs 0."""
    from seqarray_spark.operators.ld import ld_pairs, ld_score

    rng = np.random.default_rng(3)
    mat = rng.integers(0, 3, (6, 20)).tolist()
    calls = _calls(spark, mat)
    variants = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 200), (3, "1", 300), (4, "1", 5000),
         (5, "2", 100), (6, "2", 150)],
        "variant_id long, chromosome string, position int",
    )
    w = 250
    scores = {
        r["variant_id"]: r for r in ld_score(variants, calls, bp_window=w).collect()
    }
    agg = {v: [0, 0] for v in range(1, 7)}
    for p in ld_pairs(variants, calls, bp_window=w).collect():
        if p["r2"] is None:
            continue
        q = round(p["r2"] * 1e9)
        for end in (p["va"], p["vb"]):
            agg[end][0] += 1
            agg[end][1] += q
    for v in range(1, 7):
        assert scores[v]["n_pairs"] == agg[v][0]
        assert abs(scores[v]["ldscore"] - (1.0 + agg[v][1] / 1e9)) < 1e-15
    assert scores[4]["n_pairs"] == 0 and scores[4]["ldscore"] == 1.0


def test_model_hand_computed(spark):
    from seqarray_spark.operators.assoc import model_assoc

    # cases S0-2: doses (0,1,2); controls S3-5: (0,0,1)
    calls = _calls(spark, [[0, 1, 2, 0, 0, 1], [1, 1, 1, 2, 2, 2]])
    ph = spark.createDataFrame(
        [(f"S{i}", 1 if i < 3 else 0) for i in range(6)],
        "sample_id string, is_case int",
    )
    out = {r["variant_id"]: r for r in model_assoc(calls, ph).collect()}
    r = np.array([1, 1, 1])
    s = np.array([2, 1, 0])
    ni = r + s
    rr, ss, nn = 3, 3, 6
    exp_geno = sum(
        (obs - grp * n / nn) ** 2 / (grp * n / nn)
        for grp, row in ((rr, r), (ss, s))
        for obs, n in zip(row, ni)
    )
    assert abs(out[1]["chisq_geno"] - exp_geno) < 1e-12

    def chi22(a, b, c, d):
        n = a + b + c + d
        return n * (a * d - b * c) ** 2 / (
            (a + b) * (c + d) * (a + c) * (b + d)
        )

    assert abs(out[1]["chisq_dom"] - chi22(2, 1, 1, 2)) < 1e-12
    assert abs(out[1]["chisq_rec"] - chi22(1, 2, 0, 3)) < 1e-12
    # variant 2: no dose-0 class anywhere -> 2-df NULL; dominant
    # margin (r0=s0=0) zero -> NULL; recessive defined
    assert out[2]["chisq_geno"] is None
    assert out[2]["chisq_dom"] is None
    assert abs(out[2]["chisq_rec"] - chi22(0, 3, 3, 0)) < 1e-12


def test_froh_planted(spark):
    """Two chromosomes; S0 has one 3-site run on chr1, S1 is all-het
    (zero ROH but still reported)."""
    from seqarray_spark.operators.diversity import froh

    mat = [[0, 1], [2, 1], [0, 1], [1, 1], [0, 1], [2, 1]]
    calls = _calls(spark, mat)
    variants = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 200), (3, "1", 300), (4, "1", 400),
         (5, "2", 50), (6, "2", 150)],
        "variant_id long, chromosome string, position int",
    )
    samples = spark.createDataFrame([("S0",), ("S1",)], "sample_id string")
    out = {r["sample_id"]: r for r in froh(calls, variants, samples).collect()}
    # genome length = (400-100+1) + (150-50+1) = 402
    assert (out["S0"]["n_roh"], out["S0"]["roh_bp"]) == (1, 201)
    assert abs(out["S0"]["froh"] - 201 / 402) < 1e-12
    assert (out["S1"]["n_roh"], out["S1"]["roh_bp"]) == (0, 0)
    assert out["S1"]["froh"] == 0.0
    # min_len filter drops the 201-bp run
    out2 = {
        r["sample_id"]: r
        for r in froh(calls, variants, samples, min_len=500).collect()
    }
    assert out2["S0"]["n_roh"] == 0


def test_snp_density_counts(spark):
    from seqarray_spark.operators.diversity import snp_density

    variants = spark.createDataFrame(
        [(1, "1", 10), (2, "1", 60), (3, "1", 110), (4, "2", 10)],
        "variant_id long, chromosome string, position int",
    )
    out = {
        (r["chromosome"], r["unit_start"]): r
        for r in snp_density(variants, win_size=100, win_shift=50).collect()
    }
    # chr1 window [0,99]: v1,v2; [50,149]: v2,v3; [100,199]: v3
    assert out[("1", 0)]["n_variants"] == 2
    assert abs(out[("1", 0)]["per_kb"] - 2 / 0.1) < 1e-12
    assert out[("1", 50)]["n_variants"] == 2
    assert out[("1", 100)]["n_variants"] == 1
    assert out[("2", 0)]["n_variants"] == 1


def test_ld_decay_identity(spark):
    """Per-bin mean_r2 equals the quantized mean over ld_pairs, and
    distances bin by floor(dist/bin_size)."""
    from seqarray_spark.operators.ld import ld_decay, ld_pairs

    rng = np.random.default_rng(11)
    mat = rng.integers(0, 3, (5, 24)).tolist()
    calls = _calls(spark, mat)
    variants = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 220), (3, "1", 460), (4, "1", 700),
         (5, "2", 40)],
        "variant_id long, chromosome string, position int",
    )
    pos = {1: 100, 2: 220, 3: 460, 4: 700, 5: 40}
    bins = {}
    for p in ld_pairs(variants, calls, bp_window=1000).collect():
        if p["r2"] is None:
            continue
        b = (pos[p["vb"]] - pos[p["va"]]) // 250
        n, s = bins.get(b, (0, 0))
        bins[b] = (n + 1, s + round(p["r2"] * 1e9))
    out = {
        r["dist_lo"] // 250: r
        for r in ld_decay(
            variants, calls, bp_window=1000, bin_size=250
        ).collect()
    }
    assert set(out) == set(bins)
    for b, (n, s) in bins.items():
        assert out[b]["n_pairs"] == n
        assert out[b]["dist_hi"] == out[b]["dist_lo"] + 249
        assert abs(out[b]["mean_r2"] - s / n / 1e9) < 1e-15


def test_inbreeding_mle_recompute_and_ordering(spark):
    """Engine EM equals a from-scratch Python replay of the cell
    definition, and a fully-homozygous sample's F exceeds an
    outbred-looking one's."""
    from seqarray_spark.operators.ld import inbreeding_mle

    rng = np.random.default_rng(5)
    n_var, n_s = 60, 8
    mat = rng.integers(0, 3, (n_var, n_s))
    mat[:, 0] = np.where(mat[:, 0] >= 1, 2, 0)  # S0: all homozygous
    calls = _calls(spark, mat.tolist())
    out = {
        r["sample_id"]: r
        for r in inbreeding_mle(calls, n_bins=64, em_iters=20).collect()
    }

    # independent replay from the raw matrix
    bf, grid, iters = 64.0, 1e9, 20
    p_by_var = mat.mean(axis=1) / 2.0
    pbin = np.floor(p_by_var * bf + 0.5)
    keep = (pbin > 0) & (pbin < bf)
    for s in range(n_s):
        cells = {}
        for v in range(n_var):
            if not keep[v]:
                continue
            key = (int(pbin[v]), int(mat[v, s]))
            cells[key] = cells.get(key, 0) + 1
        m = sum(cells.values())
        f = 1.0 / 3.0
        for _ in range(iters):
            tot = 0.0
            for (pb, cls), n in cells.items():
                p = pb / bf
                q = 1.0 - p
                a = (q, 0.0, p)[cls]
                b = (q * q, 2.0 * p * q, p * p)[cls]
                den = f * a + (1.0 - f) * b
                u = (
                    np.floor(f * a / den * grid + 0.5)
                    if den > 0.0
                    else np.floor(f * grid + 0.5)
                )
                tot += n * u
            f = tot / (grid * m)
        row = out[f"S{s}"]
        assert row["m_used"] == m
        assert abs(row["inb_f"] - f) < 1e-15, s
    assert out["S0"]["inb_f"] > 0.9
    assert out["S0"]["inb_f"] > max(
        out[f"S{s}"]["inb_f"] for s in range(1, n_s)
    )
    with pytest.raises(ValueError):
        inbreeding_mle(calls, n_bins=100)
    with pytest.raises(ValueError):
        inbreeding_mle(calls, em_iters=0)


def test_diff_discordance_hand_computed(spark):
    """Two callsets with planted disagreement/missingness: per-site
    and per-sample groupings, both only_* directions, rate NULL when
    nothing co-called."""
    from seqarray_spark.operators.assoc import diff_discordance

    # A: v1 (0,1), v2 (2,2), v3 (1,None), v4 (None,0)
    a = _calls(spark, [[0, 1], [2, 2], [1, None], [None, 0]])
    # B: v1 (0,2) -> one discord; v2 (None,2) -> only_a on S0;
    #    v3 (1,1) -> only_b on S1; v4 (None,0) -> same
    b = _calls(spark, [[0, 2], [None, 2], [1, 1], [None, 0]])
    site = {
        r["variant_id"]: r
        for r in diff_discordance(a, b, by="site").collect()
    }
    assert (site[1]["n_both"], site[1]["n_discord"]) == (2, 1)
    assert abs(site[1]["discord_rate"] - 0.5) < 1e-15
    assert (site[2]["n_both"], site[2]["n_only_a"]) == (1, 1)
    assert (site[3]["n_both"], site[3]["n_only_b"]) == (1, 1)
    assert (site[4]["n_both"], site[4]["n_discord"]) == (1, 0)
    smp = {
        r["sample_id"]: r
        for r in diff_discordance(a, b, by="sample").collect()
    }
    # S0: co-called v1,v3 (agree), A-only v2 -> (2, 0, 1, 0)
    assert (
        smp["S0"]["n_both"], smp["S0"]["n_discord"],
        smp["S0"]["n_only_a"], smp["S0"]["n_only_b"],
    ) == (2, 0, 1, 0)
    # S1: co-called v1 (discord), v2 (agree), v4 (agree); B-only v3
    assert (
        smp["S1"]["n_both"], smp["S1"]["n_discord"],
        smp["S1"]["n_only_b"],
    ) == (3, 1, 1)
    with pytest.raises(ValueError):
        diff_discordance(a, b, by="variant")
