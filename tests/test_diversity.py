"""pi / Tajima's D window tests: planted balancing-vs-directional
signatures, hand-computed pi, constant parity. The engine/oracle
float-tree parity is covered by the seq_pi_windows / seq_tajima_d
gates in tests/test_registry_sweep.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _frames(spark, geno_by_chrom, n_samples):
    """geno_by_chrom: {chrom: [per-variant list of per-sample dosages]}
    -> (calls, variants) frames; positions 1000*i within chromosome."""
    crows, vrows = [], []
    vid = 0
    for chrom, mat in geno_by_chrom.items():
        for i, doses in enumerate(mat):
            vid += 1
            vrows.append((vid, chrom, 1000 * (i + 1)))
            for s, d in enumerate(doses):
                al = (
                    [None, None]
                    if d is None
                    else [1 if d >= 1 else 0, 1 if d >= 2 else 0]
                )
                crows.append((vid, f"S{s:03d}", al))
    calls = spark.createDataFrame(
        crows, "variant_id long, sample_id string, alleles array<int>"
    )
    variants = spark.createDataFrame(
        vrows, "variant_id long, chromosome string, position int"
    )
    return calls, variants


def test_tajima_constants_match_definition():
    from seqarray_spark.operators.diversity import tajima_constants

    n = 10
    a1, a2, e1, e2 = tajima_constants(n)
    assert abs(a1 - sum(1.0 / i for i in range(1, n))) < 1e-12
    assert abs(a2 - sum(1.0 / (i * i) for i in range(1, n))) < 1e-12
    # published check values (Tajima 1989 worked example scale): for
    # n=10, a1=2.828968..., e1/e2 positive and small
    assert abs(a1 - 2.8289682539682537) < 1e-12
    assert 0 < e1 < 1 and 0 < e2 < 1
    import pytest

    with pytest.raises(ValueError):
        tajima_constants(3)


def test_pi_windows_hand_computed(spark):
    """One window, two variants, 4 samples: site pi exact against the
    Nei & Li formula, including a missing call and a monomorphic
    site's defined zero."""
    from seqarray_spark.operators.diversity import pi_windows

    geno = {
        # v1: doses 0,1,1,2 -> an=8, ac=4, pi = 2*4*4/(8*7) = 4/7
        # v2: doses 2,2,2,None -> an=6, ac=6, pi = 0 (monomorphic)
        "1": [[0, 1, 1, 2], [2, 2, 2, None]],
    }
    calls, variants = _frames(spark, geno, 4)
    rows = pi_windows(
        calls, variants, win_size=10_000, win_shift=10_000
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_variants"] == 2 and r["n_seg"] == 1
    assert abs(r["pi"] - (4.0 / 7.0) / 10_000) < 1e-9


def test_tajima_d_planted_sweep_signatures(spark):
    """Balancing selection (excess intermediate-frequency variants)
    -> D > 0; directional sweep (excess rare singletons) -> D < 0;
    neutral-ish frequency spectrum sits between. 20 samples, one
    window per chromosome."""
    import numpy as np

    from seqarray_spark.operators.diversity import tajima_d_windows

    S = 20
    rng = np.random.default_rng(41)
    bal, direc, neut = [], [], []
    for _ in range(60):
        # balancing: every variant at 50% alt frequency
        doses = [0] * (S // 2) + [2] * (S // 2)
        rng.shuffle(doses)
        bal.append(list(doses))
        # directional: singleton (one het carrier)
        d2 = [0] * S
        d2[int(rng.integers(0, S))] = 1
        direc.append(d2)
        # neutral: binomial at a random frequency
        p = float(rng.uniform(0.05, 0.95))
        neut.append(list(rng.binomial(2, p, S)))
    calls, variants = _frames(
        spark, {"bal": bal, "dir": direc, "neu": neut}, S
    )
    out = {
        r["chromosome"]: r
        for r in tajima_d_windows(
            calls, variants, win_size=100_000, win_shift=100_000
        ).collect()
    }
    assert set(out) == {"bal", "dir", "neu"}
    assert out["bal"]["n_seg"] == 60 and out["dir"]["n_seg"] == 60
    assert out["bal"]["tajima_d"] > 1.0, out["bal"]
    assert out["dir"]["tajima_d"] < -1.0, out["dir"]
    assert out["dir"]["tajima_d"] < out["neu"]["tajima_d"] < out["bal"]["tajima_d"]  # noqa: E501
    # theta_pi ordering matches the spectra: balancing max, sweep min
    assert out["bal"]["theta_pi"] > out["neu"]["theta_pi"] > out["dir"]["theta_pi"]  # noqa: E501


def test_tajima_d_null_when_no_segregating(spark):
    from seqarray_spark.operators.diversity import tajima_d_windows

    geno = {"1": [[2, 2, 2, 2], [0, 0, 0, 0]]}
    calls, variants = _frames(spark, geno, 4)
    rows = tajima_d_windows(
        calls, variants, win_size=10_000, win_shift=10_000
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_seg"] == 0 and rows[0]["tajima_d"] is None
    assert rows[0]["theta_pi"] == 0.0


def test_tstv_windows_classification(spark):
    """Hand-built sites: transitions {A<->G, C<->T} vs transversions;
    multiallelic / indel-ish / non-SNP rows excluded; inf -> NULL."""

    from seqarray_spark.operators.diversity import tstv_windows

    rows = [
        # (vid, chrom, pos, ref, alt list)
        (1, "1", 100, "A", ["G"]),    # ts
        (2, "1", 200, "C", ["T"]),    # ts
        (3, "1", 300, "A", ["C"]),    # tv
        (4, "1", 400, "G", ["T"]),    # tv
        (5, "1", 500, "A", ["G", "T"]),  # multiallelic: excluded
        (6, "1", 600, "AT", ["A"]),   # indel: excluded
        (7, "1", 700, "A", ["A"]),    # ref==alt: excluded
        (8, "2", 100, "T", ["C"]),    # ts, chrom 2 (no tv -> NULL)
    ]
    variants = spark.createDataFrame(
        rows,
        "variant_id long, chromosome string, position int, "
        "ref string, alt array<string>",
    )
    out = {
        (r["chromosome"], r["unit_start"]): r
        for r in tstv_windows(
            variants, win_size=1000, win_shift=1000
        ).collect()
    }
    w1 = out[("1", 0)]
    assert w1["n_ts"] == 2 and w1["n_tv"] == 2 and w1["tstv"] == 1.0
    w2 = out[("2", 0)]
    assert w2["n_ts"] == 1 and w2["n_tv"] == 0 and w2["tstv"] is None


def test_roh_runs_planted_blocks(spark):
    """Hand-built runs: het breaks a run, missing is skipped (neither
    breaks nor counts), min_sites filters, bp_len is inclusive."""
    from seqarray_spark.operators.diversity import roh_runs

    # sample S000: hom hom hom | het | hom hom
    # sample S001: hom miss hom hom | het | het
    geno = {
        "1": [
            [0, 2],      # pos 1000
            [2, None],   # pos 2000
            [0, 0],      # pos 3000
            [1, 2],      # pos 4000
            [2, 1],      # pos 5000
            [2, 1],      # pos 6000
        ],
    }
    calls, variants = _frames(spark, geno, 2)
    out = {
        (r["sample_id"], r["start_pos"]): r
        for r in roh_runs(calls, variants, min_sites=2).collect()
    }
    # S000: run 1 = pos 1000..3000 (3 sites), run 2 = 5000..6000 (2)
    r1 = out[("S000", 1000)]
    assert r1["end_pos"] == 3000 and r1["n_sites"] == 3
    assert r1["bp_len"] == 2001
    r2 = out[("S000", 5000)]
    assert r2["end_pos"] == 6000 and r2["n_sites"] == 2
    # S001: missing at 2000 skipped -> one run 1000..4000 (3 sites);
    # hets at 5000/6000 never appear in any run
    r3 = out[("S001", 1000)]
    assert r3["end_pos"] == 4000 and r3["n_sites"] == 3
    assert len(out) == 3
    # min_sites=4 drops everything except nothing (max run = 3)
    assert roh_runs(calls, variants, min_sites=4).count() == 0


def test_singletons_planted(spark):
    """S = one het carrier (ac=1); D = one hom-alt carrier (ac=2 in
    one sample); two carriers or common alleles never appear."""
    from seqarray_spark.operators.diversity import singletons

    geno = {
        "1": [
            [1, 0, 0, 0],   # S carried by S000
            [0, 0, 2, 0],   # D carried by S002
            [1, 1, 0, 0],   # two carriers: excluded
            [0, 2, 1, 0],   # ac=3 over two carriers: excluded
            [0, 0, 0, 0],   # monomorphic: excluded
            [None, 1, None, None],  # S with missing elsewhere
        ],
    }
    calls, variants = _frames(spark, geno, 4)
    rows = singletons(calls, variants).collect()
    got = {
        (r["variant_id"], r["singleton_type"], r["sample_id"])
        for r in rows
    }
    assert got == {
        (1, "S", "S000"),
        (2, "D", "S002"),
        (6, "S", "S001"),
    }
