"""Single-variant association tests and pedigree/duplicate QC — the
GWAS layer the reference ecosystem runs on SeqArray containers
(SeqVarTools regression/mendelErr/duplicateDiscordance; PLINK
--assoc/--model/--mendel are the same statistics over the same
genotype-class counts).

Every statistic here is a LINEAR per-variant (or per-pair/per-trio)
aggregation over the shared collapsed-alt dose substrate
(operators/ld._dose_once): one broadcast join against a small
sample-attribute frame (phenotype / trio / pair map — bounded by
n_samples rows, never shuffled wide) + one variant-keyed partial agg.
No pair blowup, no window functions — the plans scale like the AF
scan, not like the LD family.

Determinism contract (the value-hash gates): every input to a float
expression is an exact BIGINT sum of integers (genotype codes 0..2,
integer phenotypes, indicator counts), and the float trees are
spelled in the identical op order engine- and oracle-side, so the
statistics hash bit-identically. Chi-square STATISTICS are emitted,
not p-values — the chi2 survival function is not expressible in
portable SQL, and downstream tooling thresholds the statistic anyway
(PLINK prints both; the statistic is the deterministic half).

Reference parity notes: SeqArray itself delegates association to
SeqVarTools/GENESIS (the reference's vignette workflow); the
statistics implemented here are the classical single-variant tests
those packages compute per variant. Mendelian-error rules follow the
biallelic dosage table (PLINK --mendel codes collapsed to the
ref/alt dose universe; per-allele multiallelic codes are a documented
divergence, the same collapse the Fst/HWE/GRM stack uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from seqarray_spark.operators.ld import _DOSE_ALT_SQL, _dose_nn, _dose_once

_DNN_CTE_SQL = f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        )
"""


def case_control_assoc(
    calls: DataFrame,
    phenotypes: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """PLINK --assoc: per-variant allelic 2x2 chi-square + odds ratio.

    ``phenotypes``: (sample_id, is_case int 0/1) — broadcast (bounded
    by n_samples rows). Per variant the called alleles split into the
    case/control x alt/ref table a=case_ac, b=case_ref, c=ctrl_ac,
    r=ctrl_ref; the 1-df test statistic is
        chisq = N * (a*r - b*c)^2 / ((a+b)(c+r)(a+c)(b+r))
    NULL when any margin is zero (a group uncalled or the variant
    monomorphic over called samples — where PLINK prints NA), and
        odds_ratio = (a*r) / (b*c), NULL when b*c == 0.
    The cross product a*r - b*c is an exact BIGINT (|.| <= 4n^2);
    squaring and the margin product happen in DOUBLE in a fixed order
    shared with the oracle. Rows require both groups to have at least
    one called sample. Output: (variant_id, case_ac, case_an,
    ctrl_ac, ctrl_an, chisq_allelic, odds_ratio)."""
    d = _dose_nn(calls, assume_unique)
    ph = F.broadcast(
        phenotypes.select("sample_id", F.col("is_case").cast("int").alias("_cc"))
    )
    g = (
        d.join(ph, "sample_id")
        .groupBy("variant_id")
        .agg(
            F.sum(F.when(F.col("_cc") == 1, F.lit(2)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("case_an"),
            F.sum(F.when(F.col("_cc") == 1, F.col("d")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("case_ac"),
            F.sum(F.when(F.col("_cc") == 0, F.lit(2)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("ctrl_an"),
            F.sum(F.when(F.col("_cc") == 0, F.col("d")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("ctrl_ac"),
        )
        .where((F.col("case_an") > 0) & (F.col("ctrl_an") > 0))
    )
    a = F.col("case_ac")
    b = F.col("case_an") - F.col("case_ac")
    c = F.col("ctrl_ac")
    r = F.col("ctrl_an") - F.col("ctrl_ac")
    nn = (F.col("case_an") + F.col("ctrl_an")).cast("double")
    cross = (a * r - b * c).cast("double")
    denom = (
        (a + b).cast("double")
        * (c + r).cast("double")
        * (a + c).cast("double")
        * (b + r).cast("double")
    )
    chisq = F.when(
        (a + c > 0) & (b + r > 0), nn * cross * cross / denom
    )
    orat = F.when(
        b * c > 0, (a * r).cast("double") / (b * c).cast("double")
    )
    return (
        g.select(
            "variant_id",
            "case_ac",
            "case_an",
            "ctrl_ac",
            "ctrl_an",
            chisq.alias("chisq_allelic"),
            orat.alias("odds_ratio"),
        )
    )


def case_control_oracle_sql(pheno_sql: str) -> str:
    """DuckDB oracle twin of case_control_assoc. ``pheno_sql``: a
    SELECT yielding (sample_id, is_case) — spelled identically to the
    engine-side planting (the _parity_pops lockstep rule). Caller
    prepends oracle_prelude()."""
    return f"""{_DNN_CTE_SQL}
        , ph AS ({pheno_sql}
        ), g AS (
          SELECT d.variant_id,
                 CAST(SUM(CASE WHEN ph.is_case = 1 THEN 2 ELSE 0 END)
                      AS BIGINT) AS case_an,
                 CAST(SUM(CASE WHEN ph.is_case = 1 THEN d.d ELSE 0 END)
                      AS BIGINT) AS case_ac,
                 CAST(SUM(CASE WHEN ph.is_case = 0 THEN 2 ELSE 0 END)
                      AS BIGINT) AS ctrl_an,
                 CAST(SUM(CASE WHEN ph.is_case = 0 THEN d.d ELSE 0 END)
                      AS BIGINT) AS ctrl_ac
          FROM dnn d JOIN ph ON ph.sample_id = d.sample_id
          GROUP BY d.variant_id
          HAVING CAST(SUM(CASE WHEN ph.is_case = 1 THEN 2 ELSE 0 END)
                      AS BIGINT) > 0
             AND CAST(SUM(CASE WHEN ph.is_case = 0 THEN 2 ELSE 0 END)
                      AS BIGINT) > 0
        )
        SELECT variant_id, case_ac, case_an, ctrl_ac, ctrl_an,
               CASE WHEN case_ac + ctrl_ac > 0
                     AND (case_an - case_ac) + (ctrl_an - ctrl_ac) > 0
                    THEN CAST(case_an + ctrl_an AS DOUBLE)
                         * CAST(case_ac * (ctrl_an - ctrl_ac)
                                - (case_an - case_ac) * ctrl_ac AS DOUBLE)
                         * CAST(case_ac * (ctrl_an - ctrl_ac)
                                - (case_an - case_ac) * ctrl_ac AS DOUBLE)
                         / (CAST(case_an AS DOUBLE) * CAST(ctrl_an AS DOUBLE)
                            * CAST(case_ac + ctrl_ac AS DOUBLE)
                            * CAST((case_an - case_ac)
                                   + (ctrl_an - ctrl_ac) AS DOUBLE))
               END AS chisq_allelic,
               CASE WHEN (case_an - case_ac) * ctrl_ac > 0
                    THEN CAST(case_ac * (ctrl_an - ctrl_ac) AS DOUBLE)
                         / CAST((case_an - case_ac) * ctrl_ac AS DOUBLE)
               END AS odds_ratio
        FROM g
    """


def trend_assoc(
    calls: DataFrame,
    phenotypes: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """Cochran-Armitage trend test (PLINK --model TREND / the additive
    1-df GWAS screen), weights (0, 1, 2) on genotype classes.

    With per-variant case class counts (r0, r1, r2), control counts
    (s0, s1, s2), R = sum r, S = sum s, N = R + S, n_i = r_i + s_i:
        T    = (r1*S - s1*R) + 2*(r2*S - s2*R)        [exact BIGINT]
        VarN = R*S * (N*(n1 + 4*n2) - (n1 + 2*n2)^2)
        chisq_trend = T^2 * N / VarN
    (the N/N^2 normalization folded). T and VarN's INNER term are
    exact BIGINTs (|T| <= 2n^2, inner <= 6n^2 — safe to n ~ 1.2e9
    samples); the outer R*S*inner product would overflow int64 past
    n ~ 1.5e4, so it is taken in DOUBLE in a fixed op order shared
    with the oracle. NULL when VarN == 0
    (variant monomorphic over called samples or a group empty in the
    degenerate direction). Output: (variant_id, n_case, n_ctrl,
    chisq_trend)."""
    d = _dose_nn(calls, assume_unique)
    ph = F.broadcast(
        phenotypes.select("sample_id", F.col("is_case").cast("int").alias("_cc"))
    )
    cc = F.col("_cc")
    g = (
        d.join(ph, "sample_id")
        .groupBy("variant_id")
        .agg(
            F.sum(F.when((cc == 1) & (F.col("d") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("_r1"),
            F.sum(F.when((cc == 1) & (F.col("d") == 2), 1).otherwise(0))
            .cast("bigint")
            .alias("_r2"),
            F.sum(F.when((cc == 0) & (F.col("d") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("_s1"),
            F.sum(F.when((cc == 0) & (F.col("d") == 2), 1).otherwise(0))
            .cast("bigint")
            .alias("_s2"),
            F.sum(F.when(cc == 1, 1).otherwise(0)).cast("bigint").alias("_rr"),
            F.sum(F.when(cc == 0, 1).otherwise(0)).cast("bigint").alias("_ss"),
        )
        .where((F.col("_rr") > 0) & (F.col("_ss") > 0))
    )
    r1, r2 = F.col("_r1"), F.col("_r2")
    s1, s2 = F.col("_s1"), F.col("_s2")
    rr, ss = F.col("_rr"), F.col("_ss")
    nn = rr + ss
    n1 = r1 + s1
    n2 = r2 + s2
    t = (r1 * ss - s1 * rr) + F.lit(2) * (r2 * ss - s2 * rr)
    # inner term stays an exact BIGINT (<= 6n^2, safe to n ~ 1.2e9);
    # the OUTER product R*S*inner would overflow int64 past n ~ 1.5e4
    # samples (ANSI throw), so it is taken in DOUBLE in a fixed order
    # the oracle mirrors — the guard and the ratio see the same tree
    inner = nn * (n1 + F.lit(4) * n2) - (n1 + F.lit(2) * n2) * (
        n1 + F.lit(2) * n2
    )
    varn = rr.cast("double") * ss.cast("double") * inner.cast("double")
    chisq = F.when(
        varn > F.lit(0.0),
        t.cast("double") * t.cast("double") * nn.cast("double") / varn,
    )
    return (
        g.select(
            "variant_id",
            rr.alias("n_case"),
            ss.alias("n_ctrl"),
            chisq.alias("chisq_trend"),
        )
    )


def trend_oracle_sql(pheno_sql: str) -> str:
    """DuckDB oracle twin of trend_assoc (same pheno_sql lockstep rule
    as case_control_oracle_sql). Caller prepends oracle_prelude()."""
    return f"""{_DNN_CTE_SQL}
        , ph AS ({pheno_sql}
        ), g AS (
          SELECT d.variant_id,
                 CAST(SUM(CASE WHEN ph.is_case = 1 AND d.d = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS r1,
                 CAST(SUM(CASE WHEN ph.is_case = 1 AND d.d = 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS r2,
                 CAST(SUM(CASE WHEN ph.is_case = 0 AND d.d = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                 CAST(SUM(CASE WHEN ph.is_case = 0 AND d.d = 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN ph.is_case = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS rr,
                 CAST(SUM(CASE WHEN ph.is_case = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS ss
          FROM dnn d JOIN ph ON ph.sample_id = d.sample_id
          GROUP BY d.variant_id
          HAVING CAST(SUM(CASE WHEN ph.is_case = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) > 0
             AND CAST(SUM(CASE WHEN ph.is_case = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) > 0
        )
        SELECT variant_id, rr AS n_case, ss AS n_ctrl,
               CASE WHEN CAST(rr AS DOUBLE) * CAST(ss AS DOUBLE)
                         * CAST((rr + ss) * ((r1 + s1) + 4 * (r2 + s2))
                                - ((r1 + s1) + 2 * (r2 + s2))
                                  * ((r1 + s1) + 2 * (r2 + s2)) AS DOUBLE)
                         > 0.0
                    THEN CAST((r1 * ss - s1 * rr)
                              + 2 * (r2 * ss - s2 * rr) AS DOUBLE)
                         * CAST((r1 * ss - s1 * rr)
                                + 2 * (r2 * ss - s2 * rr) AS DOUBLE)
                         * CAST(rr + ss AS DOUBLE)
                         / (CAST(rr AS DOUBLE) * CAST(ss AS DOUBLE)
                            * CAST((rr + ss) * ((r1 + s1) + 4 * (r2 + s2))
                                   - ((r1 + s1) + 2 * (r2 + s2))
                                     * ((r1 + s1) + 2 * (r2 + s2))
                                   AS DOUBLE))
               END AS chisq_trend
        FROM g
    """


def _chi2x2(a, b, c, d):
    """Pearson chi-square Columns for a 2x2 (a,b / c,d) of BIGINT
    counts — NULL on any zero margin; the fixed-order float tree the
    oracles mirror."""
    nn = (a + b + c + d).cast("double")
    cross = (a * d - b * c).cast("double")
    denom = (
        (a + b).cast("double")
        * (c + d).cast("double")
        * (a + c).cast("double")
        * (b + d).cast("double")
    )
    return F.when(
        (a + b > 0) & (c + d > 0) & (a + c > 0) & (b + d > 0),
        nn * cross * cross / denom,
    )


def model_assoc(
    calls: DataFrame,
    phenotypes: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """PLINK --model: the genotypic (2 df), dominant, and recessive
    chi-squares from the same per-variant genotype-class counts as
    trend_assoc (one broadcast join + one variant agg — the three
    statistics are pure Column expressions over one shared agg, so
    asking for all of them costs the same scan as one).

    - chisq_geno: 2-df Pearson over the 2x3 (group x genotype-class)
      table, NULL when any CLASS margin is zero (where PLINK prints
      NA — expected counts hit zero);
    - chisq_dom: 2x2 collapsing carriers (d >= 1) vs non-carriers;
    - chisq_rec: 2x2 collapsing hom-alt (d = 2) vs rest;
    both NULL on zero margins. Rows require both groups called.
    Output: (variant_id, n_case, n_ctrl, chisq_geno, chisq_dom,
    chisq_rec)."""
    d = _dose_nn(calls, assume_unique)
    ph = F.broadcast(
        phenotypes.select("sample_id", F.col("is_case").cast("int").alias("_cc"))
    )
    cc = F.col("_cc")
    g = (
        d.join(ph, "sample_id")
        .groupBy("variant_id")
        .agg(
            *[
                F.sum(
                    F.when((cc == grp) & (F.col("d") == k), 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"_{'r' if grp else 's'}{k}")
                for grp in (1, 0)
                for k in (0, 1, 2)
            ]
        )
    )
    r0, r1, r2 = F.col("_r0"), F.col("_r1"), F.col("_r2")
    s0, s1, s2 = F.col("_s0"), F.col("_s1"), F.col("_s2")
    rr = r0 + r1 + r2
    ss = s0 + s1 + s2
    nn = (rr + ss).cast("double")

    def _term(obs, row, col):
        e = row.cast("double") * col.cast("double") / nn
        o = obs.cast("double")
        return (o - e) * (o - e) / e

    n0, n1, n2 = r0 + s0, r1 + s1, r2 + s2
    geno = F.when(
        (n0 > 0) & (n1 > 0) & (n2 > 0),
        _term(r0, rr, n0)
        + _term(r1, rr, n1)
        + _term(r2, rr, n2)
        + _term(s0, ss, n0)
        + _term(s1, ss, n1)
        + _term(s2, ss, n2),
    )
    dom = _chi2x2(r1 + r2, r0, s1 + s2, s0)
    rec = _chi2x2(r2, r0 + r1, s2, s0 + s1)
    return (
        g.where((rr > 0) & (ss > 0)).select(
            "variant_id",
            rr.alias("n_case"),
            ss.alias("n_ctrl"),
            geno.alias("chisq_geno"),
            dom.alias("chisq_dom"),
            rec.alias("chisq_rec"),
        )
    )


def model_oracle_sql(pheno_sql: str) -> str:
    """DuckDB oracle twin of model_assoc (same pheno_sql lockstep rule).
    Caller prepends oracle_prelude()."""

    def t(obs, row, col):
        return (
            f"(CAST({obs} AS DOUBLE)"
            f" - CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE)"
            f" / CAST(nr + ns AS DOUBLE))"
            f" * (CAST({obs} AS DOUBLE)"
            f" - CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE)"
            f" / CAST(nr + ns AS DOUBLE))"
            f" / (CAST({row} AS DOUBLE) * CAST({col} AS DOUBLE)"
            f" / CAST(nr + ns AS DOUBLE))"
        )

    def chi22(a, b, c, d):
        return (
            f"CASE WHEN ({a}) + ({b}) > 0 AND ({c}) + ({d}) > 0"
            f" AND ({a}) + ({c}) > 0 AND ({b}) + ({d}) > 0 THEN"
            f" CAST(({a}) + ({b}) + ({c}) + ({d}) AS DOUBLE)"
            f" * CAST(({a}) * ({d}) - ({b}) * ({c}) AS DOUBLE)"
            f" * CAST(({a}) * ({d}) - ({b}) * ({c}) AS DOUBLE)"
            f" / (CAST(({a}) + ({b}) AS DOUBLE)"
            f" * CAST(({c}) + ({d}) AS DOUBLE)"
            f" * CAST(({a}) + ({c}) AS DOUBLE)"
            f" * CAST(({b}) + ({d}) AS DOUBLE)) END"
        )

    geno_terms = " + ".join(
        [
            t("r0", "nr", "r0 + s0"),
            t("r1", "nr", "r1 + s1"),
            t("r2", "nr", "r2 + s2"),
            t("s0", "ns", "r0 + s0"),
            t("s1", "ns", "r1 + s1"),
            t("s2", "ns", "r2 + s2"),
        ]
    )
    return f"""{_DNN_CTE_SQL}
        , ph AS ({pheno_sql}
        ), g AS (
          SELECT d.variant_id,
                 CAST(SUM(CASE WHEN ph.is_case = 1 AND d.d = 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS r0,
                 CAST(SUM(CASE WHEN ph.is_case = 1 AND d.d = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS r1,
                 CAST(SUM(CASE WHEN ph.is_case = 1 AND d.d = 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS r2,
                 CAST(SUM(CASE WHEN ph.is_case = 0 AND d.d = 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS s0,
                 CAST(SUM(CASE WHEN ph.is_case = 0 AND d.d = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                 CAST(SUM(CASE WHEN ph.is_case = 0 AND d.d = 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS s2
          FROM dnn d JOIN ph ON ph.sample_id = d.sample_id
          GROUP BY d.variant_id
        ), m AS (
          SELECT variant_id, r0, r1, r2, s0, s1, s2,
                 r0 + r1 + r2 AS nr, s0 + s1 + s2 AS ns
          FROM g
          WHERE r0 + r1 + r2 > 0 AND s0 + s1 + s2 > 0
        )
        SELECT variant_id, nr AS n_case, ns AS n_ctrl,
               CASE WHEN r0 + s0 > 0 AND r1 + s1 > 0 AND r2 + s2 > 0
                    THEN {geno_terms} END AS chisq_geno,
               {chi22("r1 + r2", "r0", "s1 + s2", "s0")} AS chisq_dom,
               {chi22("r2", "r0 + r1", "s2", "s0 + s1")} AS chisq_rec
        FROM m
    """


def linear_assoc(
    calls: DataFrame,
    phenotypes: DataFrame,
    min_n: int = 3,
    assume_unique: bool = False,
) -> DataFrame:
    """Per-variant simple linear regression of a quantitative
    phenotype on ALT dosage (SeqVarTools regression(model.type=
    'linear') without covariates; the single-variant OLS screen):
        beta = Sxy / Sxx,  se = sqrt((Syy - beta*Sxy)/((n-2)*Sxx)),
        t_stat = beta / se
    over each variant's called samples, with the scaled moment sums
        Sxx = n*sum(d^2) - sum(d)^2   (and Sxy, Syy likewise)
    all exact BIGINTs — ``phenotypes`` must carry an INTEGER y (the
    planted gate phenotype is one; real users pre-quantize, the same
    grid rule every estimator here uses). Rows with Sxx == 0
    (monomorphic) are dropped; se/t NULL when the residual SS is <= 0
    (perfect fit — where the t statistic diverges). Output:
    (variant_id, n_used, beta, se, t_stat)."""
    if int(min_n) < 3:
        raise ValueError("min_n must be >= 3 (n-2 df)")
    d = _dose_nn(calls, assume_unique)
    ph = F.broadcast(
        phenotypes.select("sample_id", F.col("y").cast("bigint").alias("_y"))
    )
    g = (
        d.join(ph, "sample_id")
        .groupBy("variant_id")
        .agg(
            F.count(F.lit(1)).alias("n_used"),
            F.sum("d").cast("bigint").alias("_sx"),
            F.sum("_y").cast("bigint").alias("_sy"),
            F.sum(F.col("d") * F.col("_y")).cast("bigint").alias("_sxy"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("_sxx"),
            F.sum(F.col("_y") * F.col("_y")).cast("bigint").alias("_syy"),
        )
        .where(F.col("n_used") >= int(min_n))
    )
    n = F.col("n_used")
    sxx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    sxy = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    syy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    beta = sxy.cast("double") / sxx.cast("double")
    rss = syy.cast("double") - beta * sxy.cast("double")
    se = F.when(
        rss > F.lit(0.0),
        F.sqrt(rss / ((n.cast("double") - F.lit(2.0)) * sxx.cast("double"))),
    )
    return (
        g.where(sxx != 0).select(
            "variant_id",
            "n_used",
            beta.alias("beta"),
            se.alias("se"),
            (beta / se).alias("t_stat"),
        )
    )


def linear_oracle_sql(pheno_sql: str, min_n: int = 3) -> str:
    """DuckDB oracle twin of linear_assoc. ``pheno_sql``: SELECT
    yielding (sample_id, y) with INTEGER y, spelled identically to the
    engine planting. Caller prepends oracle_prelude()."""
    return f"""{_DNN_CTE_SQL}
        , ph AS ({pheno_sql}
        ), g AS (
          SELECT d.variant_id, COUNT(*) AS n_used,
                 CAST(SUM(d.d) AS BIGINT) AS sx,
                 CAST(SUM(ph.y) AS BIGINT) AS sy,
                 CAST(SUM(d.d * ph.y) AS BIGINT) AS sxy,
                 CAST(SUM(d.d * d.d) AS BIGINT) AS sxx,
                 CAST(SUM(ph.y * ph.y) AS BIGINT) AS syy
          FROM dnn d JOIN ph ON ph.sample_id = d.sample_id
          GROUP BY d.variant_id
          HAVING COUNT(*) >= {int(min_n)}
        ), m AS (
          SELECT variant_id, n_used,
                 n_used * sxx - sx * sx AS bxx,
                 n_used * sxy - sx * sy AS bxy,
                 n_used * syy - sy * sy AS byy
          FROM g
        ), b AS (
          SELECT variant_id, n_used, bxx, bxy, byy,
                 CAST(bxy AS DOUBLE) / CAST(bxx AS DOUBLE) AS beta
          FROM m WHERE bxx <> 0
        ), e AS (
          SELECT variant_id, n_used, beta,
                 CAST(byy AS DOUBLE) - beta * CAST(bxy AS DOUBLE) AS rss,
                 bxx
          FROM b
        )
        SELECT variant_id, n_used, beta,
               CASE WHEN rss > 0.0 THEN
                 sqrt(rss / ((CAST(n_used AS DOUBLE) - 2.0)
                             * CAST(bxx AS DOUBLE)))
               END AS se,
               CASE WHEN rss > 0.0 THEN
                 beta / sqrt(rss / ((CAST(n_used AS DOUBLE) - 2.0)
                                    * CAST(bxx AS DOUBLE)))
               END AS t_stat
        FROM e
    """


_MENDEL_ERR = (
    "(dc = 2 AND (df = 0 OR dm = 0)) "
    "OR (dc = 0 AND (df = 2 OR dm = 2)) "
    "OR (dc = 1 AND ((df = 0 AND dm = 0) OR (df = 2 AND dm = 2)))"
)


def mendel_errors(
    calls: DataFrame,
    trios: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """Per-variant Mendelian-inconsistency counts over trios
    (SeqVarTools mendelErr / PLINK --mendel / vcftools --mendel on the
    collapsed-alt dose table). ``trios``: (child_id, father_id,
    mother_id) — broadcast, bounded by n_samples rows.

    A trio observation requires all three doses called. The biallelic
    transmission table: a parent with dose 0 can only transmit ref, 2
    only alt, 1 either — so the inconsistent (child | father, mother)
    cells are exactly
        dc=2 with a dose-0 parent, dc=0 with a dose-2 parent,
        dc=1 with both parents 0 or both parents 2.
    Output: (variant_id, n_trios, n_errors) for variants with at least
    one fully-called trio. Plan: the dose relation joined to the trio
    map three ways — each join is variant-co-partitioned on the dose
    relation's own key (variant_id, sample_id), so the heavy side
    shuffles ONCE; the trio expansion is row-bounded by
    n_trios * n_variants."""
    d, release = _dose_once(calls, assume_unique)
    t = F.broadcast(
        trios.select(
            F.col("child_id").cast("string").alias("child_id"),
            F.col("father_id").cast("string").alias("father_id"),
            F.col("mother_id").cast("string").alias("mother_id"),
        )
    )
    dc = d.select(
        "variant_id", F.col("sample_id").alias("child_id"), F.col("d").alias("dc")
    )
    df_ = d.select(
        "variant_id",
        F.col("sample_id").alias("father_id"),
        F.col("d").alias("df"),
    )
    dm = d.select(
        "variant_id",
        F.col("sample_id").alias("mother_id"),
        F.col("d").alias("dm"),
    )
    j = (
        dc.join(t, "child_id")
        .join(df_, ["variant_id", "father_id"])
        .join(dm, ["variant_id", "mother_id"])
    )
    return release(
        j.groupBy("variant_id").agg(
            F.count(F.lit(1)).alias("n_trios"),
            F.sum(F.when(F.expr(_MENDEL_ERR), 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
        )
    )


def mendel_oracle_sql(trio_sql: str) -> str:
    """DuckDB oracle twin of mendel_errors. ``trio_sql``: SELECT
    yielding (child_id, father_id, mother_id), spelled identically to
    the engine planting. Caller prepends oracle_prelude()."""
    return f"""{_DNN_CTE_SQL}
        , trio AS ({trio_sql}
        ), j AS (
          SELECT c.variant_id, c.d AS dc, f.d AS df, m.d AS dm
          FROM trio
          JOIN dnn c ON c.sample_id = trio.child_id
          JOIN dnn f ON f.variant_id = c.variant_id
                    AND f.sample_id = trio.father_id
          JOIN dnn m ON m.variant_id = c.variant_id
                    AND m.sample_id = trio.mother_id
        )
        SELECT variant_id, COUNT(*) AS n_trios,
               CAST(SUM(CASE WHEN {_MENDEL_ERR} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors
        FROM j GROUP BY variant_id
    """


def duplicate_discordance(
    calls: DataFrame,
    pairs: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """Genotype discordance between duplicate-sample pairs
    (SeqVarTools duplicateDiscordance — the standard genotyping-QC
    concordance check). ``pairs``: (id_a, id_b) — broadcast.

    Per pair over variants where BOTH members are called:
    n_both, n_discord (dose disagreement), n_het_discord (disagreement
    where at least one side is het — the Ti/Tv-style subclass arrays
    report), discord_rate. Plan: the dose relation joined to itself
    through the pair map on (variant_id, partner) — one shuffle of the
    dose relation per side, output rows bounded by
    n_pairs * n_variants."""
    d, release = _dose_once(calls, assume_unique)
    p = F.broadcast(
        pairs.select(
            F.col("id_a").cast("string").alias("id_a"),
            F.col("id_b").cast("string").alias("id_b"),
        )
    )
    da = d.select(
        "variant_id", F.col("sample_id").alias("id_a"), F.col("d").alias("da")
    )
    db = d.select(
        "variant_id", F.col("sample_id").alias("id_b"), F.col("d").alias("db")
    )
    j = da.join(p, "id_a").join(db, ["variant_id", "id_b"])
    disc = F.when(F.col("da") != F.col("db"), 1).otherwise(0)
    het = F.when(
        (F.col("da") != F.col("db"))
        & ((F.col("da") == 1) | (F.col("db") == 1)),
        1,
    ).otherwise(0)
    g = j.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_both"),
        F.sum(disc).cast("bigint").alias("n_discord"),
        F.sum(het).cast("bigint").alias("n_het_discord"),
    )
    return release(
        g.select(
            "id_a",
            "id_b",
            "n_both",
            "n_discord",
            "n_het_discord",
            (
                F.col("n_discord").cast("double")
                / F.col("n_both").cast("double")
            ).alias("discord_rate"),
        )
    )


def duplicate_discordance_oracle_sql(pair_sql: str) -> str:
    """DuckDB oracle twin of duplicate_discordance. ``pair_sql``:
    SELECT yielding (id_a, id_b), spelled identically to the engine
    planting. Caller prepends oracle_prelude()."""
    return f"""{_DNN_CTE_SQL}
        , pr AS ({pair_sql}
        ), j AS (
          SELECT pr.id_a, pr.id_b, a.variant_id, a.d AS da, b.d AS db
          FROM pr
          JOIN dnn a ON a.sample_id = pr.id_a
          JOIN dnn b ON b.variant_id = a.variant_id
                    AND b.sample_id = pr.id_b
        ), g AS (
          SELECT id_a, id_b, COUNT(*) AS n_both,
                 CAST(SUM(CASE WHEN da <> db THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_discord,
                 CAST(SUM(CASE WHEN da <> db AND (da = 1 OR db = 1)
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_het_discord
          FROM j GROUP BY id_a, id_b
        )
        SELECT id_a, id_b, n_both, n_discord, n_het_discord,
               CAST(n_discord AS DOUBLE) / CAST(n_both AS DOUBLE)
                 AS discord_rate
        FROM g
    """


def diff_discordance(
    calls_a: DataFrame,
    calls_b: DataFrame,
    by: str = "site",
    assume_unique: bool = False,
) -> DataFrame:
    """Cross-callset genotype concordance — the vcftools --diff-site-
    discordance / --diff-indv-discordance pair (the standard QC when
    the same cohort is genotyped twice: array vs sequencing, two
    pipeline versions, two batches). SeqArray users run this through
    vcftools on exported VCFs; here it is one co-keyed join.

    Both inputs are calls frames over the SAME id universe (run
    merge.allele_harmonize first when panels disagree on strand/allele
    order — the gated pre-merge step). Per (variant, sample) cell
    called in BOTH sets, a discordance is any collapsed-dose
    disagreement. by='site' groups per variant (--diff-site), 
    by='sample' per sample (--diff-indv). Cells called in only one
    set are counted separately (n_only_a / n_only_b — vcftools'
    'files' column split).

    Plan: each side's dose dedup, then ONE full-outer co-keyed
    equi-join on (variant_id, sample_id) + one grouped agg — the join
    keys are the dose relations' own grouping keys, so at scale both
    sides arrive pre-shuffled from their dedup exchange and the join
    adds no extra wide movement. Output: (variant_id|sample_id,
    n_both, n_discord, n_only_a, n_only_b, discord_rate)."""
    if by not in ("site", "sample"):
        raise ValueError(f"unknown diff_discordance grouping {by!r}")
    da = _dose_nn(calls_a, assume_unique)
    db = _dose_nn(calls_b, assume_unique)
    j = da.select(
        "variant_id", "sample_id", F.col("d").alias("_da")
    ).join(
        db.select("variant_id", "sample_id", F.col("d").alias("_db")),
        ["variant_id", "sample_id"],
        "full_outer",
    )
    key = "variant_id" if by == "site" else "sample_id"
    both = F.col("_da").isNotNull() & F.col("_db").isNotNull()
    g = j.groupBy(key).agg(
        F.sum(both.cast("bigint")).alias("n_both"),
        F.sum((both & (F.col("_da") != F.col("_db"))).cast("bigint")).alias(
            "n_discord"
        ),
        F.sum(
            (F.col("_da").isNotNull() & F.col("_db").isNull()).cast("bigint")
        ).alias("n_only_a"),
        F.sum(
            (F.col("_da").isNull() & F.col("_db").isNotNull()).cast("bigint")
        ).alias("n_only_b"),
    )
    out = g.select(
        key,
        "n_both",
        "n_discord",
        "n_only_a",
        "n_only_b",
        F.when(
            F.col("n_both") > 0,
            F.col("n_discord").cast("double") / F.col("n_both").cast("double"),
        ).alias("discord_rate"),
    )
    return out


def diff_discordance_oracle_sql(calls_b_sql: str, by: str = "site") -> str:
    """DuckDB oracle twin of diff_discordance. ``calls_b_sql``: a
    SELECT yielding the B-side (variant_id, sample_id, a1, a2) —
    for the gate, the planted perturbation of gcalls (flip applied to
    the RAW a1/a2 before the dose dedup, exactly the engine's
    allele-level transform ordering). Caller prepends
    oracle_prelude()."""
    key = "variant_id" if by == "site" else "sample_id"
    return f"""{_DNN_CTE_SQL}
        , gcalls_b AS ({calls_b_sql}
        ), dose_b AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls_b GROUP BY variant_id, sample_id
        ), dnn_b AS (
          SELECT variant_id, sample_id, d FROM dose_b WHERE d IS NOT NULL
        ), dj AS (
          SELECT COALESCE(a.variant_id, b.variant_id) AS variant_id,
                 COALESCE(a.sample_id, b.sample_id) AS sample_id,
                 a.d AS da, b.d AS db
          FROM dnn a FULL OUTER JOIN dnn_b b
            ON b.variant_id = a.variant_id AND b.sample_id = a.sample_id
        ), dg AS (
          SELECT {key},
                 CAST(SUM(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
                 CAST(SUM(CASE WHEN da IS NOT NULL AND db IS NOT NULL
                               AND da <> db THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_discord,
                 CAST(SUM(CASE WHEN da IS NOT NULL AND db IS NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
                 CAST(SUM(CASE WHEN da IS NULL AND db IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b
          FROM dj GROUP BY {key}
        )
        SELECT {key}, n_both, n_discord, n_only_a, n_only_b,
               CASE WHEN n_both > 0
                    THEN CAST(n_discord AS DOUBLE) / CAST(n_both AS DOUBLE)
               END AS discord_rate
        FROM dg
    """
