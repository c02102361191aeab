"""Nucleotide-diversity and Tajima's D sliding windows — the
selection-scan companions to fst_wc_windows (vcftools --window-pi /
--TajimaD parity; the reference ecosystem runs these beside the
SNPRelate estimators on the same window grid,
seqUnitSlidingWindows R/UnitList.R:121-124).

Both statistics are linear per-window aggregations over per-variant
site stats, so they ride the seqUnitSlidingWindows membership join +
one (chromosome, window) partial agg — no wide shuffle beyond the
variant-keyed join, which broadcasts the window grid side at scale.

Determinism contract (the value-hash gate): per-site pi is quantized
to a half-up 1e-9 integer grid before the window sum (aggregation-
order-free BIGINTs, the fst_wc_windows pattern), and the Tajima
constants a1/a2 are built by an ASCENDING harmonic loop the oracle
replays as a recursive CTE — same op order, bit-identical doubles —
with every downstream constant (b1,b2,c1,c2,e1,e2) one shared
expression tree.

Site definition: collapsed-alt (ref vs any alt), the $dosage_alt
universe shared by the Fst/GRM/HWE stack — a documented divergence
from vcftools' per-allele multiallelic pi. Per-site pi uses the
site's OWN called-allele count an (missingness-aware); the D
constants use the cohort-wide n = 2 * n_samples, vcftools'
assumption (it warns under missingness; so do our docs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from seqarray_spark.operators.ld import _DOSE_ALT_SQL, _dose_nn, _dose_once
from seqarray_spark.operators.windows import sliding_windows

_GRID = 1_000_000_000.0


def variant_diversity(
    calls: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """Per-variant site-diversity stats over called alleles: an
    (called allele count), ac (alt allele count), pi_u (per-site
    heterozygosity 2*ac*(an-ac)/(an*(an-1)) on the half-up 1e-9
    integer grid — Nei & Li 1979, the vcftools --site-pi value), and
    seg (1 iff polymorphic among called). Sites with an < 2 are
    dropped (pi undefined)."""
    d = _dose_nn(calls, assume_unique)
    g = d.groupBy("variant_id").agg(
        (F.lit(2) * F.count(F.lit(1))).alias("an"),
        F.sum("d").alias("ac"),
    )
    pi = (
        F.lit(2.0)
        * F.col("ac")
        * (F.col("an") - F.col("ac"))
        / (F.col("an") * (F.col("an") - F.lit(1.0)))
        * F.lit(_GRID)
    )
    return (
        g.where(F.col("an") >= 2).select(
            "variant_id",
            "an",
            "ac",
            F.round(pi).cast("bigint").alias("pi_u"),
            F.when(
                (F.col("ac") > 0) & (F.col("ac") < F.col("an")), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("seg"),
        )
    )


def _window_site_agg(
    calls: DataFrame,
    variants: DataFrame,
    win_size: int,
    win_shift: int,
    win_start: int,
    assume_unique: bool,
) -> DataFrame:
    """(chromosome, window) sums of the per-variant site stats:
    n_variants (pi-defined sites), n_seg, s_pi (1e-9 units). Windows
    with no pi-defined variant are dropped (vcftools' bins-with-data
    output)."""
    pv = variant_diversity(calls, assume_unique=assume_unique)
    membership = sliding_windows(
        variants,
        win_size=win_size,
        win_shift=win_shift,
        win_start=win_start,
        dup_rm=False,
    ).where(F.col("variant_id").isNotNull())
    return (
        membership.join(pv, "variant_id")
        .groupBy("chromosome", "unit_start", "unit_end")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sum("seg").cast("bigint").alias("n_seg"),
            F.sum("pi_u").alias("_sp"),
        )
    )


def pi_windows(
    calls: DataFrame,
    variants: DataFrame,
    win_size: int = 100_000,
    win_shift: int = 50_000,
    win_start: int = 0,
    assume_unique: bool = False,
) -> DataFrame:
    """Sliding-window nucleotide diversity — vcftools --window-pi:
    pi = (sum of per-site pi over the window's variants) / win_size,
    monomorphic called sites contributing defined zeros. Output:
    (chromosome, unit_start, unit_end, n_variants, n_seg, pi)."""
    agg = _window_site_agg(
        calls, variants, win_size, win_shift, win_start, assume_unique
    )
    return agg.select(
        "chromosome",
        "unit_start",
        "unit_end",
        "n_variants",
        "n_seg",
        (
            F.col("_sp").cast("double")
            / F.lit(_GRID)
            / F.lit(float(win_size))
        ).alias("pi"),
    )


def tajima_constants(n_chr: int) -> tuple[float, float, float, float]:
    """(a1, a2, e1, e2) for Tajima's D at n_chr chromosomes (Tajima
    1989 eqs. 3-4; the vcftools output_tajima_d constant block).
    a1/a2 are ASCENDING harmonic partial sums — the SQL oracle
    replays the identical op order as a recursive CTE, so both
    engines hold bit-identical doubles."""
    n = int(n_chr)
    if n < 4:
        raise ValueError("Tajima's D needs >= 4 chromosomes (2 samples)")
    nf = float(n)
    a1 = 1.0
    a2 = 1.0
    for i in range(2, n):
        a1 = a1 + 1.0 / i
        a2 = a2 + 1.0 / (i * i)
    b1 = (nf + 1.0) / (3.0 * (nf - 1.0))
    b2 = 2.0 * (nf * nf + nf + 3.0) / (9.0 * nf * (nf - 1.0))
    c1 = b1 - 1.0 / a1
    c2 = b2 - (nf + 2.0) / (a1 * nf) + a2 / (a1 * a1)
    e1 = c1 / a1
    e2 = c2 / (a1 * a1 + a2)
    return a1, a2, e1, e2


def tajima_d_windows(
    calls: DataFrame,
    variants: DataFrame,
    win_size: int = 100_000,
    win_shift: int = 50_000,
    win_start: int = 0,
    n_chromosomes: int | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """Sliding-window Tajima's D — vcftools --TajimaD (generalized to
    an overlapping grid via win_shift): per window,

        D = (theta_pi - S/a1) / sqrt(e1*S + e2*S*(S-1))

    with S the window's segregating-site count, theta_pi the summed
    per-site pi, and a1/e1/e2 from the cohort chromosome count
    n = 2 * n_samples (vcftools' fixed-N assumption; per-site pi
    itself stays missingness-aware). D is NULL when S = 0 (vcftools'
    nan). Output: (chromosome, unit_start, unit_end, n_variants,
    n_seg, theta_pi, tajima_d)."""
    if n_chromosomes is None:
        n_chromosomes = 2 * calls.select("sample_id").distinct().count()
    a1, _a2, e1, e2 = tajima_constants(n_chromosomes)
    agg = _window_site_agg(
        calls, variants, win_size, win_shift, win_start, assume_unique
    )
    pi_f = F.col("_sp").cast("double") / F.lit(_GRID)
    sf = F.col("n_seg").cast("double")
    d = (pi_f - sf / F.lit(a1)) / F.sqrt(
        F.lit(e1) * sf + F.lit(e2) * sf * (sf - F.lit(1.0))
    )
    return agg.select(
        "chromosome",
        "unit_start",
        "unit_end",
        "n_variants",
        "n_seg",
        pi_f.alias("theta_pi"),
        F.when(F.col("n_seg") > 0, d).alias("tajima_d"),
    )


def _DIV_CTE_SQL(win_size: int, win_shift: int) -> str:
    """Shared oracle CTEs: dedup dose -> per-variant site stats on the
    1e-9 pi grid -> sliding-window membership -> window sums. The
    membership replay is the fst_wc_windows oracle's generate_series
    form (win_start=0)."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), pv AS (
          SELECT variant_id,
                 CAST(2 * COUNT(*) AS BIGINT) AS an,
                 CAST(SUM(d) AS BIGINT) AS ac
          FROM dnn GROUP BY variant_id
          HAVING 2 * COUNT(*) >= 2
        ), pvd AS (
          SELECT variant_id,
                 CAST(round(2.0 * ac * (an - ac) / (an * (an - 1.0))
                            * 1000000000.0) AS BIGINT) AS pi_u,
                 CASE WHEN ac > 0 AND ac < an THEN 1 ELSE 0 END AS seg
          FROM pv
        ), membership AS (
          SELECT chromosome,
                 CAST(k * {int(win_shift)} AS BIGINT) AS unit_start,
                 CAST(k * {int(win_shift)} + {int(win_size)} - 1 AS BIGINT)
                   AS unit_end,
                 variant_id
          FROM (
            SELECT chromosome, variant_id,
                   UNNEST(generate_series(
                     CAST(GREATEST(CEIL((position - {int(win_size)} + 1)
                                        / {int(win_shift)}.0), 0) AS BIGINT),
                     CAST(FLOOR(position / {int(win_shift)}.0) AS BIGINT)))
                     AS k
            FROM gvariants WHERE position >= 0
          ) t
        ), wagg AS (
          SELECT m.chromosome, m.unit_start, m.unit_end,
                 CAST(COUNT(*) AS BIGINT) AS n_variants,
                 CAST(SUM(p.seg) AS BIGINT) AS n_seg,
                 CAST(SUM(p.pi_u) AS BIGINT) AS sp
          FROM membership m JOIN pvd p ON p.variant_id = m.variant_id
          GROUP BY m.chromosome, m.unit_start, m.unit_end
        )"""


def pi_windows_oracle_sql(
    win_size: int = 100_000, win_shift: int = 50_000
) -> str:
    """DuckDB oracle twin of pi_windows."""
    return f"""{_DIV_CTE_SQL(win_size, win_shift)}
        SELECT chromosome, unit_start, unit_end, n_variants, n_seg,
               CAST(sp AS DOUBLE) / 1000000000.0 / {float(win_size)!r}
                 AS pi
        FROM wagg
    """


def tajima_d_oracle_sql(
    win_size: int = 100_000, win_shift: int = 50_000
) -> str:
    """DuckDB oracle twin of tajima_d_windows. The harmonic constants
    walk the SAME ascending op order as tajima_constants via a
    recursive CTE (caller must promote the prelude to WITH RECURSIVE,
    the unrelated_oracle_sql convention); every downstream constant
    is the identical expression tree, so D hash-matches."""
    return f"""{_DIV_CTE_SQL(win_size, win_shift)}
        , nchr AS (
          SELECT 2 * COUNT(DISTINCT sample_id) AS n FROM gcalls
        ), harm AS (
          -- CAST anchors to DOUBLE: a bare 1.0 is DECIMAL(2,1) in
          -- DuckDB and the whole recursion would run in decimal,
          -- diverging from the engine's float64 harmonic loop
          SELECT 1 AS i, CAST(1.0 AS DOUBLE) AS a1,
                 CAST(1.0 AS DOUBLE) AS a2
          UNION ALL
          SELECT i + 1,
                 a1 + CAST(1.0 AS DOUBLE) / (i + 1),
                 a2 + CAST(1.0 AS DOUBLE) / ((i + 1) * (i + 1))
          FROM harm WHERE i + 1 <= (SELECT n - 1 FROM nchr)
        ), hfin AS (
          SELECT a1, a2 FROM harm
          WHERE i = (SELECT n - 1 FROM nchr)
        ), tc1 AS (
          SELECT a1, a2, nf,
                 (nf + 1.0) / (3.0 * (nf - 1.0)) AS b1,
                 2.0 * (nf * nf + nf + 3.0) / (9.0 * nf * (nf - 1.0))
                   AS b2
          FROM (SELECT h.a1, h.a2, CAST(nc.n AS DOUBLE) AS nf
                FROM hfin h, nchr nc) x
        ), tc2 AS (
          SELECT a1, a2,
                 b1 - 1.0 / a1 AS c1,
                 b2 - (nf + 2.0) / (a1 * nf) + a2 / (a1 * a1) AS c2
          FROM tc1
        ), tc3 AS (
          SELECT a1, c1 / a1 AS e1, c2 / (a1 * a1 + a2) AS e2 FROM tc2
        )
        SELECT w.chromosome, w.unit_start, w.unit_end, w.n_variants,
               w.n_seg,
               CAST(w.sp AS DOUBLE) / 1000000000.0 AS theta_pi,
               CASE WHEN w.n_seg > 0 THEN
                 (CAST(w.sp AS DOUBLE) / 1000000000.0
                  - CAST(w.n_seg AS DOUBLE) / t.a1)
                 / sqrt(t.e1 * CAST(w.n_seg AS DOUBLE)
                        + t.e2 * CAST(w.n_seg AS DOUBLE)
                          * (CAST(w.n_seg AS DOUBLE) - 1.0))
               END AS tajima_d
        FROM wagg w, tc3 t
    """


_TS_SET = (("A", "G"), ("G", "A"), ("C", "T"), ("T", "C"))


def tstv_windows(
    variants: DataFrame,
    win_size: int = 100_000,
    win_shift: int = 50_000,
    win_start: int = 0,
) -> DataFrame:
    """Sliding-window transition/transversion ratio — vcftools --TsTv
    (generalized from fixed bins to the shared overlapping grid): a
    site counts iff it is a biallelic SNP (single-nucleotide ref AND
    single single-nucleotide alt, ref != alt); transitions are the
    purine-purine / pyrimidine-pyrimidine swaps {A<->G, C<->T}, all
    other substitutions transversions. The genome-wide expectation
    ~2-2.1 (random mutation would give 0.5) makes the windowed ratio a
    standard variant-calling QC scan. Pure variants-table op — one
    membership join + one (chromosome, window) agg, no calls scan.

    Output: (chromosome, unit_start, unit_end, n_ts, n_tv, tstv);
    tstv NULL where a window has no transversion (vcftools' inf)."""
    nucs = list("ACGT")
    a1 = F.element_at("alt", 1)
    snp = (
        (F.size("alt") == 1)
        & F.col("ref").isin(*nucs)
        & a1.isin(*nucs)
        & (F.col("ref") != a1)
    )
    is_ts = F.when(
        ((F.col("ref") == "A") & (a1 == "G"))
        | ((F.col("ref") == "G") & (a1 == "A"))
        | ((F.col("ref") == "C") & (a1 == "T"))
        | ((F.col("ref") == "T") & (a1 == "C")),
        F.lit(1),
    ).otherwise(F.lit(0))
    klass = variants.where(snp).select(
        "variant_id",
        is_ts.alias("_ts"),
        (F.lit(1) - is_ts).alias("_tv"),
    )
    membership = sliding_windows(
        variants,
        win_size=win_size,
        win_shift=win_shift,
        win_start=win_start,
        dup_rm=False,
    ).where(F.col("variant_id").isNotNull())
    agg = (
        membership.join(klass, "variant_id")
        .groupBy("chromosome", "unit_start", "unit_end")
        .agg(
            F.sum("_ts").cast("bigint").alias("n_ts"),
            F.sum("_tv").cast("bigint").alias("n_tv"),
        )
    )
    return agg.select(
        "chromosome",
        "unit_start",
        "unit_end",
        "n_ts",
        "n_tv",
        F.when(
            F.col("n_tv") > 0,
            F.col("n_ts").cast("double") / F.col("n_tv").cast("double"),
        ).alias("tstv"),
    )


def tstv_windows_oracle_sql(
    win_size: int = 100_000, win_shift: int = 50_000
) -> str:
    """DuckDB oracle twin of tstv_windows over the gvariants CTE
    (alt_str form: biallelic = no comma, single char)."""
    return f"""
        , tvk AS (
          SELECT variant_id,
                 CASE WHEN (ref = 'A' AND alt_str = 'G')
                        OR (ref = 'G' AND alt_str = 'A')
                        OR (ref = 'C' AND alt_str = 'T')
                        OR (ref = 'T' AND alt_str = 'C')
                      THEN 1 ELSE 0 END AS ts
          FROM gvariants
          WHERE ref IN ('A','C','G','T')
            AND alt_str IN ('A','C','G','T')
            AND ref <> alt_str
        ), tmembership AS (
          SELECT chromosome,
                 CAST(k * {int(win_shift)} AS BIGINT) AS unit_start,
                 CAST(k * {int(win_shift)} + {int(win_size)} - 1 AS BIGINT)
                   AS unit_end,
                 variant_id
          FROM (
            SELECT chromosome, variant_id,
                   UNNEST(generate_series(
                     CAST(GREATEST(CEIL((position - {int(win_size)} + 1)
                                        / {int(win_shift)}.0), 0) AS BIGINT),
                     CAST(FLOOR(position / {int(win_shift)}.0) AS BIGINT)))
                     AS k
            FROM gvariants WHERE position >= 0
          ) t
        ), twagg AS (
          SELECT m.chromosome, m.unit_start, m.unit_end,
                 CAST(SUM(v.ts) AS BIGINT) AS n_ts,
                 CAST(SUM(1 - v.ts) AS BIGINT) AS n_tv
          FROM tmembership m JOIN tvk v ON v.variant_id = m.variant_id
          GROUP BY m.chromosome, m.unit_start, m.unit_end
        )
        SELECT chromosome, unit_start, unit_end, n_ts, n_tv,
               CASE WHEN n_tv > 0
                    THEN CAST(n_ts AS DOUBLE) / CAST(n_tv AS DOUBLE)
               END AS tstv
        FROM twagg
    """


def roh_runs(
    calls: DataFrame,
    variants: DataFrame,
    min_sites: int = 3,
    assume_unique: bool = False,
) -> DataFrame:
    """Runs of homozygosity — the PLINK --homozyg / bcftools roh
    family's exact-scan core: per (sample, chromosome), maximal
    stretches of consecutive HOMOZYGOUS called sites (dose 0 or 2),
    broken by heterozygous calls; missing calls are skipped (they
    neither extend nor break a run — the deterministic simplification
    of PLINK's windowed-heuristic tolerance, documented divergence).
    ROH burden is the standard inbreeding/consanguinity QC scan
    (autozygosity mapping).

    Plan: one dose pass + variant-position join, then the
    gaps-and-islands pattern — a cumulative het-count window keyed
    (sample, chromosome) ordered (position, variant_id) assigns each
    homozygous site its run id, and one agg per run finishes it. The
    window partitions by (sample, chromosome), so parallelism is
    n_samples x n_chromosomes tasks of ~variants-per-chromosome rows —
    the layout's natural grain. Output: (sample_id, chromosome,
    start_pos, end_pos, n_sites, bp_len) for runs with >= min_sites
    homozygous sites."""
    from pyspark.sql import Window

    from seqarray_spark.operators.ld import _dose_nn

    d = _dose_nn(calls, assume_unique)
    pos = variants.select("variant_id", "chromosome", "position")
    dd = d.join(pos, "variant_id")
    w = (
        Window.partitionBy("sample_id", "chromosome")
        .orderBy("position", "variant_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    het = F.when(F.col("d") == 1, F.lit(1)).otherwise(F.lit(0))
    runs = (
        dd.select(
            "sample_id",
            "chromosome",
            "position",
            "d",
            F.sum(het).over(w).alias("_run"),
        )
        .where(F.col("d") != 1)
        .groupBy("sample_id", "chromosome", "_run")
        .agg(
            F.min("position").alias("start_pos"),
            F.max("position").alias("end_pos"),
            F.count(F.lit(1)).alias("n_sites"),
        )
        .where(F.col("n_sites") >= int(min_sites))
    )
    return (
        runs.select(
            "sample_id",
            "chromosome",
            "start_pos",
            "end_pos",
            "n_sites",
            (
                F.col("end_pos").cast("bigint")
                - F.col("start_pos").cast("bigint")
                + F.lit(1)
            ).alias("bp_len"),
        )
    )


def roh_oracle_sql(min_sites: int = 3) -> str:
    """DuckDB oracle twin of roh_runs over the gvariants/gcalls CTEs:
    the identical cumulative-het-count run assignment."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), rpos AS (
          SELECT n.sample_id, v.chromosome, v.position, n.d,
                 SUM(CASE WHEN n.d = 1 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY n.sample_id, v.chromosome
                   ORDER BY v.position, n.variant_id
                   ROWS UNBOUNDED PRECEDING) AS run_id
          FROM dnn n JOIN gvariants v ON v.variant_id = n.variant_id
        ), rgrp AS (
          SELECT sample_id, chromosome,
                 CAST(MIN(position) AS INT) AS start_pos,
                 CAST(MAX(position) AS INT) AS end_pos,
                 CAST(COUNT(*) AS BIGINT) AS n_sites
          FROM rpos WHERE d <> 1
          GROUP BY sample_id, chromosome, run_id
          HAVING COUNT(*) >= {int(min_sites)}
        )
        SELECT sample_id, chromosome, start_pos, end_pos, n_sites,
               CAST(end_pos AS BIGINT) - CAST(start_pos AS BIGINT) + 1
                 AS bp_len
        FROM rgrp
    """


def singletons(
    calls: DataFrame,
    variants: DataFrame,
    assume_unique: bool = False,
) -> DataFrame:
    """Singleton report — vcftools --singletons: for every variant
    whose alt allele is carried by exactly ONE sample, emit that
    carrier with the class 'S' (true singleton: ac = 1, one het) or
    'D' (private doubleton: ac = 2 in one homozygous-alt sample).
    The standard per-sample rare-variant burden / contamination QC
    listing. One dose pass, one variant agg, one join back to find
    the carrier — all linear.

    Output: (variant_id, chromosome, position, singleton_type,
    sample_id)."""
    from seqarray_spark.operators.ld import _dose_once

    d, release = _dose_once(calls, assume_unique)
    st = (
        d.groupBy("variant_id")
        .agg(
            F.sum("d").alias("_ac"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("_nc"),
        )
        .where(
            (F.col("_nc") == 1)
            & ((F.col("_ac") == 1) | (F.col("_ac") == 2))
        )
    )
    carrier = d.where(F.col("d") > 0).select(
        "variant_id", "sample_id", "d"
    )
    out = (
        st.join(carrier, "variant_id")
        .join(
            variants.select("variant_id", "chromosome", "position"),
            "variant_id",
        )
        .select(
            "variant_id",
            "chromosome",
            "position",
            F.when(F.col("_ac") == 1, F.lit("S"))
            .otherwise(F.lit("D"))
            .alias("singleton_type"),
            "sample_id",
        )
    )
    return release(out)


def singletons_oracle_sql(limit_samples: int | None = None) -> str:
    """DuckDB oracle twin of singletons over the gvariants/gcalls
    CTEs; `limit_samples` mirrors the gate's first-K-sorted panel."""
    plim = (
        """WHERE sample_id IN (
               SELECT sample_id
               FROM (SELECT DISTINCT sample_id FROM gcalls) u
               ORDER BY sample_id LIMIT %d)"""
        % int(limit_samples)
        if limit_samples
        else ""
    )
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM (
            SELECT variant_id, sample_id, d FROM dose
            WHERE d IS NOT NULL
          ) q {plim}
        ), sst AS (
          SELECT variant_id, CAST(SUM(d) AS BIGINT) AS ac
          FROM dnn GROUP BY variant_id
          HAVING SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) = 1
             AND (CAST(SUM(d) AS BIGINT) = 1
                  OR CAST(SUM(d) AS BIGINT) = 2)
        )
        SELECT s.variant_id, v.chromosome, v.position,
               CASE WHEN s.ac = 1 THEN 'S' ELSE 'D' END
                 AS singleton_type,
               c.sample_id
        FROM sst s
        JOIN dnn c ON c.variant_id = s.variant_id AND c.d > 0
        JOIN gvariants v ON v.variant_id = s.variant_id
    """


def snp_density(
    variants: DataFrame,
    win_size: int = 100_000,
    win_shift: int = 50_000,
    win_start: int = 0,
) -> DataFrame:
    """Variant density per sliding window (vcftools --SNPdensity
    generalized to the shared seqUnitSlidingWindows grid): window
    variant count and variants-per-kb. Pure variants-table plan (no
    calls scan) — one membership explode + one (chromosome, window)
    agg, the tstv_windows shape. Output: (chromosome, unit_start,
    unit_end, n_variants, per_kb)."""
    membership = sliding_windows(
        variants,
        win_size=win_size,
        win_shift=win_shift,
        win_start=win_start,
        dup_rm=False,
    ).where(F.col("variant_id").isNotNull())
    return (
        membership.groupBy("chromosome", "unit_start", "unit_end")
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .select(
            "chromosome",
            "unit_start",
            "unit_end",
            "n_variants",
            (
                F.col("n_variants").cast("double")
                / F.lit(float(win_size) / 1000.0)
            ).alias("per_kb"),
        )
    )


def snp_density_oracle_sql(
    win_size: int = 100_000, win_shift: int = 50_000
) -> str:
    """DuckDB oracle twin of snp_density over the gvariants CTE (the
    generate_series membership replay, win_start=0)."""
    return f"""
        , smembership AS (
          SELECT chromosome,
                 CAST(k * {int(win_shift)} AS BIGINT) AS unit_start,
                 CAST(k * {int(win_shift)} + {int(win_size)} - 1 AS BIGINT)
                   AS unit_end,
                 variant_id
          FROM (
            SELECT chromosome, variant_id,
                   UNNEST(generate_series(
                     CAST(GREATEST(CEIL((position - {int(win_size)} + 1)
                                        / {int(win_shift)}.0), 0) AS BIGINT),
                     CAST(FLOOR(position / {int(win_shift)}.0) AS BIGINT)))
                     AS k
            FROM gvariants WHERE position >= 0
          ) t
        )
        SELECT chromosome, unit_start, unit_end,
               CAST(COUNT(*) AS BIGINT) AS n_variants,
               CAST(COUNT(*) AS DOUBLE) / {float(win_size) / 1000.0!r}
                 AS per_kb
        FROM smembership
        GROUP BY chromosome, unit_start, unit_end
    """


def froh(
    calls: DataFrame,
    variants: DataFrame,
    samples: DataFrame,
    min_sites: int = 3,
    min_len: int = 0,
    assume_unique: bool = False,
) -> DataFrame:
    """Genomic inbreeding from ROH burden — F_ROH = (total bp in runs
    of homozygosity >= min_len) / assayed genome length (McQuillan
    2008; the consanguinity metric PLINK/bcftools pipelines derive
    from their --homozyg/roh output). Composes roh_runs; the assayed
    length is the spanned length sum over chromosomes of
    (max position - min position + 1) from the variants frame — the
    practical denominator when no capture manifest is present
    (documented; callers with one pass their own via post-division).

    Every sample in ``samples`` is reported (zero-ROH samples get
    froh = 0 — the value downstream consanguinity screens expect, not
    an absent row). Plan: the roh_runs window chain + one sample agg
    + a broadcast 1-row genome-length reduce (the beta_pairs M_B
    pattern). Output: (sample_id, n_roh, roh_bp, froh)."""
    runs = roh_runs(
        calls, variants, min_sites=min_sites, assume_unique=assume_unique
    ).where(F.col("bp_len") >= int(min_len))
    per = runs.groupBy("sample_id").agg(
        F.count(F.lit(1)).alias("n_roh"),
        F.sum("bp_len").cast("bigint").alias("roh_bp"),
    )
    glen = (
        variants.groupBy("chromosome")
        .agg(
            (
                F.max("position").cast("bigint")
                - F.min("position").cast("bigint")
                + F.lit(1)
            ).alias("_clen")
        )
        .agg(F.sum("_clen").cast("bigint").alias("_glen"))
    )
    return (
        samples.select("sample_id")
        .join(per, "sample_id", "left")
        .crossJoin(F.broadcast(glen))
        .select(
            "sample_id",
            F.coalesce("n_roh", F.lit(0)).cast("bigint").alias("n_roh"),
            F.coalesce("roh_bp", F.lit(0)).cast("bigint").alias("roh_bp"),
            (
                F.coalesce("roh_bp", F.lit(0)).cast("double")
                / F.col("_glen").cast("double")
            ).alias("froh"),
        )
    )


def froh_oracle_sql(min_sites: int = 3, min_len: int = 0) -> str:
    """DuckDB oracle twin of froh: the roh_runs CTE chain + the
    spanned-length genome denominator + a LEFT join keeping zero-ROH
    samples. Caller prepends oracle_prelude()."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), rpos AS (
          SELECT n.sample_id, v.chromosome, v.position, n.d,
                 SUM(CASE WHEN n.d = 1 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY n.sample_id, v.chromosome
                   ORDER BY v.position, n.variant_id
                   ROWS UNBOUNDED PRECEDING) AS run_id
          FROM dnn n JOIN gvariants v ON v.variant_id = n.variant_id
        ), rgrp AS (
          SELECT sample_id, chromosome,
                 CAST(MIN(position) AS BIGINT) AS rstart,
                 CAST(MAX(position) AS BIGINT) AS rend,
                 CAST(COUNT(*) AS BIGINT) AS n_sites
          FROM rpos WHERE d <> 1
          GROUP BY sample_id, chromosome, run_id
          HAVING COUNT(*) >= {int(min_sites)}
        ), rkeep AS (
          SELECT sample_id, rend - rstart + 1 AS run_bp
          FROM rgrp WHERE rend - rstart + 1 >= {int(min_len)}
        ), rper AS (
          SELECT sample_id, CAST(COUNT(*) AS BIGINT) AS n_roh,
                 CAST(SUM(run_bp) AS BIGINT) AS roh_bp
          FROM rkeep GROUP BY sample_id
        ), rglen AS (
          SELECT CAST(SUM(clen) AS BIGINT) AS glen_total FROM (
            SELECT CAST(MAX(position) AS BIGINT)
                   - CAST(MIN(position) AS BIGINT) + 1 AS clen
            FROM gvariants GROUP BY chromosome
          ) c
        )
        SELECT s.sample_id,
               CAST(COALESCE(rper.n_roh, 0) AS BIGINT) AS n_roh,
               CAST(COALESCE(rper.roh_bp, 0) AS BIGINT) AS roh_bp,
               CAST(COALESCE(rper.roh_bp, 0) AS DOUBLE)
                 / CAST(rglen.glen_total AS DOUBLE) AS froh
        FROM gsamples s
        LEFT JOIN rper ON rper.sample_id = s.sample_id
        CROSS JOIN rglen
    """
