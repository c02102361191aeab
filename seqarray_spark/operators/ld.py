"""Linkage-disequilibrium r² between nearby variant pairs — the
genomics complement of the LLM-pipeline dedup family (LD pruning is how
a 100 TB genotype matrix thins to an independent marker set before
PCA/GRM). Extension beyond the reference's own surface (SeqArray
delegates LD to SNPRelate's C kernels, declared out of scope in
SURVEY.md; this is the composite-dosage r² those kernels compute,
re-expressed as Spark Column algebra).

Numeric contract: every accumulated quantity is an INTEGER (dosages are
0/1/2; sums, cross-products and the r² numerator/denominator terms stay
BIGINT-exact), so the result is independent of partition/aggregation
order — the only float ops are the final two multiplies and one divide
over exactly-representable integers (|term| < 2^53 up to ~3e7 samples),
which are correctly-rounded IEEE in any engine. This is what makes the
operator value-hash comparable against a sequential SQL oracle.

Scale shape: one (variant, sample) pre-aggregation shuffle, one
groupBy(variant) vector-build shuffle, then a BINNED same-chromosome
self-join (each variant meets only its ±window neighbours — never a
cartesian) and a pure-Column fold over the zipped dosage maps. At
biobank width the per-variant map is ~n_samples entries; the packed
2-bit plane kernels (sources/packed.py) are the denser substrate if
this ever dominates — the join/bin topology stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seqarray_spark.functions.variant import dosage_alt


def _dose_map(calls: DataFrame) -> DataFrame:
    """Per-variant map<sample_id, dosage>: duplicate (variant, sample)
    observations (the calls frame is an observation log, not a matrix)
    collapse deterministically to MIN(dosage) — the 'best available'
    observation rule, mirrored verbatim in the oracle."""
    dose = calls.select(
        "variant_id",
        "sample_id",
        dosage_alt("alleles", partial_missing=False).alias("_d"),
    )
    per_vs = dose.groupBy("variant_id", "sample_id").agg(F.min("_d").alias("_d"))
    return per_vs.groupBy("variant_id").agg(
        F.map_from_entries(F.collect_list(F.struct("sample_id", "_d"))).alias("_dm")
    )


# Bitset-plane substrate cutover (r13 optimization): beyond this many
# samples the per-variant planes stop being a handful of BIGINT words
# and the unrolled popcount columns stop being a sane projection —
# fall back to the map-fold form (the packed mapInArrow kernels,
# ld_pairs_from_packed, are the production substrate at that width
# anyway, as documented since r10).
_PLANE_MAX_SAMPLES = 4096


def _stat_fields(stats: str):
    """The map-fold `fields` contribution list for each supported
    statistic family — used only by the wide-cohort fallback path;
    sums are identical to the popcount forms by construction."""
    if stats in ("moments", "moments_hom"):
        fields = [
            ("sx", lambda e: e["x"]),
            ("sy", lambda e: e["y"]),
            ("sxy", lambda e: e["x"] * e["y"]),
            ("sxx", lambda e: e["x"] * e["x"]),
            ("syy", lambda e: e["y"] * e["y"]),
        ]
        if stats == "moments_hom":
            fields += [
                ("hx", lambda e: (e["x"] == 2).cast("long")),
                ("hy", lambda e: (e["y"] == 2).cast("long")),
            ]
        return fields
    if stats == "cells":
        cell_of = {
            "n22": (2, 2), "n21": (2, 1), "n12": (1, 2), "n20": (2, 0),
            "n02": (0, 2), "n11": (1, 1), "n10": (1, 0), "n01": (0, 1),
            "n00": (0, 0),
        }
        return [
            (
                name,
                lambda e, xy=cell_of[name]: (
                    (e["x"] == xy[0]) & (e["y"] == xy[1])
                ).cast("long"),
            )
            for name in _EM_CELLS
        ]
    raise ValueError(f"unknown pair stats {stats!r}")


def _windowed_pair_sums(
    variants: DataFrame,
    calls: DataFrame,
    bp_window: int,
    stats: str,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Shared substrate for every windowed pairwise-LD statistic:
    the binned range self-join (side A keyed by floor(pos/W), side B
    exploded to {bin, bin-1} — a bounded-fanout equi-join, never a
    per-chromosome cross join), the (position, variant_id) pair
    ordering, and exact-integer per-pair sums. The ordering predicate
    and window bound here are LOAD-BEARING for oracle parity across
    ld_pairs / ld_pairs_em — one definition only (r12 review).

    `stats` selects the summed struct `_s` (always led by the
    co-observation count `n`): 'moments' (sx, sy, sxy, sxx, syy),
    'moments_hom' (+ hx, hy hom-ALT counts), 'cells' (the 3x3
    genotype table n22..n00).

    r13 optimization (guide §2.3/§4.1): up to _PLANE_MAX_SAMPLES the
    per-variant dosage state is THREE BIGINT bitset planes over a
    canonical sample-ordinal space — k (called), a (dose>=1),
    b (dose==2) — and every pair statistic is a short unrolled
    popcount expression (bit_count over ANDed words, the PLINK bitset
    trick), fully codegen-friendly. The previous map_zip_with +
    aggregate fold evaluated an interpreted lambda per co-observed
    sample per pair (~100x more interpreted work per pair; measured
    dominating the whole LD family at sf0.1 — 24-39s task-time stages
    collapse to popcounts). Every sum is the SAME exact integer as the
    fold's, so r2/D'/EM trees and the oracle value-hash contract are
    untouched. Wider cohorts fall back to the fold form
    (_windowed_pair_sums_maps); the packed kernels remain the
    documented production substrate at biobank width.

    ``sample_ids``: optional sample inventory for the ordinal space —
    any SUPERSET of the ids observed in ``calls`` is valid (plane bits
    are set only for observed samples, and every popcount sum is
    permutation- and padding-invariant), so callers with a cheap
    samples DIMENSION can skip this function's full-scan
    distinct+collect probe (guide §5: one driver job per LD query was
    pure inventory). A SUBSET would silently drop calls at the
    ordinal join — supersets only."""
    if sample_ids is None:
        ids = [
            r[0]
            for r in calls.select("sample_id").distinct().collect()
        ]
    else:
        ids = list(sample_ids)
    if len(ids) > _PLANE_MAX_SAMPLES:
        return _windowed_pair_sums_maps(
            variants, calls, bp_window, _stat_fields(stats)
        )
    ids.sort()
    n_words = max(1, (len(ids) + 63) // 64)
    spark = calls.sparkSession
    from seqarray_spark.plans.localrel import ordinal_frame

    ord_df = ordinal_frame(spark, ids)
    # dose dedup via the shared scan-layout-adaptive _dose_flat (r13
    # opt, guide §2.5): the previous inline groupBy ran its MIN
    # partial-agg inside the narrow scan stage — same fix, one helper
    per = (
        _dose_flat(calls)
        .where(F.col("d").isNotNull())
        .join(F.broadcast(ord_df), "sample_id")
    )
    # Compute-sized parallelism for the plane build (r13 opt, guide
    # §2.5): the planes agg's input bytes are tiny, so AQE coalesced its
    # exchange to ~3 partitions and the 3*n_words bit_or columns built
    # near-serially (measured 2.0s task time on 3 tasks at sf0.1).
    # Repartitioning on the grouping key provides the groupBy's required
    # distribution (exchange count unchanged), is not AQE-coalesced, and
    # bit_or is order-free — results identical.
    par = max(2, spark.sparkContext.defaultParallelism)
    per = per.repartition(par, "variant_id")
    aggs = []
    for wi in range(n_words):
        bit = F.expr(
            f"CASE WHEN __ord >= {wi * 64} AND __ord < {wi * 64 + 64} "
            f"THEN shiftleft(CAST(1 AS BIGINT), __ord - {wi * 64}) "
            "ELSE CAST(0 AS BIGINT) END"
        )
        zero = F.lit(0).cast("long")
        aggs.append(F.bit_or(bit).alias(f"_k{wi}"))
        aggs.append(
            F.bit_or(F.when(F.col("d") >= 1, bit).otherwise(zero)).alias(
                f"_a{wi}"
            )
        )
        aggs.append(
            F.bit_or(F.when(F.col("d") == 2, bit).otherwise(zero)).alias(
                f"_b{wi}"
            )
        )
    planes = per.groupBy("variant_id").agg(*aggs)

    plane_cols = [f"_{p}{wi}" for wi in range(n_words) for p in "kab"]
    w = int(bp_window)
    v = variants.select("variant_id", "chromosome", "position")
    va = (
        v.withColumn("_bin", F.floor(F.col("position") / w))
        .join(planes, "variant_id")
        .select(
            F.col("variant_id").alias("va"),
            F.col("chromosome").alias("_ch"),
            F.col("position").alias("_pa"),
            "_bin",
            *[F.col(c).alias(c + "x") for c in plane_cols],
        )
    )
    vb = v.select(
        F.col("variant_id").alias("vb"),
        F.col("chromosome").alias("_ch"),
        F.col("position").alias("_pb"),
        F.explode(
            F.array(
                F.floor(F.col("position") / w),
                F.floor(F.col("position") / w) - 1,
            )
        ).alias("_bin"),
    ).join(
        planes.select(
            F.col("variant_id").alias("vb"),
            *[F.col(c).alias(c + "y") for c in plane_cols],
        ),
        "vb",
    )
    pairs = va.join(vb, ["_ch", "_bin"]).where(
        (
            (F.col("_pb") > F.col("_pa"))
            | ((F.col("_pb") == F.col("_pa")) & (F.col("vb") > F.col("va")))
        )
        & (F.col("_pb") - F.col("_pa") <= F.lit(w))
    )

    def pc(p_x, p_y):
        """sum over words of popcount(plane_x & plane_y), as BIGINT."""
        e = None
        for wi in range(n_words):
            t = F.bit_count(
                F.col(f"_{p_x}{wi}x").bitwiseAND(F.col(f"_{p_y}{wi}y"))
            )
            e = t if e is None else (e + t)
        return e.cast("long")

    n = pc("k", "k")
    if stats in ("moments", "moments_hom"):
        a1k = pc("a", "k")
        a2k = pc("b", "k")
        b1k = None
        b2k = None
        # y-side planes against the x-side called mask
        for wi in range(n_words):
            t1 = F.bit_count(
                F.col(f"_a{wi}y").bitwiseAND(F.col(f"_k{wi}x"))
            )
            t2 = F.bit_count(
                F.col(f"_b{wi}y").bitwiseAND(F.col(f"_k{wi}x"))
            )
            b1k = t1 if b1k is None else (b1k + t1)
            b2k = t2 if b2k is None else (b2k + t2)
        b1k = b1k.cast("long")
        b2k = b2k.cast("long")
        p11 = pc("a", "a")
        p12 = pc("a", "b")
        p21 = pc("b", "a")
        p22 = pc("b", "b")
        members = [
            n.alias("n"),
            (a1k + a2k).alias("sx"),
            (b1k + b2k).alias("sy"),
            (p11 + p12 + p21 + p22).alias("sxy"),
            (a1k + F.lit(3) * a2k).alias("sxx"),
            (b1k + F.lit(3) * b2k).alias("syy"),
        ]
        if stats == "moments_hom":
            members += [a2k.alias("hx"), b2k.alias("hy")]
    else:  # cells
        # genotype-class planes: h2 = b, h1 = a & ~b, h0 = k & ~a
        def h(plane, side):
            out = []
            for wi in range(n_words):
                k_ = F.col(f"_k{wi}{side}")
                a_ = F.col(f"_a{wi}{side}")
                b_ = F.col(f"_b{wi}{side}")
                if plane == 2:
                    out.append(b_)
                elif plane == 1:
                    out.append(a_.bitwiseAND(F.bitwise_not(b_)))
                else:
                    out.append(k_.bitwiseAND(F.bitwise_not(a_)))
            return out

        hx = {p: h(p, "x") for p in (0, 1, 2)}
        hy = {p: h(p, "y") for p in (0, 1, 2)}

        def cell(px, py):
            e = None
            for wi in range(n_words):
                t = F.bit_count(hx[px][wi].bitwiseAND(hy[py][wi]))
                e = t if e is None else (e + t)
            return e.cast("long")

        members = [n.alias("n")] + [
            cell(int(name[1]), int(name[2])).alias(name)
            for name in _EM_CELLS
        ]

    # the pair build already holds both endpoints' positions — emit
    # them so distance consumers (ld_decay) need no re-join; projection
    # pruning drops them for everyone else (r13 opt, guide §2.4)
    return pairs.select(
        "va", "vb", "_pa", "_pb", F.struct(*members).alias("_s")
    )


def _windowed_pair_sums_maps(
    variants: DataFrame,
    calls: DataFrame,
    bp_window: int,
    fields,
) -> DataFrame:
    """Wide-cohort fallback pair substrate: the same binned range join
    and ordering predicate as _windowed_pair_sums, with per-pair sums
    from a map_zip_with fold over co-observed dosages. `fields` is
    [(name, contrib(e))] with e = struct(x, y) of the two BIGINT
    dosages; each contribution is BIGINT-summed into the output struct
    `_s` (plus the leading co-observation count `n`)."""
    w = int(bp_window)
    v = variants.select("variant_id", "chromosome", "position")
    dm = _dose_map(calls)
    va = (
        v.withColumn("_bin", F.floor(F.col("position") / w))
        .join(dm, "variant_id")
        .select(
            F.col("variant_id").alias("va"),
            F.col("chromosome").alias("_ch"),
            F.col("position").alias("_pa"),
            "_bin",
            F.col("_dm").alias("_ma"),
        )
    )
    vb = (
        v.select(
            F.col("variant_id").alias("vb"),
            F.col("chromosome").alias("_ch"),
            F.col("position").alias("_pb"),
            F.explode(
                F.array(
                    F.floor(F.col("position") / w),
                    F.floor(F.col("position") / w) - 1,
                )
            ).alias("_bin"),
        )
        .join(
            dm.select(F.col("variant_id").alias("vb"), F.col("_dm").alias("_mb")),
            "vb",
        )
    )
    pairs = va.join(vb, ["_ch", "_bin"]).where(
        (
            (F.col("_pb") > F.col("_pa"))
            | ((F.col("_pb") == F.col("_pa")) & (F.col("vb") > F.col("va")))
        )
        & (F.col("_pb") - F.col("_pa") <= F.lit(w))
    )
    # zip the two dosage maps on sample key; entries where either side
    # is unknown (missing call, or sample absent from one variant) fold
    # away
    zipped = F.map_values(
        F.map_zip_with(
            F.col("_ma"),
            F.col("_mb"),
            lambda k, x, y: F.when(
                x.isNotNull() & y.isNotNull(),
                F.struct(x.cast("long").alias("x"), y.cast("long").alias("y")),
            ),
        )
    )
    all_fields = [("n", lambda e: F.lit(1).cast("long"))] + list(fields)
    init = F.struct(
        *[F.lit(0).cast("long").alias(name) for name, _ in all_fields]
    )

    def _merge(acc, e):
        return F.when(e.isNull(), acc).otherwise(
            F.struct(
                *[
                    (acc[name] + contrib(e)).alias(name)
                    for name, contrib in all_fields
                ]
            )
        )

    return pairs.select(
        "va", "vb", "_pa", "_pb",
        F.aggregate(zipped, init, _merge).alias("_s"),
    )


def ld_pairs(
    variants: DataFrame,
    calls: DataFrame,
    bp_window: int = 50_000,
    min_n: int = 1,
    stat: str = "r2",
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Pairwise LD for every variant pair on the same chromosome within
    ``bp_window`` base pairs. Two statistics (SNPRelate's snpgdsLDMat
    exposes both; its 'composite' is the package default):

    stat='r2' (default): squared Pearson correlation of ALT-dosage —
    (va, vb, n_used, r2), NULL when either variant is monomorphic over
    the co-observed samples (zero variance — the reference kernels
    emit NaN there).

    stat='composite': Weir's composite digenic disequilibrium
    correlation (Weir 1996 §3; no phase needed):
        Delta = mean(x*y)/2 - 2*pA*pB          (= cov(x, y)/2)
        r_comp = Delta / sqrt((pA qA + D_A) * (pB qB + D_B))
    with D_A = P(hom-ALT) - pA^2 the within-locus Hardy-Weinberg
    disequilibrium. Since pq + D is exactly var(dosage)/2, r_comp is
    the SIGNED Pearson correlation of the genotype codes (r_comp^2 ==
    stat='r2' wherever both are defined — pinned by pytest); the sign
    is what score-based methods and SNPRelate's default method
    ('composite') report. Output (va, vb, n_used, ld_comp), NULL on a
    zero denominator (either locus monomorphic — the same rows where
    r2 is NULL). Every input to either float tree is an
    exact BIGINT sum, so both stats value-hash against the SQL oracle
    (gates seq_ld_pairs / seq_ld_composite); sqrt is IEEE
    correctly-rounded in both engines.

    Pairs with n_used < min_n are dropped. Pair generation is the
    standard binned range join: side A keyed by floor(pos/W), side B
    exploded to {bin, bin-1}, so each variant is compared against only
    its window neighbours — the plan contains a bounded-fanout
    equi-join, not a per-chromosome cross join."""
    if stat not in ("r2", "composite"):
        raise ValueError(f"unknown ld_pairs stat {stat!r}")
    if int(min_n) < 1:
        # at min_n=0 the engine would emit (va, vb, 0, NULL) rows for
        # pairs with zero co-observed samples, which the inner-join
        # oracle can never produce — keep the parity contract honest
        raise ValueError("min_n must be >= 1")
    s = _windowed_pair_sums(
        variants,
        calls,
        bp_window,
        "moments_hom" if stat == "composite" else "moments",
        sample_ids=sample_ids,
    )
    n = F.col("_s.n")
    if stat == "composite":
        nd = n.cast("double")
        p_a = F.col("_s.sx").cast("double") / (F.lit(2.0) * nd)
        p_b = F.col("_s.sy").cast("double") / (F.lit(2.0) * nd)
        d_a = F.col("_s.hx").cast("double") / nd - p_a * p_a
        d_b = F.col("_s.hy").cast("double") / nd - p_b * p_b
        var_a = p_a * (F.lit(1.0) - p_a) + d_a
        var_b = p_b * (F.lit(1.0) - p_b) + d_b
        delta = (
            (n * F.col("_s.sxy") - F.col("_s.sx") * F.col("_s.sy"))
            .cast("double")
            / (F.lit(2.0) * nd * nd)
        )
        denom2 = var_a * var_b
        comp = F.when(denom2 > F.lit(0.0), delta / F.sqrt(denom2))
        return (
            s.where(n >= int(min_n))
            .select("va", "vb", n.alias("n_used"), comp.alias("ld_comp"))
        )
    _, d1, d2, r2 = _r2_moment_exprs()
    return (
        s.where(n >= int(min_n))
        .select("va", "vb", n.alias("n_used"), r2.alias("r2"))
    )


def _r2_moment_exprs():
    """(n, d1, d2, r2) Column expressions over a `_s` moment struct —
    ONE definition of the r² float tree (oracle lockstep), shared by
    ld_pairs and the sums-level consumers (ld_score/ld_decay/ld_prune).
    Consumers that drop undefined-r² pairs should filter on the exact
    integer denominators (d1 != 0 AND d2 != 0 — precisely when r2 is
    non-NULL) BEFORE projecting r2: filtering on the r2 column itself
    makes the optimizer duplicate the whole popcount+float tree into
    the pushed-down predicate (measured 2.6x on the pair stage at
    sf0.1; guide §4.4's duplicated-evaluation trap, expression-level)."""
    n = F.col("_s.n")
    num = n * F.col("_s.sxy") - F.col("_s.sx") * F.col("_s.sy")
    d1 = n * F.col("_s.sxx") - F.col("_s.sx") * F.col("_s.sx")
    d2 = n * F.col("_s.syy") - F.col("_s.sy") * F.col("_s.sy")
    r2 = F.when(
        (d1 != 0) & (d2 != 0),
        (num.cast("double") * num.cast("double"))
        / (d1.cast("double") * d2.cast("double")),
    )
    return n, d1, d2, r2


# dosage-per-cell SQL for the two LD substrates: the long-format rule
# ('$dosage_alt': any missing slot -> NULL; duplicate observations
# collapse by MIN) and the packed column's rule (seqGet2bGeno
# '$dosage_alt2' codes: only fully-missing is missing; duplicates
# collapse by MAX of non-missing codes — sources/packed.py's writer and
# the seq_pack_genotypes oracle pin the same rule)
_DOSE_ALT_SQL = """MIN(CASE WHEN a1 IS NULL OR a2 IS NULL THEN NULL
                      ELSE (CASE WHEN a1 <> 0 THEN 1 ELSE 0 END)
                         + (CASE WHEN a2 <> 0 THEN 1 ELSE 0 END) END)"""
_DOSE_PACKED_SQL = """MAX(CASE WHEN a1 IS NULL AND a2 IS NULL THEN NULL
                      ELSE LEAST(2,
                        (CASE WHEN a1 IS NOT NULL AND a1 <> 0 THEN 1 ELSE 0 END)
                      + (CASE WHEN a2 IS NOT NULL AND a2 <> 0 THEN 1 ELSE 0 END))
                      END)"""


def _ld_ctes(bp_window: int, dose_sql: str = _DOSE_ALT_SQL) -> str:
    """Shared CTE chain (dose → pr → j → s) for the LD oracles. Sums
    CAST to BIGINT immediately — DuckDB SUM yields HUGEINT, whose float
    rendering drifts from int64 (the r9 doc_boilerplate lesson)."""
    w = int(bp_window)
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {dose_sql} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), pr AS (
          SELECT a.variant_id AS va, b.variant_id AS vb
          FROM gvariants a JOIN gvariants b
            ON a.chromosome = b.chromosome
           AND (b.position > a.position
                OR (b.position = a.position AND b.variant_id > a.variant_id))
           AND b.position - a.position <= {w}
        ), j AS (
          SELECT pr.va, pr.vb, x.d AS dx, y.d AS dy
          FROM pr JOIN dose x ON x.variant_id = pr.va
                  JOIN dose y ON y.variant_id = pr.vb
                             AND y.sample_id = x.sample_id
          WHERE x.d IS NOT NULL AND y.d IS NOT NULL
        ), s AS (
          SELECT va, vb, COUNT(*) AS n_used,
                 CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
                 CAST(SUM(dx * dy) AS BIGINT) AS sxy,
                 CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                 CAST(SUM(dy * dy) AS BIGINT) AS syy,
                 CAST(SUM(CASE WHEN dx = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hx,
                 CAST(SUM(CASE WHEN dy = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hy
          FROM j GROUP BY va, vb
        )
    """


_LD_R2_SQL = """CASE WHEN (n_used * sxx - sx * sx) <> 0
                     AND (n_used * syy - sy * sy) <> 0
                    THEN (CAST(n_used * sxy - sx * sy AS DOUBLE)
                          * CAST(n_used * sxy - sx * sy AS DOUBLE))
                         / (CAST(n_used * sxx - sx * sx AS DOUBLE)
                            * CAST(n_used * syy - sy * sy AS DOUBLE))
               END"""


def ld_pairs_oracle_sql(bp_window: int = 50_000, min_n: int = 1) -> str:
    """DuckDB oracle twin of ld_pairs over the gvariants/gcalls CTEs
    (caller prepends seqarray_spark.sources.testdata.oracle_prelude())."""
    return f"""{_ld_ctes(bp_window)}
        SELECT va, vb, n_used, {_LD_R2_SQL} AS r2
        FROM s WHERE n_used >= {int(min_n)}
    """


def ld_score(
    variants: DataFrame,
    calls: DataFrame,
    bp_window: int = 50_000,
    min_n: int = 1,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Per-variant LD score — l2(j) = 1 + sum of r^2 with every OTHER
    variant within ``bp_window`` bp on the same chromosome (the LDSC
    regression input, Bulik-Sullivan 2015; the reference ecosystem
    exports SeqArray genotypes into LDSC for exactly this). The +1 is
    the variant's own r^2 with itself — emitted for EVERY variant in
    the frame (a variant with no window neighbors scores exactly 1),
    which is what the regression weights expect.

    Composes the existing ld_pairs relation (binned range join, each
    pair owned once with va < vb in position order): each pair's
    defined r^2 is quantized to the half-up 1e-9 integer grid, summed
    into BOTH endpoints via an explode (no second pair build), then
    one variant-keyed agg — the established aggregation-order-free
    pattern, so the score value-hashes against the SQL oracle. Output:
    (variant_id, n_pairs, ldscore); n_pairs counts window neighbors
    with DEFINED r^2 (monomorphic partners contribute neither)."""
    if int(min_n) < 1:
        raise ValueError("min_n must be >= 1")
    # sums-level composition (r13): filter defined-r2 pairs on the exact
    # integer denominators and project r2 ONCE — see _r2_moment_exprs
    s = _windowed_pair_sums(
        variants, calls, bp_window, "moments", sample_ids=sample_ids
    )
    n, d1, d2, r2 = _r2_moment_exprs()
    r2u = F.round(r2 * F.lit(1e9)).cast("bigint")
    both = s.where((n >= int(min_n)) & (d1 != 0) & (d2 != 0)).select(
        F.explode(F.array("va", "vb")).alias("variant_id"),
        r2u.alias("_r2u"),
    )
    per = both.groupBy("variant_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_r2u").alias("_s"),
    )
    return (
        variants.select("variant_id")
        .join(per, "variant_id", "left")
        .select(
            "variant_id",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            (
                F.lit(1.0)
                + F.coalesce(F.col("_s"), F.lit(0)).cast("double")
                / F.lit(1e9)
            ).alias("ldscore"),
        )
    )


def ld_score_oracle_sql(bp_window: int = 50_000, min_n: int = 1) -> str:
    """DuckDB oracle twin of ld_score — the shared s CTE chain, r^2
    quantized to the 1e-9 grid, both-endpoint UNION ALL, LEFT join
    back to the full variant frame. Caller prepends oracle_prelude()."""
    return f"""{_ld_ctes(bp_window)}
        , r AS (
          SELECT va, vb,
                 CAST(round(({_LD_R2_SQL}) * 1000000000.0) AS BIGINT) AS r2u
          FROM s WHERE n_used >= {int(min_n)} AND ({_LD_R2_SQL}) IS NOT NULL
        ), u AS (
          SELECT va AS variant_id, r2u FROM r
          UNION ALL
          SELECT vb AS variant_id, r2u FROM r
        ), per AS (
          SELECT variant_id, COUNT(*) AS n_pairs,
                 CAST(SUM(r2u) AS BIGINT) AS sr
          FROM u GROUP BY variant_id
        )
        SELECT v.variant_id,
               COALESCE(per.n_pairs, 0) AS n_pairs,
               1.0 + CAST(COALESCE(per.sr, 0) AS DOUBLE) / 1000000000.0
                 AS ldscore
        FROM gvariants v LEFT JOIN per ON per.variant_id = v.variant_id
    """


def ld_decay(
    variants: DataFrame,
    calls: DataFrame,
    bp_window: int = 50_000,
    bin_size: int = 1_000,
    min_n: int = 1,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """LD decay curve — mean r^2 by pairwise-distance bin (the
    standard population-genetics decay plot; PopLDdecay / the
    plink --r2 post-aggregation). Composes the ld_pairs relation:
    each defined-r^2 pair's distance (pos_b - pos_a, non-negative by
    pair-ownership construction) is floored into ``bin_size`` bins,
    r^2 quantized to the half-up 1e-9 grid, then ONE tiny
    (n_bins-row) agg — so the curve is aggregation-order-free and
    value-hashes. The two position lookups join on the pair
    relation's own keys (broadcast at gate scale; co-partitioned
    equi-joins at cohort scale). Output: (dist_lo, dist_hi, n_pairs,
    mean_r2) per non-empty bin."""
    if int(min_n) < 1:
        raise ValueError("min_n must be >= 1")
    # sums-level composition (r13): defined-r2 filter on the integer
    # denominators, r2 projected once — see _r2_moment_exprs
    s = _windowed_pair_sums(
        variants, calls, bp_window, "moments", sample_ids=sample_ids
    )
    n, d1, d2, r2 = _r2_moment_exprs()
    # the substrate emits both endpoints' positions — no re-join needed
    # (r13 opt: two broadcast joins dropped; identical values, the join
    # keys were unique so row multiplicity is unchanged)
    j = pairs = s.where((n >= int(min_n)) & (d1 != 0) & (d2 != 0)).select(
        "va", "vb", "_pa", "_pb", r2.alias("r2")
    )
    b = F.floor(
        (F.col("_pb").cast("bigint") - F.col("_pa").cast("bigint"))
        / F.lit(int(bin_size))
    )
    # a distance bin can hold ~all pairs of a chromosome; at 100 TB
    # pair counts the 1e9-unit BIGINT sum would overflow int64 (ANSI
    # throw) — sum in DECIMAL(38,0) (the pca_corr precedent); the
    # double cast of the same exact integer matches the oracle's
    # HUGEINT-summed value bit-for-bit at any gate scale
    r2u = F.round(F.col("r2") * F.lit(1e9)).cast("decimal(38,0)")
    g = j.groupBy(b.alias("_bin")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(r2u).alias("_sr"),
    )
    return g.select(
        (F.col("_bin") * int(bin_size)).cast("bigint").alias("dist_lo"),
        (F.col("_bin") * int(bin_size) + int(bin_size) - 1)
        .cast("bigint")
        .alias("dist_hi"),
        "n_pairs",
        (
            F.col("_sr").cast("double")
            / F.col("n_pairs").cast("double")
            / F.lit(1e9)
        ).alias("mean_r2"),
    )


def ld_decay_oracle_sql(
    bp_window: int = 50_000, bin_size: int = 1_000, min_n: int = 1
) -> str:
    """DuckDB oracle twin of ld_decay — the shared s CTE chain plus
    position joins and the identical bin/mean tree. Caller prepends
    oracle_prelude()."""
    return f"""{_ld_ctes(bp_window)}
        , rr AS (
          SELECT s.va, s.vb,
                 CAST(round(({_LD_R2_SQL}) * 1000000000.0) AS BIGINT)
                   AS r2u,
                 CAST(pb.position AS BIGINT) - CAST(pa.position AS BIGINT)
                   AS dist
          FROM s
          JOIN gvariants pa ON pa.variant_id = s.va
          JOIN gvariants pb ON pb.variant_id = s.vb
          WHERE s.n_used >= {int(min_n)} AND ({_LD_R2_SQL}) IS NOT NULL
        ), gb AS (
          SELECT CAST(FLOOR(dist / {int(bin_size)}.0) AS BIGINT) AS dbin,
                 COUNT(*) AS n_pairs,
                 CAST(SUM(r2u) AS BIGINT) AS sr
          FROM rr GROUP BY CAST(FLOOR(dist / {int(bin_size)}.0) AS BIGINT)
        )
        SELECT CAST(dbin * {int(bin_size)} AS BIGINT) AS dist_lo,
               CAST(dbin * {int(bin_size)} + {int(bin_size)} - 1 AS BIGINT)
                 AS dist_hi,
               n_pairs,
               CAST(sr AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 1000000000.0
                 AS mean_r2
        FROM gb
    """


def ld_composite_oracle_sql(bp_window: int = 50_000, min_n: int = 1) -> str:
    """DuckDB oracle twin of ld_pairs(stat='composite') — the same s
    CTE chain, the identical Weir-composite float tree (sqrt is IEEE
    correctly-rounded in both engines, so the value-hash holds)."""
    p_a = "(CAST(sx AS DOUBLE) / (2.0 * CAST(n_used AS DOUBLE)))"
    p_b = "(CAST(sy AS DOUBLE) / (2.0 * CAST(n_used AS DOUBLE)))"
    d_a = f"(CAST(hx AS DOUBLE) / CAST(n_used AS DOUBLE) - {p_a} * {p_a})"
    d_b = f"(CAST(hy AS DOUBLE) / CAST(n_used AS DOUBLE) - {p_b} * {p_b})"
    var_a = f"({p_a} * (1.0 - {p_a}) + {d_a})"
    var_b = f"({p_b} * (1.0 - {p_b}) + {d_b})"
    delta = (
        "(CAST(n_used * sxy - sx * sy AS DOUBLE)"
        " / (2.0 * CAST(n_used AS DOUBLE) * CAST(n_used AS DOUBLE)))"
    )
    return f"""{_ld_ctes(bp_window)}
        SELECT va, vb, n_used,
               CASE WHEN {var_a} * {var_b} > 0.0
                    THEN {delta} / sqrt({var_a} * {var_b}) END AS ld_comp
        FROM s WHERE n_used >= {int(min_n)}
    """


def _greedy_kept_walk(n: int, pred, node):
    """The sequential greedy kept-set scan shared by
    ld_prune(method='greedy') (variant graph, per chromosome) and
    unrelated_samples (sample graph) — ONE kernel so the two walks
    cannot drift (VERDICT r12 item 5). Inputs are walk-position-coded
    int arrays: pair k blocks `node[k]` iff `pred[k]` is KEPT when
    node[k] is visited (walk order = ascending index). Pairs with
    pred >= node are ignored — a later-walking partner is never in the
    kept set when the node is visited (both producers emit
    earlier-side pred by construction; the filter makes it a
    contract). State is CSR int arrays, ~24 bytes/pair (measured in
    tools/prune_walk_stress.py at 10M nodes); nodes with NO incoming
    pair are kept without entering the Python loop, so the sequential
    cost is O(nodes with predecessors), not O(n).

    Returns a kept bool mask of length n."""
    import numpy as np

    kept = np.ones(n, dtype=bool)
    if n == 0 or len(node) == 0:
        return kept
    fwd = pred < node
    pred, node = pred[fwd], node[fwd]
    if len(node) == 0:
        return kept
    grp = np.argsort(node, kind="stable")
    nodes_s = node[grp]
    preds_s = pred[grp]
    bounds = np.searchsorted(nodes_s, np.arange(n + 1))
    with_preds = np.unique(nodes_s)
    kept[with_preds] = False  # decided sequentially below
    for j in with_preds:
        s, e = bounds[j], bounds[j + 1]
        if not kept[preds_s[s:e]].any():
            kept[j] = True
    return kept


def ld_prune(
    variants: DataFrame,
    calls: DataFrame | None,
    bp_window: int = 50_000,
    tau: float = 0.2,
    min_n: int = 1,
    pairs: DataFrame | None = None,
    method: str = "dominated",
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Windowed LD prune; return the kept variants. Two methods:

    method='dominated' (default): drop every variant whose r² with ANY
    earlier variant (in (position, variant_id) order, within
    ``bp_window``) exceeds ``tau`` — the embarrassingly-parallel rule:
    one anti-join over the ld_pairs relation, SQL-expressible, no
    sequential dependence. Strictly more aggressive than greedy
    (kept ⊆ greedy-kept), same purpose (an approximately-independent
    marker set).

    method='greedy' (r11, VERDICT r10 item 4): the PLINK
    --indep-pairwise / SNPRelate snpgdsLDpruning sequential semantics
    users port QC pipelines against — a variant is dropped only when
    it exceeds ``tau`` against a KEPT earlier variant, so a variant
    can survive because its correlate was itself dropped
    (reference ecosystem: SNPRelate R/LD.R snpgdsLDpruning's
    per-chromosome forward scan). The kept-set chain is inherently
    sequential PER CHROMOSOME; the expensive part (the r² pair
    relation) is still fully distributed, and the walk fans out one
    task per chromosome over only the >tau pair skeleton — bounded
    state: each task holds its chromosome's variant ids plus its
    strong pairs, not genotypes.

    ``pairs=`` accepts a precomputed (va, vb, n_used, r2) relation —
    e.g. ld_pairs_from_packed's output, so the pruning rides the
    packed substrate at biobank scale — instead of building one from
    ``calls``."""
    if method not in ("dominated", "greedy"):
        raise ValueError(f"unknown ld_prune method {method!r}")
    vv = variants.select("variant_id", "chromosome", "position")
    if pairs is None:
        if calls is None:
            raise ValueError("ld_prune needs calls= or pairs=")
        if int(min_n) < 1:
            raise ValueError("min_n must be >= 1")
        # sums-level build (r13): the >tau test runs over the integer
        # denominators + ONE r2 evaluation inside the filter — see
        # _r2_moment_exprs (NULL r2 never exceeds tau, so the d1/d2
        # guard preserves the exact row set)
        s = _windowed_pair_sums(
            variants, calls, bp_window, "moments", sample_ids=sample_ids
        )
        n, d1, d2, r2 = _r2_moment_exprs()
        strong = s.where(
            (n >= int(min_n)) & (d1 != 0) & (d2 != 0)
            & (r2 > float(tau))
        ).select("va", "vb")
    else:
        strong = pairs.where(F.col("r2") > float(tau)).select("va", "vb")
    if method == "dominated":
        dropped = strong.select(F.col("vb").alias("variant_id")).distinct()
        return vv.join(dropped, "variant_id", "left_anti")

    import pandas as pd

    # greedy: pairs are same-chromosome by construction (ld_pairs joins
    # on chromosome), so route each pair to its chromosome's walk task
    # via the vb endpoint
    vb_chrom = (
        variants.select(
            F.col("variant_id").alias("vb"),
            F.col("chromosome").alias("_vchrom"),
        )
    )
    strong_c = strong.join(vb_chrom, "vb").select(
        F.col("_vchrom").alias("chromosome"), "va", "vb"
    )

    def _walk(vpdf: "pd.DataFrame", ppdf: "pd.DataFrame") -> "pd.DataFrame":
        """The sequential kept-set scan, array-backed: a dict-of-sets
        predecessor index costs ~200+ bytes per strong pair in Python
        object overhead (multi-GB per task at 10M variants/chromosome,
        measured in tools/prune_walk_stress.py); here the skeleton is
        two position-coded int arrays grouped CSR-style, so task state
        is ~24 bytes/pair + the variant frame. Semantics are identical:
        a pair partner that walks LATER is never in `kept` when its vb
        is visited, and pairs referencing variants outside this
        chromosome's frame are dropped (they can never be kept)."""
        import numpy as np

        order = vpdf.sort_values(["position", "variant_id"])
        vids = order["variant_id"].to_numpy()
        n = len(vids)
        if n == 0 or len(ppdf) == 0:
            kept_mask = np.ones(n, dtype=bool)
            return order[kept_mask][["variant_id", "chromosome", "position"]]
        id_order = np.argsort(vids, kind="stable")
        ids_sorted = vids[id_order]

        def walk_pos(ids):
            """variant_id -> walk index; -1 when absent from the frame."""
            j = np.searchsorted(ids_sorted, ids)
            j_safe = np.minimum(j, n - 1)
            pos = id_order[j_safe]
            return np.where(ids_sorted[j_safe] == ids, pos, -1)

        va_pos = walk_pos(ppdf["va"].to_numpy())
        vb_pos = walk_pos(ppdf["vb"].to_numpy())
        good = (va_pos >= 0) & (vb_pos >= 0)
        kept = _greedy_kept_walk(n, va_pos[good], vb_pos[good])
        return order[kept][["variant_id", "chromosome", "position"]]

    # One walk task per chromosome needs the cogroup exchange to keep
    # >= n_chromosomes partitions — AQE coalesced the tiny exchange to 2
    # partitions, serializing ~11 chromosome walks per task (measured
    # 2.7s on 2 tasks at sf0.1; guide §2.5). Repartitioning both sides
    # on the cogroup key satisfies the distribution (no extra exchange)
    # and is immune to AQE coalescing; each chromosome's walk input is
    # unchanged.
    par = max(2, vv.sparkSession.sparkContext.defaultParallelism)
    return (
        vv.repartition(par, "chromosome")
        .groupBy("chromosome")
        .cogroup(strong_c.repartition(par, "chromosome").groupBy("chromosome"))
        .applyInPandas(
            _walk, schema="variant_id long, chromosome string, position int"
        )
    )


def ld_prune_oracle_sql(
    bp_window: int = 50_000, tau: float = 0.2, min_n: int = 1
) -> str:
    """DuckDB oracle twin of ld_prune (caller prepends oracle_prelude());
    shares the ld_pairs CTE chain and anti-joins the dominated variants."""
    return f"""{_ld_ctes(bp_window)}
        SELECT v.variant_id, v.chromosome, v.position
        FROM gvariants v
        WHERE v.variant_id NOT IN (
          SELECT vb FROM s
          WHERE n_used >= {int(min_n)} AND ({_LD_R2_SQL}) > {float(tau)!r}
        )
    """


def ld_prune_greedy_oracle_sql(
    bp_window: int = 50_000, tau: float = 0.2, min_n: int = 1
) -> str:
    """DuckDB oracle twin of ld_prune(method='greedy') — the sequential
    kept-set walk replayed as a RECURSIVE CTE: the walk state is one
    (chromosome, rn, kept-list) row per chromosome, advanced one
    position-ranked variant per iteration; a variant joins the kept
    list unless a >tau pair connects it to an already-kept earlier
    variant. Callers must prepend oracle_prelude() with its WITH
    upgraded to WITH RECURSIVE (DuckDB requires the keyword at the
    head of the whole CTE chain). Recursion depth = variants in the
    largest chromosome — gate-scale only, exactly the sequential
    dependence the distributed form confines to one task per
    chromosome."""
    return f"""{_ld_ctes(bp_window)}
        , strong AS (
          SELECT va, vb FROM s
          WHERE n_used >= {int(min_n)} AND ({_LD_R2_SQL}) > {float(tau)!r}
        ), ordv AS (
          SELECT variant_id, chromosome, position,
                 ROW_NUMBER() OVER (PARTITION BY chromosome
                                    ORDER BY position, variant_id) AS rn
          FROM gvariants
        ), walk AS (
          SELECT chromosome, rn, [variant_id] AS kept
          FROM ordv WHERE rn = 1
          UNION ALL
          SELECT v.chromosome, v.rn,
                 CASE WHEN EXISTS (
                        SELECT 1 FROM strong st
                        WHERE st.vb = v.variant_id
                          AND list_contains(w.kept, st.va))
                      THEN w.kept
                      ELSE list_append(w.kept, v.variant_id) END
          FROM walk w
          JOIN ordv v ON v.chromosome = w.chromosome AND v.rn = w.rn + 1
        ), fin AS (
          SELECT w.chromosome, UNNEST(w.kept) AS kv
          FROM walk w
          JOIN (SELECT chromosome, MAX(rn) AS mrn
                FROM walk GROUP BY chromosome) f
            ON w.chromosome = f.chromosome AND w.rn = f.mrn
        )
        SELECT v.variant_id, v.chromosome, v.position
        FROM fin JOIN gvariants v ON v.variant_id = fin.kv
    """


def _dose_flat(calls: DataFrame) -> DataFrame:
    """Deduped (variant_id, sample_id, d) dosage observations — the
    MIN-collapse rule shared with _dose_map, kept flat for the
    sample-pair operators.

    Scan-layout-adaptive spread (r13 opt, guide §2.5): when the input
    provides fewer partitions than the cluster has cores (the testdata
    parquet is a single row group — the whole scan stage is ONE task),
    the dedup's map-side partial aggregation runs single-threaded
    (measured ~0.9 s over 600k rows at sf0.1, the floor under every
    dose-shaped query). Hash-repartitioning on the grouping key BEFORE
    the groupBy replaces partial+final with a one-level agg at cluster
    parallelism: the exchange count is unchanged (the groupBy needed
    one anyway), the shuffled rows grow only by the input's duplicate
    factor (~7% here), and MIN is order-free so results are identical.
    On multi-split inputs (the 100 TB posture) the condition is false
    and the plan keeps its map-side partial aggregation."""
    dose = calls.select(
        "variant_id",
        "sample_id",
        dosage_alt("alleles", partial_missing=False).alias("_d"),
    )
    sc = calls.sparkSession.sparkContext
    try:
        scan_parts = dose.rdd.getNumPartitions()
    except Exception:
        scan_parts = sc.defaultParallelism
    if scan_parts < sc.defaultParallelism:
        dose = dose.repartition(
            sc.defaultParallelism, "variant_id", "sample_id"
        )
    return dose.groupBy("variant_id", "sample_id").agg(F.min("_d").alias("d"))


def _pair_table_sums(
    d: DataFrame,
    sample_ids: list[str],
    st: DataFrame | None = None,
    tables: tuple = (),
    consts: tuple = (),
    const_tables: dict | None = None,
    include_diag: bool = False,
    blocks: int | None = None,
) -> DataFrame:
    """Blocked exact kernel shared by the within-variant sample-pair
    estimators (grm_pairs / eigmix_pairs / beta_pairs) — r13
    optimization (guide §1.2 step 1: fix the distributed algorithm).

    The old shape self-joined the dose relation within each variant
    (r_v² rows per variant) and evaluated the per-(variant, pair)
    contribution tree across the blowup — measured 207s of task time at
    sf0.1 for grm_pairs alone, plus the dose pipeline built once per
    join branch. But every contribution these estimators sum depends
    only on (variant, x, y) with dosages x, y ∈ {0,1,2}: it is a
    per-variant 3×3 BIGINT table T_v, and the per-pair sum decomposes
    exactly into 9 integer matmuls over 0/1 indicator matrices
    I_x (variant × sample):

        S[i,j] = Σ_v T_v[x_vi, x_vj] = Σ_{x,y} I_xᵀ (T_·xy ∘ I_y)

    The tables stay computed IN SPARK with each operator's original
    expression tree (same IEEE ops, same HALF_UP rounding, reading the
    same per-variant doubles), so every summed integer is bit-identical
    to the self-join form's, and int64 sums are aggregation-order-free
    — the oracle contract is untouched. The variant axis is
    hash-blocked (deterministic xxhash64 — guide §2.5) so each task
    holds all of its variants' observations; per-block partial pair
    sums are summed by the caller's final (i, j) agg.

    Inputs: `d` = (variant_id, sample_id, d) deduped non-null dosages;
    `sample_ids` = the sorted id universe (ordinal order == the
    relations' lexicographic sample_i < sample_j pair order); `st` =
    per-variant table frame — inner semantics, restricting the variant
    set exactly like the old join through st. `tables` names 9-column
    groups f"{t}_{x}{y}" in st; `consts` names per-variant BIGINT
    columns summed once per co-observation ((x,y)-independent);
    `const_tables` maps a name to a driver-known variant-independent
    3×3 int table (no st needed). Output: per-block partial rows
    (_si, _sj, m_used, _s_{name}...) for pairs with m_used > 0 in the
    block — the caller aggregates, filters min_m, and attaches labels.

    Memory/scale: per task ~ (variants/blocks) × n_samples bytes of
    codes + the n² output — the same n² the pair relation itself is;
    the matmul substrate (grm_pairs_blas / *_from_packed) remains the
    documented production form at biobank n. An explicit bound check
    raises before any per-block int64 sum could wrap (the old ANSI
    BIGINT sums threw loudly too)."""
    import numpy as np
    import pandas as pd

    spark = d.sparkSession
    from seqarray_spark.plans.localrel import ordinal_frame

    n_samp = len(sample_ids)
    names = list(tables) + list(consts) + sorted(const_tables or {})
    out_schema = "_si int, _sj int, m_used long, " + ", ".join(
        f"_s_{t} long" for t in names
    )
    par = int(blocks) if blocks else max(
        2, spark.sparkContext.defaultParallelism
    )
    ord_df = ordinal_frame(spark, sample_ids, ord_col="_sid")
    dg = d.join(F.broadcast(ord_df), "sample_id").select(
        F.pmod(F.xxhash64("variant_id"), F.lit(par)).alias("_g"),
        "variant_id",
        "_sid",
        "d",
    )
    ct = {
        k: np.asarray(v, dtype=np.int64)
        for k, v in (const_tables or {}).items()
    }
    ktri = 0 if include_diag else 1
    tables = tuple(tables)
    consts = tuple(consts)

    def _empty() -> "pd.DataFrame":
        cols = {
            "_si": pd.Series(dtype="int32"),
            "_sj": pd.Series(dtype="int32"),
            "m_used": pd.Series(dtype="int64"),
        }
        for t in names:
            cols[f"_s_{t}"] = pd.Series(dtype="int64")
        return pd.DataFrame(cols)

    has_st = st is not None  # the closure must not capture the DataFrame

    def _block(st_pdf, d_pdf) -> "pd.DataFrame":
        if d_pdf is None or not len(d_pdf):
            return _empty()
        if has_st:
            if st_pdf is None or not len(st_pdf):
                return _empty()
            svids = st_pdf["_vid"].to_numpy()
            order = np.argsort(svids, kind="stable")
            st_pdf = st_pdf.iloc[order]
            svids = svids[order]
            dv = d_pdf["variant_id"].to_numpy()
            j = np.searchsorted(svids, dv)
            j_safe = np.minimum(j, len(svids) - 1)
            ok = svids[j_safe] == dv
            vrow = j_safe[ok]
            w = len(svids)
        else:
            dv = d_pdf["variant_id"].to_numpy()
            _, vrow = np.unique(dv, return_inverse=True)
            ok = slice(None)
            w = int(vrow.max()) + 1 if len(vrow) else 0
        if w == 0:
            return _empty()
        sid = d_pdf["_sid"].to_numpy()[ok]
        dd = d_pdf["d"].to_numpy()[ok].astype(np.int64)
        codes = np.full((w, n_samp), 3, dtype=np.int8)
        codes[vrow, sid] = dd
        ind = [(codes == x).astype(np.int64) for x in (0, 1, 2)]
        known = ind[0] + ind[1] + ind[2]
        res = {}
        for t in tables:
            tcols = [f"{t}_{x}{y}" for x in range(3) for y in range(3)]
            tt = st_pdf[tcols].to_numpy(dtype=np.int64)
            if np.abs(tt).max(initial=0) * w >= np.int64(1) << 62:
                raise OverflowError(
                    f"pair-table block sum for {t!r} could exceed int64"
                )
            s = np.zeros((n_samp, n_samp), np.int64)
            for x in range(3):
                for y in range(3):
                    col = tt[:, 3 * x + y]
                    s += ind[x].T @ (col[:, None] * ind[y])
            res[t] = s
        for t in consts:
            c = st_pdf[t].to_numpy(dtype=np.int64)
            if np.abs(c).max(initial=0) * w >= np.int64(1) << 62:
                raise OverflowError(
                    f"pair-table block sum for {t!r} could exceed int64"
                )
            res[t] = known.T @ (c[:, None] * known)
        for t, tt in ct.items():
            s = np.zeros((n_samp, n_samp), np.int64)
            for x in range(3):
                for y in range(3):
                    if tt[x, y]:
                        s += tt[x, y] * (ind[x].T @ ind[y])
            res[t] = s
        m = known.T @ known
        iu, ju = np.triu_indices(n_samp, k=ktri)
        keep = m[iu, ju] > 0
        iu, ju = iu[keep], ju[keep]
        out = {
            "_si": iu.astype(np.int32),
            "_sj": ju.astype(np.int32),
            "m_used": m[iu, ju],
        }
        for t in names:
            out[f"_s_{t}"] = res[t][iu, ju]
        return pd.DataFrame(out)

    # Compute-sized parallelism for the kernel (guide §2.5 "small
    # bytes, heavy downstream work"): the cogroup/groupBy exchange
    # carries only ~MBs, so AQE coalesced it to a handful of tasks and
    # each ran many blocks' matmuls serially (measured: the kernel
    # stage at 4 tasks was the largest wall chunk of grm/eigmix).
    # An explicit repartition on the SAME key provides the required
    # distribution (no extra exchange) and is not AQE-coalescible;
    # block membership and every per-block sum are unchanged.
    dg = dg.repartition(par, "_g")
    if st is None:
        return dg.groupBy("_g").applyInPandas(
            lambda pdf: _block(None, pdf), schema=out_schema
        )
    # alias every st column (fresh attribute ids): st usually derives
    # from d itself, and the cogroup of two lineages sharing attribute
    # ids trips the ambiguous-self-join analyzer check
    stg = st.select(
        F.pmod(F.xxhash64("variant_id"), F.lit(par)).alias("_g"),
        F.col("variant_id").alias("_vid"),
        *[F.col(c).alias(c) for c in st.columns if c != "variant_id"],
    ).repartition(par, "_g")
    return (
        dg.groupBy("_g")
        .cogroup(stg.groupBy("_g"))
        .applyInPandas(
            lambda left, right: _block(right, left), schema=out_schema
        )
    )


def _spread_pairs(partials: DataFrame, *keys: str) -> DataFrame:
    """Compute-sized parallelism for a final pair-keyed agg (guide
    §2.5 "small bytes, heavy downstream work"): kernel partials are a
    few MB, so AQE coalesces the agg's exchange to 1-2 tasks while the
    agg plus the per-pair float trees run over up-to-n²/2 rows
    (measured: king's final agg ran 0.84 s on ONE task). A same-key
    repartition provides the groupBy's required distribution (exchange
    count unchanged), is not AQE-coalescible, and every sum here is
    order-free — results identical."""
    sc = partials.sparkSession.sparkContext
    return partials.repartition(
        max(2, sc.defaultParallelism), *(keys or ("_si", "_sj"))
    )


def grm_pairs(
    calls: DataFrame,
    min_m: int = 1,
    unit_scale: int = 6,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """GCTA-style genetic-relationship estimates for every sample pair:
    A_jk = (1/m) * sum_i (x_ij - 2p_i)(x_ik - 2p_i) / (2 p_i (1 - p_i))
    over the m variants where BOTH samples have a known dosage and the
    variant is polymorphic (0 < p_i < 1). Off-diagonal only (j < k) —
    the relatedness screen upstream of PCA/mixed models (SNPRelate's
    snpgdsGRM computes the same estimator in C; SeqArray delegates).

    Numeric contract: per-(variant, pair) contributions are computed
    from exact-integer inputs (dosages, allele-count sums) through a
    fixed expression tree of correctly-rounded IEEE ops, then QUANTIZED
    to integer 10^-unit_scale units and BIGINT-summed — so the per-pair
    total is aggregation-order-free (the DSIR micro-nat rule; raw
    double sums would hash-diverge from a sequential oracle).

    Scale shape (r13 opt — see _pair_table_sums): one dedup groupBy
    over calls, one per-variant agg computing the 3×3 quantized
    contribution TABLE (each entry the ORIGINAL per-row expression tree
    evaluated at a literal dosage pair, so every integer is
    bit-identical to the old self-join form's), then the blocked
    indicator-matmul kernel + one (i, j)-keyed agg. The r_v² self-join
    blowup this replaces cost 207s of task time at sf0.1 and built the
    dose pipeline once per join branch (4 scans; now 2 logical reads of
    ONE persisted dedup). grm_pairs_blas stays the float production
    form at biobank n; this relation form remains the oracle-checkable
    contract.

    ``sample_ids``: optional inventory for the pair ordinal space. Any
    SUPERSET of the observed ids is valid when min_m >= 1: an id with
    no observations yields all-zero indicator columns, so every pair
    it joins has m_used = 0 and the min_m filter drops it — output
    identical, one full-scan distinct+collect job saved (ignored at
    min_m < 1, where zero-observation pairs would surface)."""
    if sample_ids is not None and int(min_m) >= 1:
        ids = list(sample_ids)
    else:
        ids = [
            r[0] for r in calls.select("sample_id").distinct().collect()
        ]
    ids.sort()
    d, release = _dose_once(calls, False)
    st = d.groupBy("variant_id").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("d").alias("_s")
    )
    # polymorphic variants only: 0 < p < 1  <=>  0 < S < 2n
    st = st.where((F.col("_s") > 0) & (F.col("_s") < 2 * F.col("_n")))
    # the SAME doubles and IEEE op order as the old per-row expression:
    # (x - 2p) * (y - 2p) / (2p(1 - p)), then round(c * scale) HALF_UP
    twop_v = F.col("_s").cast("double") / F.col("_n").cast("double")
    den_v = twop_v * (F.lit(1.0) - twop_v / F.lit(2.0))
    scale = float(10 ** int(unit_scale))
    st = st.select(
        "variant_id",
        *[
            F.round(
                (
                    (F.lit(float(x)) - twop_v)
                    * (F.lit(float(y)) - twop_v)
                    / den_v
                )
                * F.lit(scale)
            )
            .cast("bigint")
            .alias(f"u_{x}{y}")
            for x in range(3)
            for y in range(3)
        ],
    )
    sums = _pair_table_sums(d, ids, st=st, tables=("u",))
    lab = F.array(*[F.lit(s) for s in ids])
    out = (
        _spread_pairs(sums).groupBy("_si", "_sj")
        .agg(
            F.sum("m_used").alias("m_used"),
            F.sum("_s_u").alias("_su"),
        )
        .where(F.col("m_used") >= int(min_m))
        .select(
            F.element_at(lab, F.col("_si") + 1).alias("sample_i"),
            F.element_at(lab, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            (
                (F.col("_su").cast("double") / F.lit(scale))
                / F.col("m_used").cast("double")
            ).alias("grm"),
        )
    )
    return release(out)


def _GRM_PAIRS_CTE_SQL(min_m: int = 1, unit_scale: int = 6) -> str:
    """The grm_pairs oracle's CTE chain up to `u` (per-(variant, pair)
    BIGINT contribution units) — shared by grm_pairs_oracle_sql and
    grm_sketch_oracle_sql so the contribution expression tree stays in
    lockstep."""
    scale = float(10 ** int(unit_scale))
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), st AS (
          SELECT variant_id, COUNT(*) AS n_obs, CAST(SUM(d) AS BIGINT) AS s_sum
          FROM dnn GROUP BY variant_id
          HAVING CAST(SUM(d) AS BIGINT) > 0
             AND CAST(SUM(d) AS BIGINT) < 2 * COUNT(*)
        ), u AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 CAST(round((((CAST(a.d AS DOUBLE)
                               - (CAST(st.s_sum AS DOUBLE) / CAST(st.n_obs AS DOUBLE)))
                              * (CAST(b.d AS DOUBLE)
                                 - (CAST(st.s_sum AS DOUBLE) / CAST(st.n_obs AS DOUBLE))))
                             / ((CAST(st.s_sum AS DOUBLE) / CAST(st.n_obs AS DOUBLE))
                                * (1.0 - (CAST(st.s_sum AS DOUBLE)
                                          / CAST(st.n_obs AS DOUBLE)) / 2.0)))
                            * {scale!r}) AS BIGINT) AS u_units
          FROM dnn a
          JOIN dnn b ON a.variant_id = b.variant_id
                    AND a.sample_id < b.sample_id
          JOIN st ON st.variant_id = a.variant_id
        )
    """


def grm_pairs_oracle_sql(min_m: int = 1, unit_scale: int = 6) -> str:
    """DuckDB oracle twin of grm_pairs over the gcalls CTE (caller
    prepends oracle_prelude()). The contribution expression tree is
    spelled IDENTICALLY to the engine's Column form so every IEEE op
    matches; quantized units are BIGINT before summing."""
    scale = float(10 ** int(unit_scale))
    return f"""{_GRM_PAIRS_CTE_SQL(min_m, unit_scale)}
        SELECT sample_i, sample_j, COUNT(*) AS m_used,
               (CAST(CAST(SUM(u_units) AS BIGINT) AS DOUBLE) / {scale!r})
                 / CAST(COUNT(*) AS DOUBLE) AS grm
        FROM u GROUP BY sample_i, sample_j
        HAVING COUNT(*) >= {int(min_m)}
    """


def grm_pairs_blas(
    calls: DataFrame,
    min_m: int = 1,
    blocks: int | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """Blocked-matmul GRM — the biobank-scale substrate for grm_pairs.

    Identity: A_jk = sum_i z_ij z_ik / m_jk with z = (x - 2p)/sqrt(2p(1-p))
    zero-filled at missing entries (a missing entry contributes exactly 0
    to the numerator) and m_jk = mask_j . mask_k — so the whole estimator
    is two Gram matrices. The variant axis is hash-partitioned into
    `blocks` groups (dot products are order-free sums, so ANY variant
    partition works — no global ordinal needed); each block task pivots
    its (sample, variant, z) rows to a dense n_samples x block_width
    matrix and emits per-pair partial (dot, m) from ONE BLAS syrk-shaped
    matmul; a final (j, k)-keyed sum finishes. Per-task memory is
    n_samples x (variants/blocks) x 8 bytes — `blocks` is the knob that
    fits any m; the n^2 pair output is inherent to GRM.

    Numerics: partial sums are float64 via BLAS, so results match
    grm_pairs up to its 1e-6 quantization + summation order (~1e-9
    relative) — pytest-pinned. The oracle-checkable twin stays
    grm_pairs; this is the same-answer production plan, the
    relation-form's m x n^2 row blowup replaced by (rows-once shuffle +
    n^2 G partials).

    assume_unique=True skips the (variant, sample) MIN-dedupe
    pre-aggregation — one full-width shuffle saved (measured ~1/3 of
    the wall at 50M calls) — for producers that guarantee one
    observation per cell (the engine's own VCF/GDS imports do; the
    synthetic gcalls log does NOT).

    Driver boundary: the distinct sample-id inventory is collected once
    (bounded by n_samples — the same class of bounded collect as the
    codebook/centroid inits) so the wide stages ship a 4-byte sample
    code instead of a string key, and block tasks index straight into
    the Gram matrix with no per-task factorize."""
    import numpy as np
    import pandas as pd

    sc = calls.sparkSession.sparkContext
    g_num = int(blocks) if blocks else max(2, sc.defaultParallelism)
    if assume_unique:
        d = calls.select(
            "variant_id",
            "sample_id",
            dosage_alt("alleles", partial_missing=False).alias("d"),
        ).where(F.col("d").isNotNull())
    else:
        d = _dose_flat(calls).where(F.col("d").isNotNull())
    labels = [
        r["sample_id"]
        for r in d.select("sample_id").distinct().orderBy("sample_id").collect()
    ]
    if not labels:
        return calls.sparkSession.createDataFrame(
            [], "sample_i string, sample_j string, m_used bigint, grm double"
        )
    # sample -> ordinal as a BROADCAST hash join (the pack_2bit_genotypes
    # lesson: a literal map + element_at evaluates as a linear scan of
    # the map per row — O(n_samp) per call entry — where the hash join
    # probe is O(1))
    ord_df = calls.sparkSession.createDataFrame(
        [(s, i) for i, s in enumerate(labels)], "sample_id string, _sid int"
    )
    st = d.groupBy("variant_id").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("d").alias("_s")
    )
    st = st.where((F.col("_s") > 0) & (F.col("_s") < 2 * F.col("_n")))
    twop = F.col("_s").cast("double") / F.col("_n").cast("double")
    z = (F.col("d").cast("double") - twop) / F.sqrt(
        twop * (F.lit(1.0) - twop / F.lit(2.0))
    )
    zd = (
        d.join(st, "variant_id")
        .join(F.broadcast(ord_df), "sample_id")
        .select(
            F.pmod(F.xxhash64("variant_id"), F.lit(g_num)).alias("_g"),
            "variant_id",
            "_sid",
            z.alias("_z"),
        )
    )
    n_samp = len(labels)

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        # variant codes still factorize per block (unbounded id space);
        # sample codes arrive pre-encoded, so the Gram matrix is indexed
        # directly — rows absent from this block are all-zero and
        # contribute nothing to either matmul
        v_codes, _ = pd.factorize(pdf["variant_id"])
        zf = np.zeros((n_samp, v_codes.max() + 1))
        mask = np.zeros_like(zf)
        sid = pdf["_sid"].to_numpy()
        zf[sid, v_codes] = pdf["_z"].to_numpy()
        mask[sid, v_codes] = 1.0
        dots = zf @ zf.T
        ms = mask @ mask.T
        iu, ju = np.triu_indices(n_samp, k=1)
        # partials ship 4-byte pair codes, not string ids — the label
        # attach happens once, after the final (i, j)-keyed agg (the
        # grm_from_packed ending)
        return pd.DataFrame(
            {
                "_si": iu.astype(np.int32),
                "_sj": ju.astype(np.int32),
                "pdot": dots[iu, ju],
                "pm": ms[iu, ju],
            }
        )

    partials = zd.groupBy("_g").applyInPandas(
        _block, "_si int, _sj int, pdot double, pm double"
    )
    lab_col = F.array(*[F.lit(s) for s in labels])
    return (
        _spread_pairs(partials).groupBy("_si", "_sj")
        .agg(
            F.sum("pm").cast("bigint").alias("m_used"),
            F.sum("pdot").alias("_dot"),
        )
        .where(F.col("m_used") >= int(min_m))
        .select(
            F.element_at(lab_col, F.col("_si") + 1).alias("sample_i"),
            F.element_at(lab_col, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            (F.col("_dot") / F.col("m_used").cast("double")).alias("grm"),
        )
    )


def _packed_batch_codes(rb, n_samp_expected: int, codes_lut):
    """One Arrow batch of packed rows -> (n_rows, n_samp) 2-bit code
    matrix with the pad lanes trimmed (None for empty batches),
    validating each batch's n_samples against the caller's sample
    axis — the decode scaffolding shared by the packed sample-pair
    kernels (grm_from_packed / ibs_from_packed)."""
    from seqarray_spark.sources.packed import decode_packed_matrix

    n = rb.num_rows
    if not n:
        return None
    names = rb.schema.names
    pk = rb.column(names.index("packed"))
    n_samp = int(rb.column(names.index("n_samples"))[0].as_py())
    if n_samp != n_samp_expected:
        raise ValueError(
            f"packed rows carry n_samples={n_samp}, caller supplied "
            f"{n_samp_expected} sample ids"
        )
    stride = (n_samp + 3) // 4
    mat = decode_packed_matrix(pk, n, stride)
    return codes_lut[mat].reshape(n, stride * 4)[:, :n_samp]


def grm_from_packed(
    packed: DataFrame,
    sample_ids: list[str],
    min_m: int = 1,
    dtype: str = "float64",
) -> DataFrame:
    """GRM over the 2-bit PACKED genotype column (sources/packed.py) —
    the densest substrate: 16x fewer scan/shuffle bytes than the
    long-format blas form, and ZERO wide shuffles.

    The packed layout is variant-complete (one row = one variant's
    whole sample vector), so per-variant allele frequency, the
    polymorphic filter, standardization and the partial Gram all happen
    INSIDE one mapInArrow task over whatever variant rows the scan
    hands it — GRM's sum over variants is order-free, so any partition
    of the variant axis is a valid blocking. Each task emits its
    n(n-1)/2 partial (dot, m) pairs; one (i, j)-keyed partial agg
    finishes. Plan: scan -> mapInArrow -> groupBy. The only shuffle is
    the tiny pair-partials one (tasks x n^2/2 rows).

    Dosage semantics are the packed column's own (seqGet2bGeno:
    '$dosage_alt2' — partially-missing calls keep their observed ALT
    count, code 3 = fully missing), which differs from
    grm_pairs/grm_pairs_blas' any-missing-is-NULL rule exactly where
    calls are partially missing; on fully-called/fully-missing data the
    three forms agree (pytest-pinned vs grm_pairs_blas).

    dtype: the per-batch Gram precision. 'float64' (default) matches
    grm_pairs_blas to ~1e-15; 'float32' halves the kernel's memory
    traffic and doubles dgemm throughput at ~1e-6 absolute error per
    entry (cross-batch accumulation stays float64; mask counts <=
    batch size are exact in float32) — relatedness screens threshold
    at ~0.025, so the fast mode is the production default at biobank
    FLOP counts."""
    import numpy as np
    import pyarrow as pa

    from seqarray_spark.sources.packed import _code_lut

    dt = np.dtype(dtype)
    if dt not in (np.dtype("float32"), np.dtype("float64")):
        raise ValueError("dtype must be float32 or float64")
    n_samp_expected = len(sample_ids)
    if n_samp_expected < 2:
        raise ValueError("GRM needs >= 2 samples")
    iu, ju = np.triu_indices(n_samp_expected, k=1)

    def kernel(batches):
        codes_lut = _code_lut()
        dots = np.zeros((n_samp_expected, n_samp_expected))
        ms = np.zeros_like(dots)
        saw = False
        for rb in batches:
            codes = _packed_batch_codes(rb, n_samp_expected, codes_lut)
            if codes is None:
                continue
            mask = codes != 3
            nonmiss = mask.sum(axis=1)
            alt = np.where(mask, codes, 0).sum(axis=1, dtype=np.int64)
            # polymorphic variants only (0 < p < 1), same rule as the
            # relation/blas forms
            keep = (alt > 0) & (alt < 2 * nonmiss)
            if not keep.any():
                continue
            saw = True
            mk = mask[keep]
            # standardize in-place in the working dtype: z = (x-2p)/s
            # with missing entries exactly 0 (built as mask * ((x-2p)/s)
            # evaluated only at known entries via the zero-filled x)
            tp = (alt[keep] / np.maximum(nonmiss[keep], 1)).astype(dt)[:, None]
            z = np.where(mk, codes[keep], 0).astype(dt)
            z -= tp
            z *= mk  # re-zero the missing entries shifted by -2p
            z /= np.sqrt(tp * (1.0 - tp / 2.0))
            mkf = mk.astype(dt)
            dots += (z.T @ z).astype(np.float64, copy=False)
            ms += (mkf.T @ mkf).astype(np.float64, copy=False)
        if saw:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(iu.astype(np.int32)),
                    pa.array(ju.astype(np.int32)),
                    pa.array(dots[iu, ju]),
                    pa.array(ms[iu, ju]),
                ],
                names=["_si", "_sj", "pdot", "pm"],
            )

    partials = packed.select("variant_id", "n_samples", "packed").mapInArrow(
        kernel, schema="_si int, _sj int, pdot double, pm double"
    )
    labels = F.array(*[F.lit(s) for s in sample_ids])
    return (
        _spread_pairs(partials).groupBy("_si", "_sj")
        .agg(
            F.sum("pm").cast("bigint").alias("m_used"),
            F.sum("pdot").alias("_dot"),
        )
        .where(F.col("m_used") >= int(min_m))
        .select(
            F.element_at(labels, F.col("_si") + 1).alias("sample_i"),
            F.element_at(labels, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            (F.col("_dot") / F.col("m_used").cast("double")).alias("grm"),
        )
    )


def ld_pairs_from_packed(
    packed: DataFrame,
    variants: DataFrame,
    bp_window: int = 50_000,
    min_n: int = 1,
) -> DataFrame:
    """LD r² over the 2-bit PACKED genotype column — ld_pairs' scale
    substrate (the af_from_packed / grm_from_packed pattern).

    Same output contract as ld_pairs — (va, vb, n_used, r2), va before
    vb in (position, variant_id) order, NULL r² on zero variance — and
    the SAME exact-integer numerics (all sums int64 in the kernel, the
    identical two-multiplies-one-divide ending), so results are
    value-hash-stable. Dosage semantics are the packed column's own
    ('$dosage_alt2': partial-missing keeps observed ALT count, 3 =
    fully missing), which differs from long-format ld_pairs exactly at
    partially-missing calls (pytest-pinned agreement elsewhere).

    Plan: join packed rows to (chromosome, position), replicate each
    variant to position bins {k, k+1} (k = floor(pos/W)); each
    (chromosome, bin) group decodes its rows ONCE and emits every pair
    whose LATER variant natively lives in that bin — each in-window
    pair lands in exactly one group (the later side's own bin; the
    earlier side is always present there because in-window bins differ
    by <= 1). One applyInArrow over 2x-replicated packed rows — the
    r1 relation form's per-pair map-zip fold becomes a per-task numpy
    sweep with no pair-scale shuffle at all."""
    import numpy as np
    import pyarrow as pa

    from seqarray_spark.sources.packed import _code_lut, decode_packed_matrix

    w = int(bp_window)
    if int(min_n) < 1:
        raise ValueError("min_n must be >= 1")
    meta = packed.join(
        variants.select("variant_id", "chromosome", "position"), "variant_id"
    )
    k = F.floor(F.col("position") / w)
    repl = meta.select(
        "variant_id",
        "chromosome",
        "position",
        "n_samples",
        "packed",
        F.explode(F.array(k, k + 1)).alias("_bin"),
    )

    out_schema = pa.schema(
        [
            ("va", pa.int64()),
            ("vb", pa.int64()),
            ("n_used", pa.int64()),
            ("r2", pa.float64()),
        ]
    )
    empty = pa.Table.from_pydict(
        {"va": [], "vb": [], "n_used": [], "r2": []}, schema=out_schema
    )

    def kernel(t: "pa.Table") -> "pa.Table":
        codes_lut = _code_lut()
        if not t.num_rows:
            return empty
        t = t.combine_chunks()
        pos = t.column("position").to_numpy()
        vid = t.column("variant_id").to_numpy()
        bins = t.column("_bin").to_numpy()
        ns = t.column("n_samples").to_numpy()
        if (ns != ns[0]).any():
            # mirror _packed_batch_codes' loud failure: a stride read
            # off row 0 would silently misdecode every other-width row
            raise ValueError(
                "packed rows in one (chromosome, bin) group carry mixed "
                f"n_samples ({sorted(set(int(x) for x in ns))}); the "
                "2-bit stride is only defined for one sample axis"
            )
        n_samp = int(ns[0])
        stride = (n_samp + 3) // 4
        pk = t.column("packed").chunk(0) if t.column("packed").num_chunks else None
        if pk is None:
            return empty
        mat = decode_packed_matrix(pk, len(pos), stride)
        order = np.lexsort((vid, pos))
        pos, vid, bins, mat = pos[order], vid[order], bins[order], mat[order]
        codes = codes_lut[mat].reshape(len(pos), stride * 4)[:, :n_samp]
        mask = (codes != 3)
        x = np.where(mask, codes, 0).astype(np.int64)
        out_va, out_vb, out_n, out_r2 = [], [], [], []
        gbin = bins[0] if len(bins) else 0
        for b in range(len(pos)):
            # emit pairs only where the LATER side natively lives here
            if pos[b] // w != gbin:
                continue
            lo = int(np.searchsorted(pos, pos[b] - w, side="left"))
            if lo >= b:
                continue
            sl = slice(lo, b)
            both = mask[sl] & mask[b]
            n = both.sum(axis=1).astype(np.int64)
            xa = np.where(both, x[sl], 0)
            xb = np.where(both, x[b], 0)
            sx = xa.sum(axis=1)
            sy = xb.sum(axis=1)
            sxy = (xa * xb).sum(axis=1)
            sxx = (xa * xa).sum(axis=1)
            syy = (xb * xb).sum(axis=1)
            num = n * sxy - sx * sy
            d1 = n * sxx - sx * sx
            d2 = n * syy - sy * sy
            with np.errstate(invalid="ignore", divide="ignore"):
                r2 = np.where(
                    (d1 != 0) & (d2 != 0),
                    (num.astype(np.float64) * num.astype(np.float64))
                    / (d1.astype(np.float64) * d2.astype(np.float64)),
                    np.nan,
                )
            keep = n >= int(min_n)
            # the lexsort already orders same-position rows by id (so
            # vid[sl] < vid[b] holds for every tie); this guard only
            # protects against duplicate variant rows reaching the kernel
            tie = pos[sl] == pos[b]
            if tie.any():
                keep &= ~tie | (vid[sl] < vid[b])
            idx = np.flatnonzero(keep)
            if not len(idx):
                continue
            out_va.append(vid[sl][idx])
            out_vb.append(np.full(len(idx), vid[b], dtype=np.int64))
            out_n.append(n[idx])
            out_r2.append(r2[idx])
        if not out_va:
            return empty
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_va)),
                pa.array(np.concatenate(out_vb)),
                pa.array(np.concatenate(out_n)),
                pa.array(np.concatenate(out_r2), from_pandas=True),  # NaN -> NULL
            ],
            schema=out_schema,
        )

    # Compute-sized parallelism for the per-(chromosome, bin) kernel
    # (r13 opt, guide §2.5): the replicated packed rows are tiny in
    # BYTES, so AQE coalesced the groupBy exchange to 2-3 partitions and
    # the ~4k-group Arrow kernel ran near-serially (measured 5.2s task
    # time on 2 tasks at sf0.1). Repartitioning on the grouping keys to
    # cluster parallelism satisfies the applyInArrow distribution (no
    # extra exchange) and is not AQE-coalesced; group ownership and
    # per-group results are unchanged.
    par = max(2, repl.sparkSession.sparkContext.defaultParallelism)
    return (
        repl.repartition(par, "chromosome", "_bin")
        .groupBy("chromosome", "_bin")
        .applyInArrow(
            kernel, schema="va long, vb long, n_used long, r2 double"
        )
    )


def ld_pairs_packed_oracle_sql(bp_window: int = 50_000, min_n: int = 1) -> str:
    """DuckDB oracle twin of pack_2bit_genotypes -> ld_pairs_from_packed
    over the gvariants/gcalls CTEs: the ld_pairs relation with the
    packed column's dosage semantics (_DOSE_PACKED_SQL). The engine path
    exercises the real pack -> 2-bit decode -> kernel pipeline; the
    oracle replays its arithmetic from the raw calls."""
    return f"""{_ld_ctes(bp_window, _DOSE_PACKED_SQL)}
        SELECT va, vb, n_used, {_LD_R2_SQL} AS r2
        FROM s WHERE n_used >= {int(min_n)}
    """


def ibs_from_packed(
    packed: DataFrame,
    sample_ids: list[str],
    min_m: int = 1,
) -> DataFrame:
    """Identity-by-state for every sample pair over the 2-bit packed
    column (SNPRelate's snpgdsIBS, the model-free cousin of the GRM):
    ibs = mean over co-called variants of (2 - |x_i - x_j|) / 2, i.e.
    1 for identical genotypes, 0.5 one allele apart, 0 opposite
    homozygotes.

    Same zero-wide-shuffle shape as grm_from_packed. The pairwise
    |x_i - x_j| sum is NOT a single Gram product, but over one-hot
    indicators I_c (c = 0,1,2) it decomposes exactly:
    sum|x_i - x_j| = (I0'I1 + I1'I0 + I1'I2 + I2'I1) + 2*(I0'I2 + I2'I0)
    and m = (I0+I1+I2)'(I0+I1+I2) — four 0/1 matmuls per batch, every
    count an exact small integer in float64, so the final
    (2m - sumd) / (2m) division is the only real float op and the
    result value-hashes against a SQL oracle replaying |dx - dy|."""
    import numpy as np
    import pyarrow as pa

    from seqarray_spark.sources.packed import _code_lut

    n_samp_expected = len(sample_ids)
    if n_samp_expected < 2:
        raise ValueError("IBS needs >= 2 samples")
    iu, ju = np.triu_indices(n_samp_expected, k=1)

    def kernel(batches):
        codes_lut = _code_lut()
        sumd = np.zeros((n_samp_expected, n_samp_expected))
        ms = np.zeros_like(sumd)
        saw = False
        for rb in batches:
            codes = _packed_batch_codes(rb, n_samp_expected, codes_lut)
            if codes is None:
                continue
            saw = True
            i0 = (codes == 0).astype(np.float64)
            i1 = (codes == 1).astype(np.float64)
            i2 = (codes == 2).astype(np.float64)
            m01 = i0.T @ i1
            m12 = i1.T @ i2
            m02 = i0.T @ i2
            sumd += (m01 + m01.T + m12 + m12.T) + 2.0 * (m02 + m02.T)
            known = i0 + i1 + i2
            ms += known.T @ known
        if saw:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(iu.astype(np.int32)),
                    pa.array(ju.astype(np.int32)),
                    pa.array(sumd[iu, ju]),
                    pa.array(ms[iu, ju]),
                ],
                names=["_si", "_sj", "sumd", "pm"],
            )

    partials = packed.select("variant_id", "n_samples", "packed").mapInArrow(
        kernel, schema="_si int, _sj int, sumd double, pm double"
    )
    labels = F.array(*[F.lit(s) for s in sample_ids])
    return (
        _spread_pairs(partials).groupBy("_si", "_sj")
        .agg(
            F.sum("pm").cast("bigint").alias("m_used"),
            F.sum("sumd").cast("bigint").alias("_sd"),
        )
        .where(F.col("m_used") >= int(min_m))
        .select(
            F.element_at(labels, F.col("_si") + 1).alias("sample_i"),
            F.element_at(labels, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            (
                (2.0 * F.col("m_used").cast("double") - F.col("_sd").cast("double"))
                / (2.0 * F.col("m_used").cast("double"))
            ).alias("ibs"),
        )
    )


def ibs_packed_oracle_sql(min_m: int = 1) -> str:
    """DuckDB oracle twin of pack_2bit_genotypes -> ibs_from_packed over
    the gvariants/gcalls CTEs: per-cell packed dosage (MAX-dedupe
    $dosage_alt2), pairwise |dx - dy| sums, the identical final float
    expression."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_PACKED_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), s AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 COUNT(*) AS m_used,
                 CAST(SUM(ABS(a.d - b.d)) AS BIGINT) AS sd
          FROM dnn a JOIN dnn b ON a.variant_id = b.variant_id
                              AND a.sample_id < b.sample_id
          GROUP BY a.sample_id, b.sample_id
        )
        SELECT sample_i, sample_j, m_used,
               (2.0 * CAST(m_used AS DOUBLE) - CAST(sd AS DOUBLE))
                 / (2.0 * CAST(m_used AS DOUBLE)) AS ibs
        FROM s WHERE m_used >= {int(min_m)}
    """


def _grm_sample_axis(grm: DataFrame, sample_ids: list[str] | None):
    """Resolve the sample universe + positional codes for the PCA
    family. With sample_ids=None the axis is DERIVED from the pair
    rows, so a sample whose every pair was filtered out (min_m) or
    that never co-observes another sample silently vanishes — pass the
    cohort's id list explicitly to keep such samples (they appear with
    zero off-diagonal relatedness)."""
    if sample_ids is None:
        ids = sorted(
            r["_s"]
            for r in grm.select(
                F.explode(F.array("sample_i", "sample_j")).alias("_s")
            )
            .distinct()
            .collect()
        )
    else:
        ids = sorted(str(s) for s in sample_ids)
        if len(set(ids)) != len(ids):
            raise ValueError("sample_ids contains duplicates")
    return ids


def _grm_pair_positions(
    grm: DataFrame, ids: list[str]
) -> DataFrame:
    """(pi, pj, v) integer-coded pair relation, pi < pj, NULL grm -> 0.
    The id -> ordinal map rides a broadcast hash join (the
    grm_pairs_blas lesson: literal-map lookups scan linearly).

    The joins are LEFT + raise_error on an unmapped side (ADVICE r11):
    an inner join would silently DISCARD every pair touching a sample
    absent from an explicit sample_ids= list, so a typo'd or partial
    cohort list yields PCs computed on a truncated relatedness matrix
    with no error — the inverse of the derived-axis footgun documented
    on _grm_sample_axis. The guard is executor-side (zero extra passes
    over the pair relation) and names the offending id."""
    spark = grm.sparkSession
    ord_df = spark.createDataFrame(
        [(s, i) for i, s in enumerate(ids)], "sample_id string, _ord int"
    )
    oi = F.broadcast(ord_df).alias("oi")
    oj = F.broadcast(ord_df).alias("oj")
    g = grm.alias("g")

    def _guard(ord_col, id_col):
        return F.when(
            ord_col.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "grm pair references a sample absent from "
                        "sample_ids= (its pairs would otherwise be "
                        "silently dropped): "
                    ),
                    id_col,
                )
            ).cast("int"),
        ).otherwise(ord_col)

    coded = (
        g.join(oi, F.col("g.sample_i") == F.col("oi.sample_id"), "left")
        .join(oj, F.col("g.sample_j") == F.col("oj.sample_id"), "left")
        .select(
            F.least(
                _guard(F.col("oi._ord"), F.col("g.sample_i")),
                _guard(F.col("oj._ord"), F.col("g.sample_j")),
            ).alias("_pi"),
            F.greatest(
                _guard(F.col("oi._ord"), F.col("g.sample_i")),
                _guard(F.col("oj._ord"), F.col("g.sample_j")),
            ).alias("_pj"),
            F.coalesce(F.col("g.grm").cast("double"), F.lit(0.0)).alias("_v"),
        )
    )
    return coded


def grm_pca(
    grm: DataFrame,
    k: int = 10,
    diag: float | None = 1.0,
    sample_ids: list[str] | None = None,
    block: int = 2048,
) -> DataFrame:
    """Sample principal components from a GRM pair relation — the
    SNPRelate snpgdsPCA step downstream of grm_pairs/grm_from_packed
    (population-structure axes for association-study covariates).

    Input: (sample_i, sample_j, m_used, grm) upper-triangle pairs (any
    of the three GRM forms). Assembly is BLOCKED ARROW, not collected
    Rows (VERDICT r10): the pair relation is integer-coded via a
    broadcast ordinal join, grouped into (block x block) tiles, and
    each tile arrives as ONE dense float64 blob from applyInPandas —
    so the n^2/2 pairs cross the driver boundary as ~ (n/block)^2 / 2
    binary buffers (33 MB each at block=2048) pulled one block-row
    chunk at a time from the persisted tile frame, never as per-pair
    Python objects. Measured at n=30k / 450M pairs
    (tools/grm_pca_stress.py): driver Python peak RSS 11.1 GB for the
    7.2 GB matrix — matrix plus transient blobs; the eigensolve
    (numpy.linalg.eigh, O(n^3)) is the real driver bound — n ~ 30k is
    hours of LAPACK, n ~ 10k minutes. Past that, grm_pca_distributed
    never assembles the matrix at all.

    `diag` fills the diagonal (the GCTA self-relatedness diagonal is
    ~1; constant diag shifts eigenvalues, not eigenvectors). Pass
    diag=None when the pair relation ITSELF carries sample_i ==
    sample_j rows (eigmix's non-constant diagonal): assembly then
    keeps the provided values (they land doubled by the a + a.T fold
    and are halved back).
    `sample_ids` pins the sample axis explicitly; when omitted it is
    derived from the pair rows, so samples with NO surviving pair
    (min_m filtering, never co-observed) are dropped — pass the cohort
    list to keep them. Each eigenvector's sign is fixed
    deterministically (largest-|loading| entry made positive) since
    eigenvectors are sign-ambiguous across LAPACK builds.

    Output: one row per sample — (sample_id, pc array<double> of k
    loadings) — ordered by lexicographic sample_id."""
    import numpy as np
    import pandas as pd

    ids = _grm_sample_axis(grm, sample_ids)
    if not ids:
        return grm.sparkSession.createDataFrame(
            [], "sample_id string, pc array<double>"
        )
    n = len(ids)
    b = int(block)
    coded = _grm_pair_positions(grm, ids).withColumns(
        {
            "_bi": (F.col("_pi") / b).cast("int"),
            "_bj": (F.col("_pj") / b).cast("int"),
        }
    )

    def _tile(pdf: "pd.DataFrame") -> "pd.DataFrame":
        bi = int(pdf["_bi"].iloc[0])
        bj = int(pdf["_bj"].iloc[0])
        h = min(b, n - bi * b)
        w = min(b, n - bj * b)
        m = np.zeros((h, w), dtype=np.float64)
        m[
            pdf["_pi"].to_numpy() - bi * b,
            pdf["_pj"].to_numpy() - bj * b,
        ] = pdf["_v"].to_numpy()
        return pd.DataFrame({"bi": [bi], "bj": [bj], "blob": [m.tobytes()]})

    tiles = coded.groupBy("_bi", "_bj").applyInPandas(
        _tile, schema="bi int, bj int, blob binary"
    ).persist()
    # materialize every tile in ONE parallel job (count), then pull
    # them down one BLOCK-ROW at a time from the cache: a single
    # collect() of all blobs (n^2/2 bytes) trips
    # spark.driver.maxResultSize at n=30k (measured: 3.6 GB vs the 1 GB
    # default), and toLocalIterator re-ran the expensive tile builds
    # serially (one job per partition, 32 x ~30s at n=30k, even
    # persisted). A block-row is <= ceil(n/block) tiles ~ 0.5 GB at
    # n=30k/block=2048 — under the default result cap through n ~ 60k,
    # past which the O(n^3) eigensolve is the binding limit anyway.
    # Driver peak = the matrix + one block-row of blobs.
    tiles.count()
    a = np.zeros((n, n), dtype=np.float64)
    for bi in range((n + b - 1) // b):
        for r in tiles.where(F.col("bi") == bi).collect():
            bj = int(r["bj"])
            h = min(b, n - bi * b)
            w = min(b, n - bj * b)
            m = np.frombuffer(r["blob"], dtype=np.float64).reshape(h, w)
            a[bi * b : bi * b + h, bj * b : bj * b + w] += m
    tiles.unpersist()
    a = a + a.T  # pairs fill the upper triangle (+ any provided diag)
    if diag is None:
        # diagonal came from sample_i == sample_j pair rows and was
        # doubled by the symmetric fold just above
        a[np.diag_indices(n)] *= 0.5
    else:
        np.fill_diagonal(a, float(diag))
    vals, vecs = np.linalg.eigh(a)
    order = np.argsort(vals)[::-1][: int(k)]
    comps = _fix_signs(vecs[:, order])
    return grm.sparkSession.createDataFrame(
        [(s, [float(x) for x in comps[i]]) for i, s in enumerate(ids)],
        "sample_id string, pc array<double>",
    ).select(
        "sample_id",
        # `_k` width stamp: downstream consumers (pca_snp_loadings /
        # pca_snp_corr / admix_prop) read the component count from the
        # schema instead of running a width-probe job
        F.col("pc").alias("pc", metadata={"_k": int(k)}),
    )


def _fix_signs(comps):
    """Deterministic eigenvector sign: largest-|loading| entry made
    positive (LAPACK sign is build-dependent)."""
    import numpy as np

    comps = comps.copy()
    for c in range(comps.shape[1]):
        m = int(np.argmax(np.abs(comps[:, c])))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    return comps


def _grm_matmul(pairs_pos: DataFrame, n: int, mat, diag: float):
    """Distributed Y = (G + diag*I) @ M over the integer-coded pair
    relation — the randomized-eigensolver building block. M (n x l,
    l = k + oversample, a few MB) ships to every task; each PARTITION
    accumulates its pairs' contributions into a local (n, l) float64
    partial (per-column np.bincount scatters — BLAS-free but
    vectorized) and emits it as ONE binary blob, so the combine is a
    driver-side sum of num_partitions dense partials: ZERO shuffle, no
    n^2 assembly anywhere. Symmetry is applied here (each stored upper
    pair contributes to both endpoint rows)."""
    import numpy as np
    import pyarrow as pa

    l_cols = mat.shape[1]
    bc = pairs_pos.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(mat, dtype=np.float64)
    )

    def kernel(batches):
        m_loc = bc.value
        out = np.zeros((n, l_cols), dtype=np.float64)
        saw = False
        for rb in batches:
            if not rb.num_rows:
                continue
            saw = True
            names = rb.schema.names
            pi = rb.column(names.index("_pi")).to_numpy()
            pj = rb.column(names.index("_pj")).to_numpy()
            v = rb.column(names.index("_v")).to_numpy()
            for c in range(l_cols):
                out[:, c] += np.bincount(
                    pi, weights=v * m_loc[pj, c], minlength=n
                )
                out[:, c] += np.bincount(
                    pj, weights=v * m_loc[pi, c], minlength=n
                )
        if saw:
            yield pa.RecordBatch.from_arrays(
                [pa.array([out.tobytes()])], names=["blob"]
            )

    acc = np.zeros((n, l_cols), dtype=np.float64)
    for r in pairs_pos.mapInArrow(kernel, schema="blob binary").collect():
        acc += np.frombuffer(r["blob"], dtype=np.float64).reshape(n, l_cols)
    bc.unpersist()
    return acc + float(diag) * mat


_OMEGA_EVENS = list("02468ace")


def _omega_col(sample_col, c: int):
    """Deterministic Rademacher sketch entry omega[s, c] in {-1, +1}:
    +1 iff the first hex digit of md5(s || ':' || c) is even. md5 is
    the one keyed hash Spark SQL and DuckDB evaluate identically on
    strings, which is what makes the sketch pass oracle-checkable."""
    return (
        F.when(
            F.substring(
                F.md5(F.concat(sample_col, F.lit(f":{c}"))), 1, 1
            ).isin(*_OMEGA_EVENS),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("bigint")
    )


def grm_sketch_y(
    grm: DataFrame,
    n_cols: int = 4,
    diag: float = 1.0,
    quant: int = 9,
) -> DataFrame:
    """ONE distributed range-finder pass Y = (G + diag*I) @ Omega as
    pure DataFrame algebra — the oracle-checkable twin of the
    _grm_matmul kernel grm_pca_distributed iterates (same role the
    relation-form grm_pairs plays for grm_pairs_blas: gate the
    replayable form, ship the fast form; a pytest pins the two on the
    same Omega).

    Omega is the deterministic Rademacher matrix of _omega_col, and
    each GRM entry is quantized to the 1e-quant grid (BIGINT units)
    before the +/-1-weighted sum, so every accumulated quantity is an
    exact integer and the result is aggregation-order-free — the
    value-hash property every gate here relies on. At quant=9 the
    quantization perturbs the sketch by <= n * 5e-10 per entry,
    irrelevant to a range finder.

    The sample axis is derived from the pair rows (a sample with no
    surviving pair is absent — pass the cohort through grm_pca*'s
    sample_ids= when that matters; this gate form keeps the SQL twin
    join-free). Output: (sample_id, y_0 .. y_{n_cols-1}) doubles.

    Each pair row contributes to BOTH its samples' rows of Y. That is
    expressed as one explode over a 2-struct array — NOT a Union of two
    selects on `grm` — so the (expensive, possibly unpersisted) pair
    relation is scanned exactly once: a Union embeds the full grm
    lineage under both branches and Catalyst does not reuse the
    exchanges (VERDICT r11). Same-session A/B at sf0.1 (SCALE.md):
    the Union form can still WIN WALL-CLOCK there (4.8s vs 7.9s) —
    its duplicated subtrees schedule as two parallel branches while
    AQE has coalesced each tiny stage to 3-6 partitions, so the 2x
    CPU hides on idle cores. That inversion is a small-data artifact:
    at saturation (the 100 TB posture) stages fill the cluster, idle
    cores don't exist, and the explode form's halved total work is
    the real cost. Callers who iterate (grm_pca_distributed) persist
    the pair relation anyway, which removes the duplication either
    way."""
    units = F.round(F.col("grm") * F.lit(float(10**quant))).cast("bigint")
    both = (
        grm.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("sample_i").alias("sample_id"),
                        F.col("sample_j").alias("other"),
                        units.alias("units"),
                    ),
                    F.struct(
                        F.col("sample_j").alias("sample_id"),
                        F.col("sample_i").alias("other"),
                        units.alias("units"),
                    ),
                )
            ).alias("_e")
        )
        .select(
            F.col("_e.sample_id").alias("sample_id"),
            *[
                (F.col("_e.units") * _omega_col(F.col("_e.other"), c)).alias(
                    f"_u{c}"
                )
                for c in range(int(n_cols))
            ],
        )
    )
    diag_units = int(round(float(diag) * float(10**quant)))
    agg = both.groupBy("sample_id").agg(
        *[F.sum(f"_u{c}").alias(f"_u{c}") for c in range(int(n_cols))]
    )
    return agg.select(
        "sample_id",
        *[
            (
                (
                    F.col(f"_u{c}")
                    + F.lit(diag_units) * _omega_col(F.col("sample_id"), c)
                ).cast("double")
                / F.lit(float(10**quant))
            ).alias(f"y_{c}")
            for c in range(int(n_cols))
        ],
    )


def grm_sketch_oracle_sql(
    n_cols: int = 4,
    diag: float = 1.0,
    quant: int = 9,
    min_m: int = 1,
) -> str:
    """DuckDB oracle twin of grm_sketch_y over grm_pairs' CTE chain
    (caller prepends oracle_prelude()): identical Rademacher rule
    (md5 first hex digit), identical BIGINT unit grid."""
    evens = ", ".join(f"'{e}'" for e in _OMEGA_EVENS)
    scale = float(10 ** int(quant))
    diag_units = int(round(float(diag) * scale))

    def om(expr: str, c: int) -> str:
        return (
            f"(CASE WHEN substr(md5({expr} || ':{c}'), 1, 1) IN ({evens}) "
            "THEN 1 ELSE -1 END)"
        )

    ys = ",\n               ".join(
        f"CAST(SUM(u_int * w_{c}) + {diag_units} * {om('sample_id', c)} "
        f"AS DOUBLE) / {scale!r} AS y_{c}"
        for c in range(int(n_cols))
    )
    ws = ",\n                 ".join(
        f"{om('o', c)} AS w_{c}" for c in range(int(n_cols))
    )
    return f"""{_GRM_PAIRS_CTE_SQL(min_m)}
        , gp AS (
          SELECT sample_i, sample_j, COUNT(*) AS m_used,
                 (CAST(CAST(SUM(u_units) AS BIGINT) AS DOUBLE) / 1000000.0)
                   / CAST(COUNT(*) AS DOUBLE) AS grm
          FROM u GROUP BY sample_i, sample_j
          HAVING COUNT(*) >= {int(min_m)}
        ), su AS (
          SELECT sample_i AS sample_id, sample_j AS o,
                 CAST(round(grm * {scale!r}) AS BIGINT) AS u_int
          FROM gp
          UNION ALL
          SELECT sample_j, sample_i, CAST(round(grm * {scale!r}) AS BIGINT)
          FROM gp
        ), sw AS (
          SELECT sample_id, u_int,
                 {ws}
          FROM su
        )
        SELECT sample_id,
               {ys}
        FROM sw GROUP BY sample_id
    """


def grm_pca_distributed(
    grm: DataFrame,
    k: int = 10,
    diag: float = 1.0,
    sample_ids: list[str] | None = None,
    oversample: int = 8,
    power_iters: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Sample PCs WITHOUT assembling the GRM anywhere — the biobank-n
    path (VERDICT r10 item 1): a randomized range-finder (Halko,
    Martinsson & Tropp 2011, alg. 4.4) whose only data-sized operation
    is the distributed pair-relation multiply _grm_matmul (zero
    shuffle, driver traffic = num_partitions dense (n, k+oversample)
    partials per pass).

    Passes: Y0 = A @ Omega (Gaussian, seeded), then `power_iters`
    rounds of QR-reorthogonalized power iteration (A is symmetric, so
    each round is one multiply), then B = Q^T (A Q) — a (k+p)^2 matrix
    whose dense eigensolve is O((k+p)^3), trivial at any n. Approx
    eigenvectors V = Q W, same deterministic sign rule as grm_pca.
    With power_iters >= 2 and oversample ~ 8 the top-k subspace is
    accurate to working precision whenever the spectrum DECAYS (the
    population-structure case — a handful of large eigenvalues over a
    noise floor). Accuracy/passes trade-off, as the pytest actually
    measured it: the 1e-3 agreement with the exact eigh path is pinned
    at power_iters=6 on a separated spectrum; the default
    power_iters=2 is the cheap setting for well-separated spectra and
    can be looser on near-degenerate ones — raise it (each extra
    iteration costs one distributed matmul pass) when downstream use
    is sensitive beyond ~1e-2.

    Total driver memory: O(n * (k+oversample)) — at n = 500k, k = 10,
    p = 8 that is 72 MB, vs the 2 TB the exact path would need."""
    import numpy as np

    ids = _grm_sample_axis(grm, sample_ids)
    if not ids:
        return grm.sparkSession.createDataFrame(
            [], "sample_id string, pc array<double>"
        )
    n = len(ids)
    l_cols = min(n, int(k) + int(oversample))
    pairs_pos = _grm_pair_positions(grm, ids).persist()
    try:
        rng = np.random.default_rng(int(seed))
        omega = rng.standard_normal((n, l_cols))
        y = _grm_matmul(pairs_pos, n, omega, diag)
        q, _ = np.linalg.qr(y)
        for _ in range(int(power_iters)):
            y = _grm_matmul(pairs_pos, n, q, diag)
            q, _ = np.linalg.qr(y)
        z = _grm_matmul(pairs_pos, n, q, diag)
        b = q.T @ z
        b = (b + b.T) / 2.0  # symmetrize round-off
        vals, w = np.linalg.eigh(b)
        order = np.argsort(vals)[::-1][: int(k)]
        comps = _fix_signs(q @ w[:, order])
    finally:
        pairs_pos.unpersist()
    return grm.sparkSession.createDataFrame(
        [(s, [float(x) for x in comps[i]]) for i, s in enumerate(ids)],
        "sample_id string, pc array<double>",
    ).select(
        "sample_id",
        # `_k` width stamp: downstream consumers (pca_snp_loadings /
        # pca_snp_corr / admix_prop) read the component count from the
        # schema instead of running a width-probe job
        F.col("pc").alias("pc", metadata={"_k": int(k)}),
    )


def _stats_from_dose(d: DataFrame) -> DataFrame:
    """Polymorphic per-variant stats from an already-deduped dosage
    frame — built from the SAME DataFrame the caller scans so the dedup
    exchange canonicalizes identically and Catalyst's ReuseExchange
    collapses it to one shuffle (building from `calls` again would
    shuffle the full calls relation twice; plan-checked)."""
    st = d.groupBy("variant_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("d").cast("bigint").alias("dose_sum"),
    )
    return st.where(
        (F.col("dose_sum") > 0) & (F.col("dose_sum") < 2 * F.col("n_obs"))
    )


def dosage_stats(calls: DataFrame) -> DataFrame:
    """Per-variant dosage stats (n_obs, dose_sum) over polymorphic
    variants — the reference-cohort allele frequencies PCA projection
    standardizes NEW samples against (SNPRelate keeps the same stats on
    its pca object). Same dedup + polymorphic rule as grm_pairs."""
    return _stats_from_dose(_dose_flat(calls).where(F.col("d").isNotNull()))


def _z_expr():
    """Frequency-standardized dosage z = (x - 2p)/sqrt(2p(1 - p)),
    spelled with t = 2p = dose_sum/n_obs exactly as grm_pairs spells its
    product form — one fixed IEEE expression tree both engines share."""
    twop = F.col("dose_sum").cast("double") / F.col("n_obs").cast("double")
    return (F.col("d").cast("double") - twop) / F.sqrt(
        twop * (F.lit(1.0) - twop / F.lit(2.0))
    )


def _array_width(df: DataFrame, col: str, k: int | None, what: str) -> int:
    """Width of an array column without a driver job when avoidable: an
    explicit `k` wins; else the producer's `_k` schema-metadata stamp
    (pca_snp_loadings/grm_pca outputs — the BM25 stats-stamp precedent);
    else the one-row probe. The probe is a full materialization of the
    frame's subtree, so producers should stamp: measured at sf0.1, the
    probe re-ran the entire loadings pipeline (~2.3 s) once per consumer
    inside seq_pca_project before the stamp existed (guide §1/§5 — no
    driver work in query paths)."""
    if k is not None:
        return int(k)
    try:
        meta = df.schema[col].metadata
    except KeyError:
        meta = None
    if meta and "_k" in meta:
        return int(meta["_k"])
    probe = df.select(F.size(col).alias("_k")).first()
    if probe is None:
        raise ValueError(f"{what} frame is empty")
    return int(probe["_k"])


def _dose_once(calls: DataFrame, assume_unique: bool):
    """Non-null dosage observations evaluated ONCE for operators whose
    plan scans them from two branches: unique-cell producers skip the
    dedup groupBy entirely; otherwise the deduped frame is persisted
    (released with the result via release_on_gc) so the calls-width
    shuffle doesn't run once per branch. Returns (frame, wrap) where
    wrap(result) arranges the release."""
    if assume_unique:
        d = calls.select(
            "variant_id",
            "sample_id",
            dosage_alt("alleles", partial_missing=False).alias("d"),
        ).where(F.col("d").isNotNull())
        return d, (lambda result: result)
    d = _dose_flat(calls).where(F.col("d").isNotNull()).persist()

    from seqarray_spark.plans.lifecycle import release_on_gc

    return d, (lambda result: release_on_gc(d, result))


def _dose_nn(calls: DataFrame, assume_unique: bool) -> DataFrame:
    """Non-null dosage observations for a SINGLE-consumer plan: the
    `_dose_once` twin without the persist. Persisting only pays when
    two or more branches of the returned plan scan the frame; for the
    one-consumer operators (the assoc family, each diff_discordance
    side) the persist was pure overhead — a serialize-into-storage
    copy of the full dose relation per query that the very next
    clearCache dropped (guide §5: cache only what is reused)."""
    if assume_unique:
        return calls.select(
            "variant_id",
            "sample_id",
            dosage_alt("alleles", partial_missing=False).alias("d"),
        ).where(F.col("d").isNotNull())
    return _dose_flat(calls).where(F.col("d").isNotNull())


def pca_snp_loadings(
    calls: DataFrame,
    weights: DataFrame,
    unit_scale: int = 6,
    assume_unique: bool = False,
    k: int | None = None,
) -> DataFrame:
    """Per-variant PCA loadings — the SNPRelate snpgdsPCASNPLoading
    step (reference ecosystem; SeqArray delegates): given per-sample
    component weights W (normally grm_pca*/grm_pca_distributed's PCs),
    L_vc = sum_s z_vs * W_sc over the frequency-standardized dosage z.
    With W the sample eigenvectors, L is the variant-axis eigenbasis —
    what projects NEW cohorts onto reference PCs (pca_project_samples)
    and what per-variant PC-correlation screens read.

    `weights`: (sample_id, w array<double>) — k small; the frame is
    broadcast (bounded by n_samples rows). Per-(variant, sample, c)
    products are quantized to integer 10^-unit_scale units before the
    BIGINT sum (the grm_pairs rule), so loadings are
    aggregation-order-free and oracle-checkable. Plan: one dedup
    groupBy (PERSISTED — the stats branch and the scoring branch both
    read it, and Catalyst's ReuseExchange does not canonicalize the
    two agg lineages together; measured: without the persist the full
    calls-width dedup shuffles twice), one stats agg, two broadcast
    joins, one variant-keyed partial agg — no wide self-join anywhere
    (loadings are LINEAR in the data, unlike the GRM's pair blowup).
    `assume_unique=True` skips the dedup groupBy entirely (producers
    that guarantee one observation per cell — the engine's own
    VCF/GDS imports), leaving NO shuffle before the final agg.

    Output: (variant_id, l array<double> of k loadings). Scaling
    conventions (1/sqrt(eigenvalue), 1/m) vary across tools; this is
    the raw Z'W — callers apply their convention. `k=` (or a producer
    `_k` metadata stamp on `w`) skips the width-probe driver job."""
    k = _array_width(weights, "w", k, "weights")
    d, release = _dose_once(calls, assume_unique)
    dd = d.join(F.broadcast(_stats_from_dose(d)), "variant_id").join(
        F.broadcast(weights), "sample_id"
    )
    scale = float(10 ** int(unit_scale))
    z = _z_expr()
    aggs = [
        F.sum(
            F.round(z * F.element_at("w", c + 1) * F.lit(scale)).cast(
                "bigint"
            )
        ).alias(f"_u{c}")
        for c in range(k)
    ]
    out = dd.groupBy("variant_id").agg(*aggs)
    return release(
        out.select(
            "variant_id",
            F.array(
                *[
                    (F.col(f"_u{c}").cast("double") / F.lit(scale))
                    for c in range(k)
                ]
            ).alias("l", metadata={"_k": k}),
        )
    )


def pca_project_samples(
    calls: DataFrame,
    loadings: DataFrame,
    freqs: DataFrame | None = None,
    unit_scale: int = 6,
    assume_unique: bool = False,
    k: int | None = None,
) -> DataFrame:
    """Project samples onto variant loadings — the SNPRelate
    snpgdsPCASampLoading step: P_sc = sum_v z'_vs * L_vc, the biobank
    workflow that places a NEW cohort in a reference cohort's PC space
    (ancestry assignment for association-study covariates) without
    re-running the eigensolve.

    `freqs` MUST be the REFERENCE cohort's dosage_stats(...) when
    projecting new samples — standardizing by the new cohort's own
    frequencies shifts the projection (the classic projection bug);
    omitted, stats come from `calls` itself (self-projection). Same
    integer-unit quantization as pca_snp_loadings; variants absent
    from `loadings` or `freqs` contribute nothing (inner joins), and
    fully-missing dosages drop. Plan: two broadcast-able dimension
    joins + one sample-keyed partial agg — linear in calls.

    Output: (sample_id, p array<double> of k projections). `k=` (or
    the loadings producer's `_k` metadata stamp) skips the width-probe
    driver job, which otherwise materializes the WHOLE loadings
    pipeline once just to read the array length."""
    k = _array_width(loadings, "l", k, "loadings")
    if freqs is None:
        # self-projection: stats and scoring both scan the dose frame,
        # so share one evaluation (see _dose_once)
        d, release = _dose_once(calls, assume_unique)
        freqs = _stats_from_dose(d)
    elif assume_unique:
        d, release = _dose_once(calls, True)
    else:
        # external reference freqs: the dose frame has ONE consumer —
        # no persist needed
        d = _dose_flat(calls).where(F.col("d").isNotNull())
        release = lambda result: result  # noqa: E731
    dd = d.join(freqs, "variant_id").join(loadings, "variant_id")
    scale = float(10 ** int(unit_scale))
    z = _z_expr()
    aggs = [
        F.sum(
            F.round(z * F.element_at("l", c + 1) * F.lit(scale)).cast(
                "bigint"
            )
        ).alias(f"_u{c}")
        for c in range(k)
    ]
    out = dd.groupBy("sample_id").agg(*aggs)
    return release(
        out.select(
            "sample_id",
            F.array(
                *[
                    (F.col(f"_u{c}").cast("double") / F.lit(scale))
                    for c in range(k)
                ]
            ).alias("p", metadata={"_k": k}),
        )
    )


def _DOSE_ST_CTE_SQL() -> str:
    """dose/dnn/st CTEs (dedup dosage + per-variant polymorphic stats)
    shared by the loadings/projection oracles — the same text
    _GRM_PAIRS_CTE_SQL inlines."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), st AS (
          SELECT variant_id, COUNT(*) AS n_obs, CAST(SUM(d) AS BIGINT) AS s_sum
          FROM dnn GROUP BY variant_id
          HAVING CAST(SUM(d) AS BIGINT) > 0
             AND CAST(SUM(d) AS BIGINT) < 2 * COUNT(*)
        )
    """


_Z_SQL = """((CAST(dnn.d AS DOUBLE)
              - (CAST(st.s_sum AS DOUBLE) / CAST(st.n_obs AS DOUBLE)))
             / sqrt((CAST(st.s_sum AS DOUBLE) / CAST(st.n_obs AS DOUBLE))
                    * (1.0 - (CAST(st.s_sum AS DOUBLE)
                              / CAST(st.n_obs AS DOUBLE)) / 2.0)))"""


def pca_loadings_oracle_sql(n_cols: int = 4, unit_scale: int = 6) -> str:
    """DuckDB oracle twin of pca_snp_loadings under the deterministic
    md5-Rademacher weights (the same omega rule as grm_sketch_y);
    caller prepends oracle_prelude(). Output (variant_id, l_0..)
    scalars — the gate flattens the array for dialect-stable hashing."""
    evens = ", ".join(f"'{e}'" for e in _OMEGA_EVENS)
    scale = float(10 ** int(unit_scale))

    def om(c: int) -> str:
        return (
            f"(CASE WHEN substr(md5(dnn.sample_id || ':{c}'), 1, 1) "
            f"IN ({evens}) THEN 1 ELSE -1 END)"
        )

    ls = ",\n               ".join(
        f"CAST(SUM(CAST(round({_Z_SQL} * {om(c)} * {scale!r}) AS BIGINT)) "
        f"AS DOUBLE) / {scale!r} AS l_{c}"
        for c in range(int(n_cols))
    )
    return f"""{_DOSE_ST_CTE_SQL()}
        SELECT dnn.variant_id,
               {ls}
        FROM dnn JOIN st ON st.variant_id = dnn.variant_id
        GROUP BY dnn.variant_id
    """


def pca_project_oracle_sql(n_cols: int = 4, unit_scale: int = 6) -> str:
    """DuckDB oracle twin of pca_snp_loadings -> pca_project_samples
    composed end to end under the md5-Rademacher weights: stage 1's
    integer-unit loadings feed stage 2's integer-unit projections, the
    full two-stage replay."""
    evens = ", ".join(f"'{e}'" for e in _OMEGA_EVENS)
    scale = float(10 ** int(unit_scale))

    def om(c: int) -> str:
        return (
            f"(CASE WHEN substr(md5(dnn.sample_id || ':{c}'), 1, 1) "
            f"IN ({evens}) THEN 1 ELSE -1 END)"
        )

    ls = ",\n                 ".join(
        f"CAST(SUM(CAST(round({_Z_SQL} * {om(c)} * {scale!r}) AS BIGINT)) "
        f"AS DOUBLE) / {scale!r} AS l_{c}"
        for c in range(int(n_cols))
    )
    ps = ",\n               ".join(
        f"CAST(SUM(CAST(round({_Z_SQL} * ld.l_{c} * {scale!r}) AS BIGINT)) "
        f"AS DOUBLE) / {scale!r} AS p_{c}"
        for c in range(int(n_cols))
    )
    return f"""{_DOSE_ST_CTE_SQL()}
        , ld AS (
          SELECT dnn.variant_id,
                 {ls}
          FROM dnn JOIN st ON st.variant_id = dnn.variant_id
          GROUP BY dnn.variant_id
        )
        SELECT dnn.sample_id,
               {ps}
        FROM dnn
        JOIN st ON st.variant_id = dnn.variant_id
        JOIN ld ON ld.variant_id = dnn.variant_id
        GROUP BY dnn.sample_id
    """


def king_from_packed(
    packed: DataFrame,
    sample_ids: list[str],
    min_n: int = 1,
) -> DataFrame:
    """KING-robust kinship for every sample pair over the 2-bit packed
    column (Manichaikul et al. 2010, the estimator biobank QC actually
    runs — robust to population structure, unlike the allele-frequency-
    standardized GRM):

        phi_ij = (N_het,het − 2·N_opp-hom) / (N_het(i;j) + N_het(j;i))

    over co-called sites, where N_het(i;j) counts sites where i is
    heterozygous among those co-called with j. Every term is an exact
    integer from the same one-hot matmuls as IBS: N_het,het = I1'I1,
    N_opp-hom = I0'I2 + I2'I0, and the het-given-co-called matrix
    H = I1'(I0+I1+I2) gives both asymmetric terms as H_ij and H_ji.
    Same zero-wide-shuffle mapInArrow shape; kinship is NULL when
    neither sample is ever het on co-called sites (denominator 0 —
    e.g. fully homozygous pairs). Thresholds: ~0.354+ duplicates/MZ
    twins, 0.177-0.354 first degree, 0.088-0.177 second degree."""
    import numpy as np
    import pyarrow as pa

    from seqarray_spark.sources.packed import _code_lut

    n_samp_expected = len(sample_ids)
    if n_samp_expected < 2:
        raise ValueError("KING needs >= 2 samples")
    iu, ju = np.triu_indices(n_samp_expected, k=1)

    def kernel(batches):
        codes_lut = _code_lut()
        hh = np.zeros((n_samp_expected, n_samp_expected))
        opp = np.zeros_like(hh)
        het = np.zeros_like(hh)  # H[i, j] = co-called sites where i het
        ms = np.zeros_like(hh)
        saw = False
        for rb in batches:
            codes = _packed_batch_codes(rb, n_samp_expected, codes_lut)
            if codes is None:
                continue
            saw = True
            i0 = (codes == 0).astype(np.float64)
            i1 = (codes == 1).astype(np.float64)
            i2 = (codes == 2).astype(np.float64)
            known = i0 + i1 + i2
            hh += i1.T @ i1
            m02 = i0.T @ i2
            opp += m02 + m02.T
            het += i1.T @ known
            ms += known.T @ known
        if saw:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(iu.astype(np.int32)),
                    pa.array(ju.astype(np.int32)),
                    pa.array(hh[iu, ju]),
                    pa.array(opp[iu, ju]),
                    pa.array(het[iu, ju]),
                    pa.array(het.T[iu, ju]),
                    pa.array(ms[iu, ju]),
                ],
                names=["_si", "_sj", "hh", "opp", "het_i", "het_j", "pm"],
            )

    partials = packed.select("variant_id", "n_samples", "packed").mapInArrow(
        kernel,
        schema=(
            "_si int, _sj int, hh double, opp double, het_i double, "
            "het_j double, pm double"
        ),
    )
    labels = F.array(*[F.lit(s) for s in sample_ids])
    hsum = (F.sum("het_i") + F.sum("het_j")).cast("bigint")
    phi = F.when(
        hsum > 0,
        (F.sum("hh").cast("bigint").cast("double")
         - 2.0 * F.sum("opp").cast("bigint").cast("double"))
        / hsum.cast("double"),
    )
    return (
        _spread_pairs(partials).groupBy("_si", "_sj")
        .agg(
            F.sum("pm").cast("bigint").alias("m_used"),
            phi.alias("kinship"),
        )
        .where(F.col("m_used") >= int(min_n))
        .select(
            F.element_at(labels, F.col("_si") + 1).alias("sample_i"),
            F.element_at(labels, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            "kinship",
        )
    )


def king_packed_oracle_sql(min_n: int = 1) -> str:
    """DuckDB oracle twin of pack_2bit_genotypes -> king_from_packed
    over the gvariants/gcalls CTEs: pairwise het/opp-hom counts with
    the packed ($dosage_alt2, MAX-dedupe) semantics, identical final
    float expression."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_PACKED_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), s AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 COUNT(*) AS m_used,
                 CAST(SUM(CASE WHEN a.d = 1 AND b.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hh,
                 CAST(SUM(CASE WHEN ABS(a.d - b.d) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS opp,
                 CAST(SUM(CASE WHEN a.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS het_i,
                 CAST(SUM(CASE WHEN b.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS het_j
          FROM dnn a JOIN dnn b ON a.variant_id = b.variant_id
                              AND a.sample_id < b.sample_id
          GROUP BY a.sample_id, b.sample_id
        )
        SELECT sample_i, sample_j, m_used,
               CASE WHEN het_i + het_j > 0
                    THEN (CAST(hh AS DOUBLE) - 2.0 * CAST(opp AS DOUBLE))
                         / CAST(het_i + het_j AS DOUBLE)
               END AS kinship
        FROM s WHERE m_used >= {int(min_n)}
    """


def ibd_mom_from_packed(
    packed: DataFrame,
    sample_ids: list[str],
    min_m: int = 1,
) -> DataFrame:
    """PLINK-style method-of-moments IBD for every sample pair over the
    2-bit packed column — the snpgdsIBDMoM / `plink --genome` estimator
    (Purcell et al. 2007) the reference ecosystem runs for pedigree QC
    beside KING: observed IBS-sharing counts vs their allele-frequency
    expectations give the IBD-state mix

        k0 = N_IBS0 / sum_S 2 p^2 q^2
        k1 = (N_IBS1 - k0 * sum_S (4p^3q + 4pq^3)) / sum_S (2p^2q + 2pq^2)
        kinship = (1 - k0 - k1)/2 + k1/4     (k2 = 1 - k0 - k1)

    with every sum over the pair's CO-CALLED variants S and p the
    variant's alt-allele frequency over its called samples (the same
    $dosage_alt2 universe the packed column stores). Raw unconstrained
    estimates — PLINK's optional small-sample corrections and [0,1]
    clamping are presentation policy, applied by callers; documented
    divergence, like ld_prune's dominated default.

    Same zero-wide-shuffle mapInArrow shape as ibs/king: the observed
    counts are the one-hot matmuls (N_IBS0 = I0'I2 + I2'I0, N_IBS1 =
    the four one-apart products), and each expectation sum restricted
    to S decomposes as ONE weighted matmul, (w ⊙ known)' known, with w
    the per-variant expectation quantized to integer 1e-6 units
    (np.floor(w*1e6 + 0.5) — half-up, the rounding Spark SQL and
    DuckDB share; numpy's bankers' round would hash-diverge on exact
    halves like p=1/4 -> 70312.5). All accumulated quantities are
    exact integers in float64; k0/k1/kinship are the only real float
    ops, spelled identically engine- and oracle-side. NULL k0 when the
    pair's expectation mass is zero (co-called only at monomorphic
    sites); k1/kinship NULL with it."""
    import numpy as np
    import pyarrow as pa

    from seqarray_spark.sources.packed import _code_lut

    n_samp_expected = len(sample_ids)
    if n_samp_expected < 2:
        raise ValueError("IBD MoM needs >= 2 samples")
    iu, ju = np.triu_indices(n_samp_expected, k=1)

    def kernel(batches):
        codes_lut = _code_lut()
        shape = (n_samp_expected, n_samp_expected)
        n0 = np.zeros(shape)
        n1 = np.zeros(shape)
        ms = np.zeros(shape)
        sw0 = np.zeros(shape)
        sw10 = np.zeros(shape)
        sw11 = np.zeros(shape)
        saw = False
        for rb in batches:
            codes = _packed_batch_codes(rb, n_samp_expected, codes_lut)
            if codes is None:
                continue
            saw = True
            i0 = (codes == 0).astype(np.float64)
            i1 = (codes == 1).astype(np.float64)
            i2 = (codes == 2).astype(np.float64)
            known = i0 + i1 + i2
            m02 = i0.T @ i2
            n0 += m02 + m02.T
            m01 = i0.T @ i1
            m12 = i1.T @ i2
            n1 += m01 + m01.T + m12 + m12.T
            ms += known.T @ known
            cnt = known.sum(axis=1)
            s = (i1 + 2.0 * i2).sum(axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                p = np.where(cnt > 0, s / (2.0 * cnt), 0.0)
            q = 1.0 - p
            w0 = np.floor(2.0 * p * p * q * q * 1000000.0 + 0.5)
            w10 = np.floor(
                (4.0 * p * p * p * q + 4.0 * p * q * q * q) * 1000000.0
                + 0.5
            )
            w11 = np.floor(
                (2.0 * p * p * q + 2.0 * p * q * q) * 1000000.0 + 0.5
            )
            sw0 += (w0[:, None] * known).T @ known
            sw10 += (w10[:, None] * known).T @ known
            sw11 += (w11[:, None] * known).T @ known
        if saw:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(iu.astype(np.int32)),
                    pa.array(ju.astype(np.int32)),
                    pa.array(n0[iu, ju]),
                    pa.array(n1[iu, ju]),
                    pa.array(ms[iu, ju]),
                    pa.array(sw0[iu, ju]),
                    pa.array(sw10[iu, ju]),
                    pa.array(sw11[iu, ju]),
                ],
                names=["_si", "_sj", "n0", "n1", "pm", "sw0", "sw10", "sw11"],
            )

    partials = packed.select("variant_id", "n_samples", "packed").mapInArrow(
        kernel,
        schema=(
            "_si int, _sj int, n0 double, n1 double, pm double, "
            "sw0 double, sw10 double, sw11 double"
        ),
    )
    labels = F.array(*[F.lit(s) for s in sample_ids])
    agg = (
        _spread_pairs(partials).groupBy("_si", "_sj")
        .agg(
            F.sum("pm").cast("bigint").alias("m_used"),
            F.sum("n0").cast("bigint").alias("_n0"),
            F.sum("n1").cast("bigint").alias("_n1"),
            F.sum("sw0").cast("bigint").alias("_sw0"),
            F.sum("sw10").cast("bigint").alias("_sw10"),
            F.sum("sw11").cast("bigint").alias("_sw11"),
        )
        .where(F.col("m_used") >= int(min_m))
    )
    # the SAME float expression tree the oracle spells (k0 inlined into
    # k1 so both engines evaluate identical op sequences)
    k0 = F.when(
        F.col("_sw0") > 0,
        F.col("_n0").cast("double")
        / (F.col("_sw0").cast("double") / F.lit(1000000.0)),
    )
    k1 = F.when(
        (F.col("_sw0") > 0) & (F.col("_sw11") > 0),
        (
            F.col("_n1").cast("double")
            - k0 * (F.col("_sw10").cast("double") / F.lit(1000000.0))
        )
        / (F.col("_sw11").cast("double") / F.lit(1000000.0)),
    )
    kin = F.when(
        (F.col("_sw0") > 0) & (F.col("_sw11") > 0),
        (F.lit(1.0) - k0 - k1) / F.lit(2.0) + k1 / F.lit(4.0),
    )
    return agg.select(
        F.element_at(labels, F.col("_si") + 1).alias("sample_i"),
        F.element_at(labels, F.col("_sj") + 1).alias("sample_j"),
        "m_used",
        k0.alias("k0"),
        k1.alias("k1"),
        kin.alias("kinship"),
    )


def ibd_mom_packed_oracle_sql(min_m: int = 1) -> str:
    """DuckDB oracle twin of pack_2bit_genotypes -> ibd_mom_from_packed
    over the gvariants/gcalls CTEs: packed-dose dedup, per-variant
    allele frequency over called samples, expectation weights on the
    identical half-up 1e-6 unit grid, co-called pair sums, the same
    final float tree."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_PACKED_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), stp AS (
          SELECT variant_id,
                 CAST(SUM(d) AS DOUBLE)
                   / (2.0 * CAST(COUNT(*) AS DOUBLE)) AS p
          FROM dnn GROUP BY variant_id
        ), wts AS (
          SELECT variant_id,
                 CAST(floor(2.0 * p * p * (1.0 - p) * (1.0 - p)
                            * 1000000.0 + 0.5) AS BIGINT) AS w0,
                 CAST(floor((4.0 * p * p * p * (1.0 - p)
                             + 4.0 * p * (1.0 - p) * (1.0 - p) * (1.0 - p))
                            * 1000000.0 + 0.5) AS BIGINT) AS w10,
                 CAST(floor((2.0 * p * p * (1.0 - p)
                             + 2.0 * p * (1.0 - p) * (1.0 - p))
                            * 1000000.0 + 0.5) AS BIGINT) AS w11
          FROM stp
        ), s AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 COUNT(*) AS m_used,
                 CAST(SUM(CASE WHEN ABS(a.d - b.d) = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n0,
                 CAST(SUM(CASE WHEN ABS(a.d - b.d) = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(SUM(w.w0) AS BIGINT) AS sw0,
                 CAST(SUM(w.w10) AS BIGINT) AS sw10,
                 CAST(SUM(w.w11) AS BIGINT) AS sw11
          FROM dnn a
          JOIN dnn b ON a.variant_id = b.variant_id
                    AND a.sample_id < b.sample_id
          JOIN wts w ON w.variant_id = a.variant_id
          GROUP BY a.sample_id, b.sample_id
        )
        SELECT sample_i, sample_j, m_used,
               CASE WHEN sw0 > 0
                    THEN CAST(n0 AS DOUBLE)
                         / (CAST(sw0 AS DOUBLE) / 1000000.0) END AS k0,
               CASE WHEN sw0 > 0 AND sw11 > 0
                    THEN (CAST(n1 AS DOUBLE)
                          - (CAST(n0 AS DOUBLE)
                             / (CAST(sw0 AS DOUBLE) / 1000000.0))
                            * (CAST(sw10 AS DOUBLE) / 1000000.0))
                         / (CAST(sw11 AS DOUBLE) / 1000000.0) END AS k1,
               CASE WHEN sw0 > 0 AND sw11 > 0
                    THEN (1.0
                          - (CAST(n0 AS DOUBLE)
                             / (CAST(sw0 AS DOUBLE) / 1000000.0))
                          - ((CAST(n1 AS DOUBLE)
                              - (CAST(n0 AS DOUBLE)
                                 / (CAST(sw0 AS DOUBLE) / 1000000.0))
                                * (CAST(sw10 AS DOUBLE) / 1000000.0))
                             / (CAST(sw11 AS DOUBLE) / 1000000.0))) / 2.0
                         + ((CAST(n1 AS DOUBLE)
                             - (CAST(n0 AS DOUBLE)
                                / (CAST(sw0 AS DOUBLE) / 1000000.0))
                               * (CAST(sw10 AS DOUBLE) / 1000000.0))
                            / (CAST(sw11 AS DOUBLE) / 1000000.0)) / 4.0
                    END AS kinship
        FROM s WHERE m_used >= {int(min_m)}
    """


def inbreeding_coeff(
    calls: DataFrame,
    min_m: int = 1,
    assume_unique: bool = False,
) -> DataFrame:
    """Per-sample method-of-moments inbreeding coefficient — the
    snpgdsIndInb('mom.visscher') / `plink --het` F statistic the
    reference ecosystem runs as a standard sample-QC column:

        F_s = (O_hom(s) - E_hom(s)) / (m_s - E_hom(s))

    over sample s's called polymorphic variants, where O_hom counts
    observed homozygous genotypes (dosage 0 or 2) and E_hom sums the
    per-variant HWE expectation 1 - 2pq (p the variant's alt frequency
    over ITS called samples). Raw uncorrected expectation — PLINK's
    2pq*n/(n-1) small-sample factor is caller policy, same divergence
    note as ibd_mom_from_packed.

    Fully linear: one shared dose evaluation (_dose_once), one
    per-variant stats agg (broadcast back), one sample-keyed partial
    agg — no pair blowup, no wide self-join. Expectations quantized to
    half-up 1e-6 integer units before the BIGINT sum, so F is
    aggregation-order-free and oracle-checkable (gate seq_inbreeding).
    Monomorphic variants are excluded (they are uninformative for F
    and PLINK excludes them too); F is NULL when m == E_hom exactly
    (degenerate denominator). Output: (sample_id, m_used, o_hom,
    inbreeding)."""
    d, release = _dose_once(calls, assume_unique)
    st = _stats_from_dose(d)  # polymorphic only
    twop = F.col("dose_sum").cast("double") / F.col("n_obs").cast("double")
    p = twop / F.lit(2.0)
    e_units = F.round(
        (F.lit(1.0) - F.lit(2.0) * p * (F.lit(1.0) - p)) * F.lit(1000000.0)
    ).cast("bigint")
    dd = d.join(F.broadcast(st.select("variant_id", e_units.alias("_e"))),
                "variant_id")
    agg = (
        dd.groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).alias("m_used"),
            F.sum(F.col("d").isin(0, 2).cast("bigint")).alias("o_hom"),
            F.sum("_e").alias("_se"),
        )
        .where(F.col("m_used") >= int(min_m))
    )
    e_hom = F.col("_se").cast("double") / F.lit(1000000.0)
    denom = F.col("m_used").cast("double") - e_hom
    out = agg.select(
        "sample_id",
        "m_used",
        "o_hom",
        F.when(
            denom != 0.0,
            (F.col("o_hom").cast("double") - e_hom) / denom,
        ).alias("inbreeding"),
    )
    return release(out)


def inbreeding_oracle_sql(min_m: int = 1) -> str:
    """DuckDB oracle twin of inbreeding_coeff over the gcalls CTE
    (caller prepends oracle_prelude()): same dedup dose, polymorphic
    stats, half-up 1e-6 expectation units, same final float tree."""
    return f"""{_DOSE_ST_CTE_SQL()}
        , wts AS (
          SELECT variant_id,
                 CAST(round((1.0 - 2.0
                             * ((CAST(s_sum AS DOUBLE) / CAST(n_obs AS DOUBLE)) / 2.0)
                             * (1.0 - (CAST(s_sum AS DOUBLE) / CAST(n_obs AS DOUBLE)) / 2.0))
                            * 1000000.0) AS BIGINT) AS e_units
          FROM st
        ), s AS (
          SELECT dnn.sample_id,
                 COUNT(*) AS m_used,
                 CAST(SUM(CASE WHEN dnn.d IN (0, 2) THEN 1 ELSE 0 END)
                      AS BIGINT) AS o_hom,
                 CAST(SUM(w.e_units) AS BIGINT) AS se
          FROM dnn JOIN wts w ON w.variant_id = dnn.variant_id
          GROUP BY dnn.sample_id
        )
        SELECT sample_id, m_used, o_hom,
               CASE WHEN (CAST(m_used AS DOUBLE)
                          - CAST(se AS DOUBLE) / 1000000.0) <> 0.0
                    THEN (CAST(o_hom AS DOUBLE)
                          - CAST(se AS DOUBLE) / 1000000.0)
                         / (CAST(m_used AS DOUBLE)
                            - CAST(se AS DOUBLE) / 1000000.0) END
                 AS inbreeding
        FROM s WHERE m_used >= {int(min_m)}
    """


def hwe_test(
    calls: DataFrame,
    min_n: int = 1,
    assume_unique: bool = False,
) -> DataFrame:
    """Per-variant Hardy-Weinberg equilibrium chi-square — the
    snpgdsHWE / `plink --hardy` QC column (variants failing HWE flag
    genotyping error): observed genotype counts (hom-ref, het, hom-alt
    from the diploid dosage) vs expectations under the variant's own
    allele frequency,

        X^2 = sum_g (O_g - E_g)^2 / E_g,   E = n*(1-q)^2, 2nq(1-q), nq^2

    with q the alt frequency (2*hom_alt + het) / 2n. One dedup dose
    evaluation and ONE variant-keyed agg — fully linear, no joins.
    Monomorphic variants get NULL chisq (zero expected cells; they are
    trivially in HWE and PLINK skips them too). Dosage-1 calls on
    ploidy>2 data would miscount genotype classes — this operator is
    defined for diploid dosage 0/1/2, like the estimators upstream.
    Every input to the float tree is an exact integer (counts), so the
    statistic value-hashes against the SQL oracle (gate seq_hwe). The
    exact-test p-value (Wigginton 2005) is the hwe_exact_p companion —
    its per-variant recurrence is not SQL-expressible, so it is
    pytest-pinned against an independent exact-rational implementation
    instead of gated. Output: (variant_id, n_hom_ref, n_het,
    n_hom_alt, hwe_chisq)."""
    d = _dose_nn(calls, assume_unique)
    agg = (
        d.groupBy("variant_id")
        .agg(
            F.sum((F.col("d") == 0).cast("bigint")).alias("n_hom_ref"),
            F.sum((F.col("d") == 1).cast("bigint")).alias("n_het"),
            F.sum((F.col("d") == 2).cast("bigint")).alias("n_hom_alt"),
        )
        .where(
            (F.col("n_hom_ref") + F.col("n_het") + F.col("n_hom_alt"))
            >= int(min_n)
        )
    )
    n = (
        F.col("n_hom_ref") + F.col("n_het") + F.col("n_hom_alt")
    ).cast("double")
    q = (
        F.lit(2.0) * F.col("n_hom_alt").cast("double")
        + F.col("n_het").cast("double")
    ) / (F.lit(2.0) * n)
    p = F.lit(1.0) - q
    e_rr = n * p * p
    e_het = F.lit(2.0) * n * p * q
    e_aa = n * q * q
    chisq = (
        (F.col("n_hom_ref").cast("double") - e_rr)
        * (F.col("n_hom_ref").cast("double") - e_rr)
        / e_rr
        + (F.col("n_het").cast("double") - e_het)
        * (F.col("n_het").cast("double") - e_het)
        / e_het
        + (F.col("n_hom_alt").cast("double") - e_aa)
        * (F.col("n_hom_alt").cast("double") - e_aa)
        / e_aa
    )
    poly = (q > 0.0) & (q < 1.0)
    out = agg.select(
        "variant_id",
        "n_hom_ref",
        "n_het",
        "n_hom_alt",
        F.when(poly, chisq).alias("hwe_chisq"),
    )
    return out


_HWE_BUFS: dict = {}  # _hwe_exact_p_grid's cross-call work-buffer pool


def _hwe_exact_p_grid(rr, het, aa, elem_budget: int = 1 << 22):
    """Vectorized Wigginton exact HWE p over integer genotype-count
    arrays -> p-value array (np.nan where undefined). The per-variant
    while-loops of the r11 form were O(min(nA, nB)) PYTHON interpreter
    steps per variant — correct but ~10^5 float ops each at biobank
    width. Here the whole support distribution comes from the CLOSED
    FORM instead of the recurrence:

        log w(h) = h*ln2 - (lgam[hom_r] + lgam[h] + lgam[hom_c])

    (the shared n!/... constant cancels in the normalized two-sided
    sum), with lgam the log-factorial table built once per call by an
    extended-precision cumsum (float64 accumulation error over a 10^5-
    entry prefix would reach ~1e-8 in the tail; np.longdouble keeps it
    ~1e-11, then the table is cast down).

    Two exactness-preserving cuts make it fast at biobank width:

    - SUPPORT WINDOW: any support point more than ~746 log-units below
      the mode underflows to exactly 0.0 after the max-normalized exp —
      contributing nothing to either sum, the same behavior as the
      sequential walk (which also underflows its far tails). Each row's
      window [jL, jR] is found by vectorized bisection on the closed
      form around Wigginton's mid (target = logw(mid) - 760: 746 for
      the float64 underflow horizon + slack covering mid-vs-true-mode
      offset), so the padded grid holds only cells that can matter —
      O(sqrt(n)) of the O(n) support for common variants.
    - PREALLOCATED BUFFERS + in-place ufuncs: fresh tens-of-MB numpy
      temporaries are page-fault dominated (~10x the arithmetic cost,
      measured), so every chunk reuses one set of work arrays.

    Per padded (rows, max_window) chunk the cost is three table
    gathers + one exp pass + masked sums — no cumprods, no sequential
    dependency. Tie slack (<= obs * (1+1e-12)) matches the recurrence
    form; symmetric-support exact ties still register exactly because
    equal index triples gather identical table entries. An observed
    het OUTSIDE the window has z_obs = 0 exactly as its full-grid cell
    would, so p collapses to 0 identically.

    Rows are processed in window-sorted chunks capped at elem_budget
    grid cells (~5 live grids -> a few hundred MB peak per Python
    worker at the default), so a batch mixing a 100k-support variant
    with thousands of small ones never allocates rows x 100k."""
    import numpy as np

    rr = np.asarray(rr, dtype=np.int64)
    het = np.asarray(het, dtype=np.int64)
    aa = np.asarray(aa, dtype=np.int64)
    n_tot = rr + het + aa
    rare = 2 * np.minimum(rr, aa) + het
    out = np.full(rr.shape, np.nan)
    ok = (n_tot > 0) & (rare > 0) & (rare < 2 * n_tot)
    if not ok.any():
        return out
    idx_all = np.flatnonzero(ok)

    # log-factorial table: lgam[k] = log(k!), extended-precision cumsum
    n_max = int(n_tot[idx_all].max())
    lgam = np.zeros(n_max + 1)
    lgam[1:] = np.cumsum(
        np.log(np.arange(1, n_max + 1, dtype=np.longdouble))
    ).astype(np.float64)
    ln2 = float(np.log(2.0))

    r_ok = rare[idx_all]
    n_ok = n_tot[idx_all]
    par_ok = r_ok % 2
    m_ok = r_ok // 2 + 1

    def logw_at(j):
        """Closed-form log-weight at support index j (row vectors);
        j must be within [0, m-1] so the factorial indices are valid."""
        h = par_ok + 2 * j
        hom_r = (r_ok - h) >> 1
        hom_c = n_ok - h - hom_r
        return h * ln2 - (lgam[hom_r] + lgam[h] + lgam[hom_c])

    # Wigginton's mid het value ~ the distribution mode
    mid = r_ok * (2 * n_ok - r_ok) // (2 * n_ok)
    mid = np.where(mid % 2 != par_ok, mid + 1, mid)
    j_mid = (mid - par_ok) // 2
    target = logw_at(j_mid) - 760.0

    # left crossing: smallest j in [0, j_mid] with logw >= target
    lo = np.zeros(len(idx_all), dtype=np.int64)
    hi = j_mid.copy()
    while True:
        active = lo < hi
        if not active.any():
            break
        probe = (lo + hi) >> 1
        ge = logw_at(probe) >= target
        hi = np.where(active & ge, probe, hi)
        lo = np.where(active & ~ge, probe + 1, lo)
    jL = lo
    # right crossing: largest j in [j_mid, m-1] with logw >= target
    lo = j_mid.copy()
    hi = m_ok - 1
    while True:
        active = lo < hi
        if not active.any():
            break
        probe = (lo + hi + 1) >> 1
        ge = logw_at(probe) >= target
        lo = np.where(active & ge, probe, lo)
        hi = np.where(active & ~ge, probe - 1, hi)
    jR = lo
    w_all = jR - jL + 1  # per-row window widths

    order = np.argsort(w_all, kind="stable")
    idx_sorted = idx_all[order]
    jL_sorted = jL[order]
    w_sorted = w_all[order]
    r_sorted = r_ok[order]
    n_sorted = n_ok[order]
    par_sorted = par_ok[order]
    het_sorted = het[idx_sorted]

    # preallocated work buffers, reused by every chunk AND across calls
    # (module-level pool): 3 int64 index grids, 2 float64 grids, 1 bool
    # mask — ~41 bytes/cell, ~170 MB at the default budget. Large numpy
    # temporaries are mmap'd and returned to the OS on free, so WITHOUT
    # the pool every Arrow batch re-pays first-touch page faults worth
    # ~2.5x the arithmetic (measured in tools/hwe_stress.py); Spark's
    # reused python workers pay it once this way. No chunk exceeds
    # budget cells unless a single row alone does — size for that too.
    # don't retain more than the batch can use: small QC batches keep
    # the pool at their own padded footprint, not the full budget
    need = int(w_sorted.sum()) + int(w_sorted.sum() // 8) + 64
    cap = max(min(int(elem_budget), need), int(w_sorted[-1]))
    pool = _HWE_BUFS
    if not pool or pool["cap"] < cap:
        pool.clear()
        pool.update(
            cap=cap,
            b_h=np.empty(cap, dtype=np.int64),
            b_r=np.empty(cap, dtype=np.int64),
            b_c=np.empty(cap, dtype=np.int64),
            f_w=np.empty(cap, dtype=np.float64),
            f_t=np.empty(cap, dtype=np.float64),
            b_m=np.empty(cap, dtype=bool),
        )
    b_h, b_r, b_c = pool["b_h"], pool["b_r"], pool["b_c"]
    f_w, f_t, b_m = pool["f_w"], pool["f_t"], pool["b_m"]

    start = 0
    n_rows = len(idx_sorted)
    while start < n_rows:
        # grow the chunk while rows * current-max-window fits the
        # POOL (cap <= elem_budget except for a single oversized row,
        # which always travels alone)
        stop = start + 1
        while (
            stop < n_rows
            and (stop + 1 - start) * int(w_sorted[stop]) <= cap
        ):
            stop += 1
        sl = slice(start, stop)
        sel = idx_sorted[sl]
        r = r_sorted[sl]
        n = n_sorted[sl]
        parity = par_sorted[sl]
        h_obs = het_sorted[sl]
        wlo = jL_sorted[sl]
        wm = w_sorted[sl]
        m = r // 2 + 1
        start = stop

        rows = len(sel)
        K = int(wm.max())
        shape = (rows, K)
        ncell = rows * K
        h = b_h[:ncell].reshape(shape)
        hom_r = b_r[:ncell].reshape(shape)
        hom_c = b_c[:ncell].reshape(shape)
        logw = f_w[:ncell].reshape(shape)
        tmp = f_t[:ncell].reshape(shape)
        valid = b_m[:ncell].reshape(shape)

        J = np.arange(K, dtype=np.int64)[None, :]
        np.less(J, wm[:, None], out=valid)
        np.add(J, wlo[:, None], out=h)  # absolute support index
        h <<= 1
        h += parity[:, None]
        np.subtract(r[:, None], h, out=hom_r)
        hom_r >>= 1
        np.subtract(n[:, None], h, out=hom_c)
        hom_c -= hom_r
        # padded cells can index out of table range — clamp, then -inf
        np.clip(hom_r, 0, n_max, out=hom_r)
        np.clip(hom_c, 0, n_max, out=hom_c)
        np.clip(h, 0, n_max, out=h)

        np.take(lgam, hom_r, out=logw)
        np.take(lgam, h, out=tmp)
        logw += tmp
        np.take(lgam, hom_c, out=tmp)
        logw += tmp
        np.multiply(h, ln2, out=tmp)
        np.subtract(tmp, logw, out=logw)
        np.logical_not(valid, out=valid)  # valid's window job is done
        logw[valid] = -np.inf
        logw -= logw.max(axis=1)[:, None]
        np.exp(logw, out=logw)  # z; padded cells exp(-inf) = 0

        total = logw.sum(axis=1)
        j_obs = (h_obs - parity) // 2
        obs_ok = (h_obs % 2 == parity) & (j_obs >= 0) & (j_obs < m)
        j_rel = j_obs - wlo
        in_win = (j_rel >= 0) & (j_rel < wm)
        z_obs = np.where(
            in_win,
            logw[np.arange(rows), np.clip(j_rel, 0, K - 1)],
            0.0,  # outside the window == underflowed to 0 in full grid
        )
        np.less_equal(logw, (z_obs * (1 + 1e-12))[:, None], out=valid)
        p = np.minimum(1.0, logw.sum(axis=1, where=valid) / total)
        out[sel] = np.where(obs_ok, p, np.nan)
    return out


def hwe_exact_p(counts: DataFrame) -> DataFrame:
    """Wigginton et al. 2005 exact HWE p-value on top of hwe_test's
    counts — what snpgdsHWE actually reports at low counts where the
    chi-square approximation fails. Per variant: the conditional
    distribution of the het count given the allele counts follows the
    hypergeometric-like recurrence

        P(het+2)/P(het) = 4 * nA' * nB' / ((het+2) * (het+1))

    walked across the support from the mid het value; p = sum of all
    P(h) <= P(obs) (SNPRelate's two-sided definition). One
    Arrow-batched pandas UDF over the counts frame; inside the batch
    the walk is a numpy cumprod over a padded support grid
    (_hwe_exact_p_grid — VERDICT r11 item 3: the former per-variant
    Python while-loops were ~10^5 interpreter steps each at biobank
    width; the grid form is ~40x faster at n=100k samples, measured
    in tools/hwe_stress.py). NULL for monomorphic variants."""
    import pandas as pd

    @F.pandas_udf("double")
    def _p(n_rr, n_het, n_aa):
        return pd.Series(
            _hwe_exact_p_grid(
                n_rr.to_numpy(), n_het.to_numpy(), n_aa.to_numpy()
            )
        )

    return counts.select(
        "*",
        _p(
            F.col("n_hom_ref"), F.col("n_het"), F.col("n_hom_alt")
        ).alias("hwe_exact_p"),
    )


def hwe_oracle_sql(min_n: int = 1) -> str:
    """DuckDB oracle twin of hwe_test over the gcalls CTE (caller
    prepends oracle_prelude()): same dedup dose, genotype-class counts,
    and the identical expectation/chisq float tree (q factored in a CTE
    so both engines evaluate the same op sequence)."""
    return f"""{_DOSE_ST_CTE_SQL()}
        , g AS (
          SELECT variant_id,
                 CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hom_ref,
                 CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_het,
                 CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hom_alt
          FROM dnn GROUP BY variant_id
          HAVING COUNT(*) >= {int(min_n)}
        ), e AS (
          SELECT variant_id, n_hom_ref, n_het, n_hom_alt,
                 CAST(n_hom_ref + n_het + n_hom_alt AS DOUBLE) AS nn,
                 (2.0 * CAST(n_hom_alt AS DOUBLE) + CAST(n_het AS DOUBLE))
                   / (2.0 * CAST(n_hom_ref + n_het + n_hom_alt AS DOUBLE))
                   AS qq
          FROM g
        )
        SELECT variant_id, n_hom_ref, n_het, n_hom_alt,
               CASE WHEN qq > 0.0 AND qq < 1.0 THEN
                 (CAST(n_hom_ref AS DOUBLE) - nn * (1.0 - qq) * (1.0 - qq))
                   * (CAST(n_hom_ref AS DOUBLE) - nn * (1.0 - qq) * (1.0 - qq))
                   / (nn * (1.0 - qq) * (1.0 - qq))
                 + (CAST(n_het AS DOUBLE) - 2.0 * nn * (1.0 - qq) * qq)
                   * (CAST(n_het AS DOUBLE) - 2.0 * nn * (1.0 - qq) * qq)
                   / (2.0 * nn * (1.0 - qq) * qq)
                 + (CAST(n_hom_alt AS DOUBLE) - nn * qq * qq)
                   * (CAST(n_hom_alt AS DOUBLE) - nn * qq * qq)
                   / (nn * qq * qq)
               END AS hwe_chisq
        FROM e
    """


def fst_wc(
    calls: DataFrame,
    sample_pops: DataFrame,
    min_pops: int = 2,
    assume_unique: bool = False,
    unit_scale: int = 9,
) -> DataFrame:
    """Per-variant Weir & Cockerham (1984) Fst — the population-
    differentiation statistic SNPRelate ships as snpgdsFst(method=
    'W&C84') (reference ecosystem R/Fst.R; SeqArray delegates) and
    `vcftools --weir-fst-pop` reports. Given a (sample_id, population)
    frame, variance components per variant over the r populations with
    at least one called sample:

        a  = (nb/nc) * (s2 - (pq - s2*(r-1)/r - hb/4) / (nb-1))
        b  = (nb/(nb-1)) * (pq - s2*(r-1)/r - hb*(2nb-1)/(4nb))
        c  = hb/2,   Fst = a / (a+b+c)

    with nb the mean per-population sample size, nc the W&C size
    correction, pq = pbar*(1-pbar) under the weighted mean allele
    frequency pbar, s2 the size-weighted between-population variance of
    p_i, and hb the weighted mean observed heterozygosity. Diploid
    dosage 0/1/2 substrate, like the estimators above.

    Fully linear and SQL-oracle-able (gate seq_fst): one shared dose
    evaluation, a broadcast join of the (bounded) population map, ONE
    (variant, population) partial agg and ONE variant agg — no pair
    blowup, no wide self-join; at biobank scale the shuffle keys are
    (variant, population) then variant, both well-distributed. Every
    per-population sum entering the variant agg is an exact BIGINT —
    the one non-integer term, sum_i n_i*p_i^2 = sum_i alt_i^2/(4*n_i),
    is quantized half-up to the 1e-unit_scale grid first (the
    seq_inbreeding rule), so the variant totals are aggregation-order-
    free and the downstream float tree value-hashes against the oracle.

    Output: (variant_id, n_pops, n_total, wc_a, wc_abc, fst), fst NULL
    when the denominator is exactly 0 (variant monomorphic across all
    populations) or nb <= 1 (every population has one sample — the
    (nb-1) terms are undefined). Negative per-variant estimates are
    REAL W&C output at low differentiation (the estimator is unbiased,
    not non-negative) — do not clamp. Genome-wide Fst is the ratio of
    sums, not the mean: fst_wc_genome on this frame."""
    d = _dose_nn(calls, assume_unique)
    pops = sample_pops.select("sample_id", "population")
    dp = d.join(F.broadcast(pops), "sample_id")
    per_pop = dp.groupBy("variant_id", "population").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("d").alias("_alt"),
        F.sum((F.col("d") == 1).cast("bigint")).alias("_het"),
    )
    scale = float(10 ** int(unit_scale))
    np2_units = F.round(
        (F.col("_alt").cast("double") * F.col("_alt").cast("double"))
        / (F.lit(4.0) * F.col("_n").cast("double"))
        * F.lit(scale)
    ).cast("bigint")
    agg = (
        per_pop.groupBy("variant_id")
        .agg(
            F.count(F.lit(1)).alias("n_pops"),
            F.sum("_n").alias("n_total"),
            F.sum(F.col("_n") * F.col("_n")).alias("_sn2"),
            F.sum("_alt").alias("_salt"),
            F.sum("_het").alias("_shet"),
            F.sum(np2_units).alias("_snp2u"),
        )
        .where(F.col("n_pops") >= int(min_pops))
    )
    r = F.col("n_pops").cast("double")
    sn = F.col("n_total").cast("double")
    nb = sn / r
    nc = (sn - F.col("_sn2").cast("double") / sn) / (r - F.lit(1.0))
    pbar = F.col("_salt").cast("double") / (F.lit(2.0) * sn)
    hb = F.col("_shet").cast("double") / sn
    snp2 = F.col("_snp2u").cast("double") / F.lit(scale)
    s2 = (snp2 - sn * pbar * pbar) / ((r - F.lit(1.0)) * nb)
    pq = pbar * (F.lit(1.0) - pbar)
    a = (nb / nc) * (
        s2
        - (pq - s2 * (r - F.lit(1.0)) / r - hb / F.lit(4.0))
        / (nb - F.lit(1.0))
    )
    b = (nb / (nb - F.lit(1.0))) * (
        pq
        - s2 * (r - F.lit(1.0)) / r
        - hb * (F.lit(2.0) * nb - F.lit(1.0)) / (F.lit(4.0) * nb)
    )
    c = hb / F.lit(2.0)
    abc = a + b + c
    ok = nb > F.lit(1.0)
    return (
        agg.select(
            "variant_id",
            "n_pops",
            "n_total",
            F.when(ok, a).alias("wc_a"),
            F.when(ok, abc).alias("wc_abc"),
            F.when(ok & (abc != F.lit(0.0)), a / abc).alias("fst"),
        )
    )


def fst_wc_genome(
    per_variant: DataFrame, unit_scale: int = 9
) -> DataFrame:
    """Genome-wide W&C84 Fst from fst_wc's per-variant frame: the
    RATIO OF SUMS sum(a) / sum(a+b+c) over variants with defined
    components (Weir & Cockerham's multi-locus combination — NOT the
    mean of per-variant ratios, which is biased toward noisy low-
    information variants). Both sums are quantized to the
    1e-unit_scale grid before the BIGINT total so the result is
    aggregation-order-free. One 1-row reduce."""
    scale = float(10 ** int(unit_scale))
    au = F.round(F.col("wc_a") * F.lit(scale)).cast("bigint")
    du = F.round(F.col("wc_abc") * F.lit(scale)).cast("bigint")
    g = per_variant.where(F.col("wc_a").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.sum(au).alias("_sa"),
        F.sum(du).alias("_sd"),
    )
    return g.select(
        "n_variants",
        F.when(
            F.col("_sd") != 0,
            F.col("_sa").cast("double") / F.col("_sd").cast("double"),
        ).alias("fst_genome"),
    )


def _FST_CTE_SQL(min_pops: int = 2, unit_scale: int = 9) -> str:
    """The fst_wc oracle's CTE chain through the per-variant variance
    components (comp3: wa, wb, wc per variant), shared by the
    per-variant and genome-wide oracles so the component math cannot
    drift between them."""
    scale = float(10 ** int(unit_scale))
    return f"""{_DOSE_ST_CTE_SQL()}
        , fpops AS (
          -- the gate's two-group split: sample-suffix parity (the
          -- shared gsamples.population suppkey<50 rule yields ONE
          -- population at sf0.001's 10 samples — vacuous for Fst)
          SELECT sample_id,
                 CONCAT('P', CAST(COALESCE(
                     TRY_CAST(SUBSTRING(sample_id, 2) AS INT) % 2, 9)
                             AS STRING)) AS population
          FROM gsamples
        ), dpp AS (
          SELECT dnn.variant_id, gs.population, dnn.d
          FROM dnn JOIN fpops gs ON gs.sample_id = dnn.sample_id
        ), pp AS (
          SELECT variant_id, population,
                 CAST(COUNT(*) AS BIGINT) AS pn,
                 CAST(SUM(d) AS BIGINT) AS palt,
                 CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS phet
          FROM dpp GROUP BY variant_id, population
        ), va AS (
          SELECT variant_id,
                 CAST(COUNT(*) AS BIGINT) AS n_pops,
                 CAST(SUM(pn) AS BIGINT) AS n_total,
                 CAST(SUM(pn * pn) AS BIGINT) AS sn2,
                 CAST(SUM(palt) AS BIGINT) AS salt,
                 CAST(SUM(phet) AS BIGINT) AS shet,
                 CAST(SUM(CAST(round(CAST(palt AS DOUBLE)
                                     * CAST(palt AS DOUBLE)
                                     / (4.0 * CAST(pn AS DOUBLE))
                                     * {scale!r}) AS BIGINT)) AS BIGINT)
                   AS snp2u
          FROM pp GROUP BY variant_id
          HAVING COUNT(*) >= {int(min_pops)}
        ), comp AS (
          SELECT variant_id, n_pops, n_total,
                 CAST(n_pops AS DOUBLE) AS rr,
                 CAST(n_total AS DOUBLE) AS sn,
                 CAST(n_total AS DOUBLE) / CAST(n_pops AS DOUBLE) AS nb,
                 (CAST(n_total AS DOUBLE)
                  - CAST(sn2 AS DOUBLE) / CAST(n_total AS DOUBLE))
                   / (CAST(n_pops AS DOUBLE) - 1.0) AS nc,
                 CAST(salt AS DOUBLE) / (2.0 * CAST(n_total AS DOUBLE))
                   AS pbar,
                 CAST(shet AS DOUBLE) / CAST(n_total AS DOUBLE) AS hb,
                 CAST(snp2u AS DOUBLE) / {scale!r} AS snp2
          FROM va
        ), comp2 AS (
          SELECT *,
                 (snp2 - sn * pbar * pbar) / ((rr - 1.0) * nb) AS s2,
                 pbar * (1.0 - pbar) AS pq
          FROM comp
        ), comp3 AS (
          SELECT variant_id, n_pops, n_total, nb,
                 (nb / nc)
                   * (s2 - (pq - s2 * (rr - 1.0) / rr - hb / 4.0)
                      / (nb - 1.0)) AS wa,
                 (nb / (nb - 1.0))
                   * (pq - s2 * (rr - 1.0) / rr
                      - hb * (2.0 * nb - 1.0) / (4.0 * nb)) AS wb,
                 hb / 2.0 AS wc
          FROM comp2
        )"""


def fst_wc_oracle_sql(min_pops: int = 2, unit_scale: int = 9) -> str:
    """DuckDB oracle twin of fst_wc over the gcalls/gsamples CTEs
    (caller prepends oracle_prelude()): same dedup dose, same broadcast
    population map, same half-up unit grid for sum n_i*p_i^2, and the
    identical variance-component float tree (each factor spelled in
    the same order so both engines evaluate the same IEEE op
    sequence)."""
    return f"""{_FST_CTE_SQL(min_pops, unit_scale)}
        SELECT variant_id, n_pops, n_total,
               CASE WHEN nb > 1.0 THEN wa END AS wc_a,
               CASE WHEN nb > 1.0 THEN wa + wb + wc END AS wc_abc,
               CASE WHEN nb > 1.0 AND wa + wb + wc <> 0.0
                    THEN wa / (wa + wb + wc) END AS fst
        FROM comp3
    """


def fst_wc_genome_oracle_sql(
    min_pops: int = 2, unit_scale: int = 9, genome_unit_scale: int = 9
) -> str:
    """DuckDB oracle twin of fst_wc_genome over fst_wc's component
    chain: the same per-variant wc_a / wc_abc projection quantized to
    the 1e-genome_unit_scale grid, BIGINT-summed, ratio'd."""
    gscale = float(10 ** int(genome_unit_scale))
    return f"""{_FST_CTE_SQL(min_pops, unit_scale)}
        , pv AS (
          SELECT CASE WHEN nb > 1.0 THEN wa END AS wc_a,
                 CASE WHEN nb > 1.0 THEN wa + wb + wc END AS wc_abc
          FROM comp3
        ), g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_variants,
                 CAST(SUM(CAST(round(wc_a * {gscale!r}) AS BIGINT))
                      AS BIGINT) AS sa,
                 CAST(SUM(CAST(round(wc_abc * {gscale!r}) AS BIGINT))
                      AS BIGINT) AS sd
          FROM pv WHERE wc_a IS NOT NULL
        )
        SELECT n_variants,
               CASE WHEN sd <> 0
                    THEN CAST(sa AS DOUBLE) / CAST(sd AS DOUBLE) END
                 AS fst_genome
        FROM g
    """


def fst_wc_windows(
    calls: DataFrame,
    sample_pops: DataFrame,
    variants: DataFrame,
    win_size: int = 100_000,
    win_shift: int = 50_000,
    win_start: int = 0,
    min_pops: int = 2,
    unit_scale: int = 9,
    genome_unit_scale: int = 9,
    assume_unique: bool = False,
) -> DataFrame:
    """Sliding-window W&C84 Fst — the `vcftools --weir-fst-pop
    --fst-window-size/--fst-window-step` selection-scan output: per
    (chromosome, window), the ratio of sums of the per-variant
    variance components over the window's variants (the same
    multi-locus combination as fst_wc_genome, NOT the mean of
    per-variant ratios). Composes fst_wc's component relation with
    the seqUnitSlidingWindows grid (operators/windows.py), so the
    expensive part — the component build — runs ONCE; the window agg
    is a variant-keyed join + one (chromosome, window) partial agg.
    Components quantized to the 1e-genome_unit_scale grid before the
    BIGINT window sums (aggregation-order-free, gate
    seq_fst_windows).

    n_variants counts the window's variants with DEFINED components
    (nb > 1) — that INCLUDES monomorphic variants, whose components
    are defined zeros (counted in the window, contributing nothing to
    either sum — vcftools' treatment); windows containing no
    component-bearing variant are dropped, like vcftools.
    Output: (chromosome, unit_start, unit_end, n_variants, fst)."""
    from seqarray_spark.operators.windows import sliding_windows

    comp = fst_wc(
        calls, sample_pops, min_pops=min_pops,
        assume_unique=assume_unique, unit_scale=unit_scale,
    )
    membership = sliding_windows(
        variants, win_size=win_size, win_shift=win_shift,
        win_start=win_start, dup_rm=False,
    ).where(F.col("variant_id").isNotNull())
    gscale = float(10 ** int(genome_unit_scale))
    au = F.round(F.col("wc_a") * F.lit(gscale)).cast("bigint")
    du = F.round(F.col("wc_abc") * F.lit(gscale)).cast("bigint")
    agg = (
        membership.join(
            comp.where(F.col("wc_a").isNotNull()).select(
                "variant_id", au.alias("_au"), du.alias("_du")
            ),
            "variant_id",
        )
        .groupBy("chromosome", "unit_start", "unit_end")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sum("_au").alias("_sa"),
            F.sum("_du").alias("_sd"),
        )
    )
    return agg.select(
        "chromosome",
        "unit_start",
        "unit_end",
        "n_variants",
        F.when(
            F.col("_sd") != 0,
            F.col("_sa").cast("double") / F.col("_sd").cast("double"),
        ).alias("fst"),
    )


def fst_wc_windows_oracle_sql(
    win_size: int = 100_000,
    win_shift: int = 50_000,
    min_pops: int = 2,
    unit_scale: int = 9,
    genome_unit_scale: int = 9,
) -> str:
    """DuckDB oracle twin of fst_wc_windows over fst_wc's component
    chain + the sliding-window membership replay (the same
    generate_series window assignment the seq_sliding_windows oracle
    uses, win_start=0)."""
    gscale = float(10 ** int(genome_unit_scale))
    return f"""{_FST_CTE_SQL(min_pops, unit_scale)}
        , pvu AS (
          SELECT variant_id,
                 CAST(round(wa * {gscale!r}) AS BIGINT) AS au,
                 CAST(round((wa + wb + wc) * {gscale!r}) AS BIGINT) AS du
          FROM comp3 WHERE nb > 1.0
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
                 CAST(SUM(p.au) AS BIGINT) AS sa,
                 CAST(SUM(p.du) AS BIGINT) AS sd
          FROM membership m JOIN pvu p ON p.variant_id = m.variant_id
          GROUP BY m.chromosome, m.unit_start, m.unit_end
        )
        SELECT chromosome, unit_start, unit_end, n_variants,
               CASE WHEN sd <> 0
                    THEN CAST(sa AS DOUBLE) / CAST(sd AS DOUBLE) END AS fst
        FROM wagg
    """


_EM_CELLS = ["n22", "n21", "n12", "n20", "n02", "n11", "n10", "n01", "n00"]


def ld_pairs_em(
    variants: DataFrame,
    calls: DataFrame,
    bp_window: int = 50_000,
    min_n: int = 1,
    em_iters: int = 30,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Haplotype-frequency LD via the two-locus EM (Excoffier &
    Slatkin 1995) — SNPRelate snpgdsLDMat's method='r'/'dprime', the
    phase-resolving statistics PLINK's --ld reports. From each pair's
    3x3 genotype table, only the double-heterozygote cell is phase-
    ambiguous; EM splits it by the current haplotype-frequency
    estimate:

        x <- pAB*pab / (pAB*pab + pAb*paB)        (E step)
        pAB <- (cAB + x*n11) / (2n)  (and cyclically)   (M step)

    run for a FIXED em_iters steps from x=0.5 — fixed, not
    to-convergence, so the whole estimator is one deterministic IEEE
    float tree that the SQL oracle replays step for step (gate
    seq_ld_em; near-degenerate tables converge slowly — measured
    worst-case |pAB_30 - pAB_converged| ~ 9e-3 over 4000 random
    tables, typical cases are exact to 1e-12 — raise em_iters when
    chasing the tail, the oracle generator takes the same knob).
    Output per pair: haplotype frequency p_ab, the signed correlation
    ld_r = D/sqrt(pA qA pB qB), and the normalized d_prime = D/Dmax
    (Lewontin 1964), NULL where a locus is monomorphic (zero
    denominator / zero Dmax).

    The genotype-table build rides the same binned range self-join as
    ld_pairs; the EM itself is an Arrow-batched numpy kernel over the
    bounded per-pair table (9 BIGINT cells in, 3 doubles out) — one
    vectorized 30-step loop per batch, no per-row Python."""
    if int(min_n) < 1:
        raise ValueError("min_n must be >= 1")
    import pandas as pd

    s = _windowed_pair_sums(
        variants, calls, bp_window, "cells", sample_ids=sample_ids
    ).select("va", "vb", "_s.*")

    iters = int(em_iters)

    @F.pandas_udf("p_ab double, ld_r double, d_prime double")
    def _em(n, n22, n21, n12, n20, n02, n11, n10, n01, n00):
        import numpy as np

        out = _ld_em_kernel(
            *(
                c.to_numpy(dtype=np.int64)
                for c in (n, n22, n21, n12, n20, n02, n11, n10, n01, n00)
            ),
            iters=iters,
        )
        return pd.DataFrame(
            {"p_ab": out[0], "ld_r": out[1], "d_prime": out[2]}
        )

    res = s.where(F.col("n") >= int(min_n)).select(
        "va",
        "vb",
        F.col("n").alias("n_used"),
        _em("n", *_EM_CELLS).alias("_em"),
    )
    # the kernel marks undefined stats NaN (numpy has no NULL); the
    # relational contract — and the SQL oracle — use NULL
    def _nullify(c):
        return F.when(~F.isnan(F.col(c)), F.col(c)).alias(c.split(".")[-1])

    return res.select(
        "va",
        "vb",
        "n_used",
        F.col("_em.p_ab").alias("p_ab"),
        _nullify("_em.ld_r"),
        _nullify("_em.d_prime"),
    )


def _ld_em_kernel(n, n22, n21, n12, n20, n02, n11, n10, n01, n00, iters):
    """Vectorized fixed-step EM over integer genotype-table arrays.
    EVERY op below is written in the exact order the SQL oracle spells
    it (ld_em_oracle_sql), so the two engines produce bit-identical
    doubles — the value-hash contract."""
    import numpy as np

    nf = n.astype(np.float64)
    cab_ = (2 * n22 + n21 + n12).astype(np.float64)  # known AB copies
    cAb = (2 * n20 + n21 + n10).astype(np.float64)
    caB = (2 * n02 + n12 + n01).astype(np.float64)
    cxx = (2 * n00 + n10 + n01).astype(np.float64)  # known ab copies
    ndh = n11.astype(np.float64)
    two_n = 2.0 * nf
    x = np.full(n.shape, 0.5)
    for _ in range(int(iters)):
        p_ab_ = (cab_ + x * ndh) / two_n
        p_xx = (cxx + x * ndh) / two_n
        p_Ab = (cAb + (1.0 - x) * ndh) / two_n
        p_aB = (caB + (1.0 - x) * ndh) / two_n
        den = p_ab_ * p_xx + p_Ab * p_aB
        with np.errstate(invalid="ignore", divide="ignore"):
            x = np.where(den > 0.0, (p_ab_ * p_xx) / den, 0.5)
    p_ab = (cab_ + x * ndh) / two_n
    s_a = (2 * (n22 + n21 + n20) + (n12 + n11 + n10)).astype(np.float64)
    s_b = (2 * (n22 + n12 + n02) + (n21 + n11 + n01)).astype(np.float64)
    p_a = s_a / two_n
    p_b = s_b / two_n
    q_a = 1.0 - p_a
    q_b = 1.0 - p_b
    d = p_ab - p_a * p_b
    var4 = p_a * q_a * p_b * q_b
    with np.errstate(invalid="ignore", divide="ignore"):
        ld_r = np.where(var4 > 0.0, d / np.sqrt(var4), np.nan)
        dmax = np.where(
            d >= 0.0,
            np.minimum(p_a * q_b, q_a * p_b),
            np.minimum(p_a * p_b, q_a * q_b),
        )
        d_prime = np.where(dmax > 0.0, d / dmax, np.nan)
    return p_ab, ld_r, d_prime


def ld_em_oracle_sql(
    bp_window: int = 50_000, min_n: int = 1, em_iters: int = 30
) -> str:
    """DuckDB oracle twin of ld_pairs_em: the 3x3 genotype-table sums
    over the shared j CTE, then the SAME fixed em_iters EM steps
    unrolled as chained CTEs — each step's arithmetic spelled in the
    kernel's op order, so both engines walk one float tree."""
    cells = f"""
        , t AS (
          SELECT va, vb, COUNT(*) AS n_used,
            {", ".join(
              f"CAST(SUM(CASE WHEN dx = {x} AND dy = {y} THEN 1 ELSE 0 END)"
              f" AS BIGINT) AS n{x}{y}"
              for x, y in [(2,2),(2,1),(1,2),(2,0),(0,2),(1,1),(1,0),(0,1),(0,0)]
            )}
          FROM j GROUP BY va, vb
          HAVING COUNT(*) >= {int(min_n)}
        ), c0 AS (
          SELECT va, vb, n_used,
                 CAST(2 * n22 + n21 + n12 AS DOUBLE) AS h_ab,
                 CAST(2 * n20 + n21 + n10 AS DOUBLE) AS h_an,
                 CAST(2 * n02 + n12 + n01 AS DOUBLE) AS h_nb,
                 CAST(2 * n00 + n10 + n01 AS DOUBLE) AS h_nn,
                 CAST(n11 AS DOUBLE) AS ndh,
                 2.0 * CAST(n_used AS DOUBLE) AS two_n,
                 CAST(2 * (n22 + n21 + n20) + (n12 + n11 + n10) AS DOUBLE)
                   AS s_a,
                 CAST(2 * (n22 + n12 + n02) + (n21 + n11 + n01) AS DOUBLE)
                   AS s_b,
                 0.5 AS x
          FROM t
        )"""
    steps = []
    for i in range(int(em_iters)):
        steps.append(f"""
        , c{i + 1} AS (
          SELECT va, vb, n_used, h_ab, h_an, h_nb, h_nn, ndh, two_n, s_a, s_b,
                 CASE WHEN ((h_ab + x * ndh) / two_n) * ((h_nn + x * ndh) / two_n)
                           + ((h_an + (1.0 - x) * ndh) / two_n)
                             * ((h_nb + (1.0 - x) * ndh) / two_n) > 0.0
                      THEN (((h_ab + x * ndh) / two_n) * ((h_nn + x * ndh) / two_n))
                           / (((h_ab + x * ndh) / two_n) * ((h_nn + x * ndh) / two_n)
                              + ((h_an + (1.0 - x) * ndh) / two_n)
                                * ((h_nb + (1.0 - x) * ndh) / two_n))
                      ELSE 0.5 END AS x
          FROM c{i}
        )""")
    last = f"c{int(em_iters)}"
    return f"""{_ld_ctes(bp_window)}{cells}{"".join(steps)}
        , fin AS (
          SELECT va, vb, n_used,
                 (h_ab + x * ndh) / two_n AS p_ab,
                 s_a / two_n AS p_a, s_b / two_n AS p_b
          FROM {last}
        ), fin2 AS (
          SELECT va, vb, n_used, p_ab,
                 p_ab - p_a * p_b AS d,
                 p_a, p_b, 1.0 - p_a AS q_a, 1.0 - p_b AS q_b
          FROM fin
        )
        SELECT va, vb, n_used, p_ab,
               CASE WHEN p_a * q_a * p_b * q_b > 0.0
                    THEN d / sqrt(p_a * q_a * p_b * q_b) END AS ld_r,
               CASE WHEN (CASE WHEN d >= 0.0
                               THEN LEAST(p_a * q_b, q_a * p_b)
                               ELSE LEAST(p_a * p_b, q_a * q_b) END) > 0.0
                    THEN d / (CASE WHEN d >= 0.0
                                   THEN LEAST(p_a * q_b, q_a * p_b)
                                   ELSE LEAST(p_a * p_b, q_a * q_b) END)
               END AS d_prime
        FROM fin2
    """


def pca_snp_corr(
    calls: DataFrame,
    weights: DataFrame,
    unit_scale: int = 6,
    assume_unique: bool = False,
    k: int | None = None,
) -> DataFrame:
    """Per-variant correlation between dosage and each sample
    eigenvector — SNPRelate's snpgdsPCACorr, the screen for which SNPs
    DRIVE a PC (LD-region artifacts show as corr~1 blocks; ancestry
    PCs correlate broadly). For component c with per-sample weights w:

        corr_vc = (n*Sxw - Sx*Sw) / sqrt((n*Sxx - Sx^2)(n*Sww - Sw^2))

    over the samples with a known dosage at v. Weights are quantized
    once onto the 1e-unit_scale integer grid at the join (the
    pca_snp_loadings rule) so EVERY sum is an exact BIGINT and the
    statistic is aggregation-order-free / oracle-checkable (gate
    seq_pca_corr; raw double sums would hash-diverge). Plan: one dedup
    dose evaluation, one broadcast weights join, ONE variant-keyed
    partial agg — linear, no pair blowup; NULL where the variant is
    monomorphic over its called samples (zero dosage variance) or the
    weight column is constant there.

    Output: (variant_id, n_used, corr array<double> of k values).
    `k=` (or a producer `_k` metadata stamp on `w`) skips the
    width-probe driver job."""
    k = _array_width(weights, "w", k, "weights")
    d = _dose_nn(calls, assume_unique)
    scale = float(10 ** int(unit_scale))
    wq = weights.select(
        "sample_id",
        *[
            F.round(F.element_at("w", c + 1) * F.lit(scale))
            .cast("bigint")
            .alias(f"_w{c}")
            for c in range(k)
        ],
    )
    dd = d.join(F.broadcast(wq), "sample_id")
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum("d").alias("_sx"),
        F.sum(F.col("d") * F.col("d")).alias("_sxx"),
    ]
    for c in range(k):
        aggs += [
            F.sum(F.col(f"_w{c}")).alias(f"_sw{c}"),
            # sum the squared-weight term in DECIMAL(38,0), not
            # BIGINT: per-row w*w ~ 1e12 at unit_scale=6, so a BIGINT
            # running sum wraps silently (non-ANSI) at n >= ~9.2e6
            # samples — inside biobank range (ADVICE r12). The per-row
            # long multiply itself is safe (<= 1e12 << 2^63).
            F.sum(
                (F.col(f"_w{c}") * F.col(f"_w{c}")).cast("decimal(38,0)")
            ).alias(f"_sww{c}"),
            F.sum(F.col("d") * F.col(f"_w{c}")).alias(f"_sxw{c}"),
        ]
    agg = dd.groupBy("variant_id").agg(*aggs)
    n = F.col("_n")

    # variance/covariance terms in DECIMAL(38,0): with unit-magnitude
    # weights on the 1e-unit_scale grid, sww ~ n*1e12 and n*sww - sw^2
    # ~ n^2*1e12 BLOWS PAST int64 at n >= ~3037 samples — Spark's
    # non-ANSI long multiply would wrap silently while DuckDB raises
    # (r12 review). With _sww summed in DECIMAL above, the remaining
    # BIGINT sums stay exact to n ~ 4.6e12 (sxw: per-row <= 2e6) and
    # n ~ 9.2e12 (sw: per-row <= 1e6), and these cross-products are
    # exact in DECIMAL(38,0) to n ~ 1e13; both engines evaluate them
    # exactly and the final cast to double is correctly rounded, so
    # the value-hash contract survives (bounds corrected, ADVICE r12).
    def _dec(col):
        return col.cast("decimal(38,0)")

    dx = (
        _dec(n) * _dec(F.col("_sxx")) - _dec(F.col("_sx")) * _dec(F.col("_sx"))
    ).cast("double")
    comps = []
    for c in range(k):
        num = (
            _dec(n) * _dec(F.col(f"_sxw{c}"))
            - _dec(F.col("_sx")) * _dec(F.col(f"_sw{c}"))
        ).cast("double")
        dw = (
            _dec(n) * _dec(F.col(f"_sww{c}"))
            - _dec(F.col(f"_sw{c}")) * _dec(F.col(f"_sw{c}"))
        ).cast("double")
        comps.append(
            F.when((dx > 0.0) & (dw > 0.0), num / F.sqrt(dx * dw))
        )
    return (
        agg.select(
            "variant_id",
            n.alias("n_used"),
            F.array(*comps).alias("corr"),
        )
    )


def pca_corr_oracle_sql(n_cols: int = 4, unit_scale: int = 6) -> str:
    """DuckDB oracle twin of pca_snp_corr under the deterministic
    md5-Rademacher weights (the same omega rule as the loadings gate);
    caller prepends oracle_prelude(). Output (variant_id, n_used,
    corr_0..) scalars — the gate flattens the array the same way.

    Rademacher weights are +/-1 so the 1e-unit_scale grid is exact:
    w_units = round(omega * scale) = omega * scale."""
    evens = ", ".join(f"'{e}'" for e in _OMEGA_EVENS)
    scale = float(10 ** int(unit_scale))

    def om(c: int) -> str:
        return (
            f"(CASE WHEN substr(md5(dnn.sample_id || ':{c}'), 1, 1) "
            f"IN ({evens}) THEN 1 ELSE -1 END)"
        )

    wsums = []
    for c in range(int(n_cols)):
        w = (
            f"CAST(round({om(c)} * {scale!r}) AS BIGINT)"
        )
        wsums.append(
            f"CAST(SUM({w}) AS BIGINT) AS sw{c}, "
            f"CAST(SUM({w} * {w}) AS BIGINT) AS sww{c}, "
            f"CAST(SUM(dnn.d * {w}) AS BIGINT) AS sxw{c}"
        )
    corr_cols = []
    D = "DECIMAL(38,0)"
    for c in range(int(n_cols)):
        num = (f"CAST(CAST(n_u AS {D}) * CAST(sxw{c} AS {D})"
               f" - CAST(sx AS {D}) * CAST(sw{c} AS {D}) AS DOUBLE)")
        dx = (f"CAST(CAST(n_u AS {D}) * CAST(sxx AS {D})"
              f" - CAST(sx AS {D}) * CAST(sx AS {D}) AS DOUBLE)")
        dw = (f"CAST(CAST(n_u AS {D}) * CAST(sww{c} AS {D})"
              f" - CAST(sw{c} AS {D}) * CAST(sw{c} AS {D}) AS DOUBLE)")
        corr_cols.append(
            f"CASE WHEN {dx} > 0.0 AND {dw} > 0.0 "
            f"THEN {num} / sqrt({dx} * {dw}) END AS corr_{c}"
        )
    return f"""{_DOSE_ST_CTE_SQL()}
        , su AS (
          SELECT variant_id,
                 CAST(COUNT(*) AS BIGINT) AS n_u,
                 CAST(SUM(d) AS BIGINT) AS sx,
                 CAST(SUM(d * d) AS BIGINT) AS sxx,
                 {", ".join(wsums)}
          FROM dnn GROUP BY variant_id
        )
        SELECT variant_id, n_u AS n_used, {", ".join(corr_cols)}
        FROM su
    """


def inbreeding_coeff_weir(
    calls: DataFrame,
    min_m: int = 1,
    assume_unique: bool = False,
    unit_scale: int = 9,
) -> DataFrame:
    """Per-sample Weir-moment inbreeding coefficient — SNPRelate's
    snpgdsIndInb(method='mom.weir') companion to the Visscher form
    (inbreeding_coeff), the GCTA F-hat-III estimator (Yang et al. 2011,
    AJHG 88:76 eq. for F_hat_3):

        F_s = (1/m) * sum_v [x^2 - (1 + 2p)x + 2p^2] / (2p(1-p))

    with x the dosage and p the variant's alt frequency over ITS
    called samples. Unlike the Visscher ratio-of-sums, this is a MEAN
    of per-variant standardized terms, so rare variants carry more
    weight (the two estimators' documented divergence; both are
    unbiased under their own models). Same linear plan as
    inbreeding_coeff: one shared dose evaluation, one per-variant
    stats agg broadcast back, one sample-keyed agg. The per-(variant,
    sample) term is quantized half-up to the 1e-unit_scale grid
    before the BIGINT sum — order-free, oracle-checkable (gate
    seq_inbreeding_weir). Monomorphic variants excluded (undefined
    term). Output: (sample_id, m_used, inbreeding_weir)."""
    d, release = _dose_once(calls, assume_unique)
    st = _stats_from_dose(d)  # polymorphic only
    twop = F.col("dose_sum").cast("double") / F.col("n_obs").cast("double")
    p = twop / F.lit(2.0)
    scale = float(10 ** int(unit_scale))
    dd = d.join(
        F.broadcast(
            st.select(
                "variant_id",
                p.alias("_p"),
            )
        ),
        "variant_id",
    )
    x = F.col("d").cast("double")
    pp = F.col("_p")
    term = (
        x * x
        - (F.lit(1.0) + F.lit(2.0) * pp) * x
        + F.lit(2.0) * pp * pp
    ) / (F.lit(2.0) * pp * (F.lit(1.0) - pp))
    units = F.round(term * F.lit(scale)).cast("bigint")
    agg = (
        dd.groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).alias("m_used"),
            F.sum(units).alias("_su"),
        )
        .where(F.col("m_used") >= int(min_m))
    )
    return release(
        agg.select(
            "sample_id",
            "m_used",
            (
                (F.col("_su").cast("double") / F.lit(scale))
                / F.col("m_used").cast("double")
            ).alias("inbreeding_weir"),
        )
    )


def inbreeding_weir_oracle_sql(min_m: int = 1, unit_scale: int = 9) -> str:
    """DuckDB oracle twin of inbreeding_coeff_weir over the dose/st
    CTEs (caller prepends oracle_prelude()): same polymorphic stats,
    same per-cell standardized term on the half-up unit grid, same
    final mean."""
    scale = float(10 ** int(unit_scale))
    return f"""{_DOSE_ST_CTE_SQL()}
        , wp AS (
          SELECT variant_id,
                 (CAST(s_sum AS DOUBLE) / CAST(n_obs AS DOUBLE)) / 2.0 AS p
          FROM st
        ), u AS (
          SELECT dnn.sample_id,
                 CAST(round(((CAST(dnn.d AS DOUBLE) * CAST(dnn.d AS DOUBLE)
                              - (1.0 + 2.0 * w.p) * CAST(dnn.d AS DOUBLE)
                              + 2.0 * w.p * w.p)
                             / (2.0 * w.p * (1.0 - w.p)))
                            * {scale!r}) AS BIGINT) AS tu
          FROM dnn JOIN wp w ON w.variant_id = dnn.variant_id
        ), s2 AS (
          SELECT sample_id, COUNT(*) AS m_used,
                 CAST(SUM(tu) AS BIGINT) AS su
          FROM u GROUP BY sample_id
        )
        SELECT sample_id, m_used,
               (CAST(su AS DOUBLE) / {scale!r})
                 / CAST(m_used AS DOUBLE) AS inbreeding_weir
        FROM s2 WHERE m_used >= {int(min_m)}
    """


def unrelated_samples(
    kinship: DataFrame,
    tau: float = 0.0884,
    samples: DataFrame | None = None,
) -> DataFrame:
    """Greedy maximal unrelated sample set — the KING `--unrelated` /
    PLINK2 `--king-cutoff` workflow step that every mixed-model /
    PCA pipeline runs between relatedness estimation and analysis:
    walking samples in lexicographic id order, keep a sample unless
    its kinship with an ALREADY-KEPT sample exceeds ``tau`` (default
    0.0884 = 2^(-7/2), the standard 3rd-degree cutoff). Same kept-set
    semantics as ld_prune(method='greedy'), applied to the sample
    graph: a sample survives when its relative was itself dropped.

    ``kinship``: (sample_i, sample_j, ..., kinship) with sample_i <
    sample_j — king_from_packed / ibd_mom_from_packed output. NULL
    kinship (zero het denominator) never blocks. ``samples``: optional
    (sample_id) universe so samples with no surviving pair are kept;
    derived from the pair endpoints when omitted.

    The pair relation is distributed; the walk itself is ONE cogrouped
    pandas task holding only sample ids + the >tau skeleton (the
    ld_prune walk bound, measured in tools/prune_walk_stress.py —
    sample counts are orders of magnitude below the 10M-variant
    measurement). Output: (sample_id) kept rows."""
    strong = kinship.where(F.col("kinship") > float(tau)).select(
        "sample_i", "sample_j"
    )
    if samples is None:
        samples = kinship.select(
            F.explode(F.array("sample_i", "sample_j")).alias("sample_id")
        ).distinct()
    univ = samples.select("sample_id").distinct()

    import pandas as pd

    def _walk(spdf: "pd.DataFrame", ppdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = np.sort(spdf["sample_id"].to_numpy())
        n = len(ids)
        if n == 0:
            return spdf[["sample_id"]]
        if len(ppdf) == 0:
            return pd.DataFrame({"sample_id": ids})

        def pos(v):
            j = np.searchsorted(ids, v)
            j_safe = np.minimum(j, n - 1)
            return np.where(ids[j_safe] == v, j_safe, -1)

        # lexicographic walk order == sorted ids, and sample_i <
        # sample_j, so i is always the earlier (predecessor) side;
        # the walk itself is the shared array-backed kernel
        # (_greedy_kept_walk — unified with ld_prune's, r13)
        pa = pos(ppdf["sample_i"].to_numpy())
        pb = pos(ppdf["sample_j"].to_numpy())
        good = (pa >= 0) & (pb >= 0)
        kept = _greedy_kept_walk(n, pa[good], pb[good])
        return pd.DataFrame({"sample_id": ids[kept]})

    return (
        univ.groupBy(F.lit(0).alias("_g"))
        .cogroup(
            strong.select(
                F.lit(0).alias("_g"), "sample_i", "sample_j"
            ).groupBy("_g")
        )
        .applyInPandas(
            lambda s, p: _walk(s, p), schema="sample_id string"
        )
    )


def unrelated_oracle_sql(tau: float = 0.0884, min_n: int = 1) -> str:
    """DuckDB oracle twin of king_from_packed -> unrelated_samples:
    the KING pair chain (king_packed_oracle_sql's CTEs) feeding the
    sequential kept-set walk replayed as a RECURSIVE CTE over the
    gsamples universe — the ld_prune_greedy oracle pattern on the
    sample graph (caller prepends oracle_prelude() with its WITH
    upgraded to WITH RECURSIVE)."""
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_PACKED_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), kp AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 COUNT(*) AS m_used,
                 CAST(SUM(CASE WHEN a.d = 1 AND b.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hh,
                 CAST(SUM(CASE WHEN ABS(a.d - b.d) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS opp,
                 CAST(SUM(CASE WHEN a.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS het_i,
                 CAST(SUM(CASE WHEN b.d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS het_j
          FROM dnn a JOIN dnn b ON a.variant_id = b.variant_id
                              AND a.sample_id < b.sample_id
          GROUP BY a.sample_id, b.sample_id
        ), strongk AS (
          SELECT sample_i, sample_j FROM kp
          WHERE m_used >= {int(min_n)} AND het_i + het_j > 0
            AND (CAST(hh AS DOUBLE) - 2.0 * CAST(opp AS DOUBLE))
                / CAST(het_i + het_j AS DOUBLE) > {float(tau)!r}
        ), ordsmp AS (
          SELECT sample_id,
                 ROW_NUMBER() OVER (ORDER BY sample_id) AS rn
          FROM (SELECT DISTINCT sample_id FROM gsamples) u
        ), kwalk AS (
          SELECT rn, [sample_id] AS kept FROM ordsmp WHERE rn = 1
          UNION ALL
          SELECT v.rn,
                 CASE WHEN EXISTS (
                        SELECT 1 FROM strongk st
                        WHERE st.sample_j = v.sample_id
                          AND list_contains(w.kept, st.sample_i))
                      THEN w.kept
                      ELSE list_append(w.kept, v.sample_id) END
          FROM kwalk w JOIN ordsmp v ON v.rn = w.rn + 1
        )
        SELECT UNNEST(kept) AS sample_id FROM kwalk
        WHERE rn = (SELECT MAX(rn) FROM kwalk)
    """


def ibd_mle_from_packed(
    packed: DataFrame,
    sample_ids: list[str],
    n_bins: int = 128,
    em_iters: int = 30,
    min_m: int = 1,
) -> DataFrame:
    """Maximum-likelihood IBD for every sample pair over the 2-bit
    packed column — snpgdsIBDMLE, the EM estimator (Milligan 2003;
    Thompson 1975) SNPRelate runs beside the MoM/KING screens through
    the reference's delegation surface (src/LinkSNPRelate.cpp:69-407).
    Each co-called variant contributes P(g_i, g_j | IBD=m, p) for
    m in {0,1,2}; EM re-weights variants by the posterior of their
    IBD state under the current k=(k0,k1,k2) and re-estimates k as the
    posterior mean, for a FIXED em_iters steps from k=(1/3,1/3,1/3) —
    fixed, not to-convergence, so the whole estimator is one
    deterministic float tree the SQL oracle replays step for step
    (the ld_pairs_em precedent).

    Two quantizations buy both the sufficient-statistic form and the
    oracle, each documented divergence from SNPRelate's per-variant
    float loop:

    * allele frequency on a DYADIC grid: p_bin = floor(p*B + 0.5)/B
      with B a power of two (exact in float64), monomorphic-rounded
      bins (0, B) dropped as uninformative. Per pair the data then
      collapse to counts over (genotype-pair class, p-bin) cells —
      6 unordered classes x (B-1) bins — built as one-hot MATMULS per
      bin on the ibs/king substrate: zero wide shuffle, and the EM
      never rescans genotypes. Grid error on k is O(1/B).
    * EM posteriors on a half-up 1e-9 integer grid each step, so every
      per-pair reduction is an exact-integer sum — order-independent,
      hash-stable — and k stays a pure function of the cell table.

    Scale posture: the cell table is |pairs| x occupied cells
    (<= min(M, 6(B-1))) rows and the kernel holds 6 x B x n^2 float64
    accumulators per task (~48*B*n^2 bytes) — all-pairs MLE is for
    COHORT-sized n (the gate restricts to a 40-sample panel); at
    biobank n, screen pairs with KING/MoM first and run MLE on the
    candidates, the standard toolchain division of labor, or coarsen
    n_bins. Output: (sample_i, sample_j, m_used, k0, k1, kinship)
    with kinship = (1-k0-k1)/2 + k1/4, raw unconstrained estimates
    like ibd_mom (EM keeps k in the simplex up to 1e-9 rounding)."""
    import numpy as np
    import pyarrow as pa

    from seqarray_spark.sources.packed import _code_lut

    n_samp = len(sample_ids)
    if n_samp < 2:
        raise ValueError("IBD MLE needs >= 2 samples")
    B = int(n_bins)
    if B < 2 or (B & (B - 1)) != 0:
        raise ValueError(
            "n_bins must be a power of two: p-grid points b/B must be "
            "exact float64 dyadics or the oracle hash diverges"
        )
    iters = int(em_iters)
    if iters < 1:
        raise ValueError("em_iters must be >= 1")
    iu, ju = np.triu_indices(n_samp, k=1)
    bf = float(B)

    def cells_kernel(batches):
        codes_lut = _code_lut()
        acc: dict = {}
        for rb in batches:
            codes = _packed_batch_codes(rb, n_samp, codes_lut)
            if codes is None:
                continue
            i0 = (codes == 0).astype(np.float64)
            i1 = (codes == 1).astype(np.float64)
            i2 = (codes == 2).astype(np.float64)
            cnt = (i0 + i1 + i2).sum(axis=1)
            s = (i1 + 2.0 * i2).sum(axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                p = np.where(cnt > 0, s / (2.0 * cnt), 0.0)
            binv = np.floor(p * bf + 0.5)
            ok = (cnt > 0) & (binv > 0.0) & (binv < bf)
            for b in np.unique(binv[ok]):
                rows = ok & (binv == b)
                a0, a1, a2 = i0[rows], i1[rows], i2[rows]
                mats = acc.setdefault(
                    int(b),
                    [np.zeros((n_samp, n_samp)) for _ in range(6)],
                )
                m01 = a0.T @ a1
                m02 = a0.T @ a2
                m12 = a1.T @ a2
                mats[0] += a0.T @ a0
                mats[1] += m01 + m01.T
                mats[2] += m02 + m02.T
                mats[3] += a1.T @ a1
                mats[4] += m12 + m12.T
                mats[5] += a2.T @ a2
        # WIDE rows — one per (pair, bin) carrying all 6 class counts:
        # 6x fewer shuffle rows than the long (pair, cls, bin) form
        # (measured OOM-ing Arrow direct memory at 200 samples x 100k
        # variants x 32 tasks in long form); the EM walks the same
        # integer sums either way, so the oracle (which builds its
        # cell table relationally) is unaffected
        cols = {k: [] for k in ("si", "sj", "pbin")}
        ncols = [[] for _ in range(6)]
        for b, mats in acc.items():
            stack = np.stack([m[iu, ju] for m in mats])
            nz = stack.sum(axis=0) > 0
            if nz.any():
                cols["si"].append(iu[nz].astype(np.int32))
                cols["sj"].append(ju[nz].astype(np.int32))
                cols["pbin"].append(
                    np.full(int(nz.sum()), b, np.int32)
                )
                for c in range(6):
                    ncols[c].append(stack[c][nz])
        if cols["si"]:
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(cols[k])) for k in cols]
                + [pa.array(np.concatenate(nc)) for nc in ncols],
                names=["_si", "_sj", "pbin"]
                + [f"n{c}" for c in range(6)],
            )

    partials = packed.select("variant_id", "n_samples", "packed").mapInArrow(
        cells_kernel,
        schema=(
            "_si int, _sj int, pbin int, "
            + ", ".join(f"n{c} double" for c in range(6))
        ),
    )
    cells = _spread_pairs(partials, "_si", "_sj", "pbin").groupBy("_si", "_sj", "pbin").agg(
        *[F.sum(f"n{c}").cast("bigint").alias(f"n{c}") for c in range(6)]
    )

    def em_kernel(batches):
        tbl = pa.Table.from_batches(
            list(batches),
            schema=pa.schema(
                [("_si", pa.int32()), ("_sj", pa.int32()),
                 ("pbin", pa.int32())]
                + [(f"n{c}", pa.int64()) for c in range(6)]
            ),
        )
        if tbl.num_rows == 0:
            return
        si = tbl["_si"].to_numpy()
        sj = tbl["_sj"].to_numpy()
        pbin = tbl["pbin"].to_numpy()
        ns = [
            tbl[f"n{c}"].to_numpy().astype(np.float64) for c in range(6)
        ]
        pairkey = si.astype(np.int64) * n_samp + sj
        uniq, pidx = np.unique(pairkey, return_inverse=True)
        npairs = len(uniq)
        ntot = ns[0] + ns[1] + ns[2] + ns[3] + ns[4] + ns[5]
        m_used = np.bincount(pidx, weights=ntot, minlength=npairs)
        # class-conditional pair-genotype probabilities: constants per
        # (row, class), hoisted out of the EM loop; EVERY float op
        # below is in the exact order ibd_mle_oracle_sql spells it
        # (the bit-identical-doubles contract, _ld_em_kernel
        # precedent). The engine's wide rows carry 6 class counts;
        # the oracle's long cells sum the same integer terms, so the
        # per-pair BIGINT sums agree exactly.
        p = pbin.astype(np.float64) / bf
        q = 1.0 - p
        z = np.zeros_like(p)
        e0s = [q * q * q * q, 2.0 * p * q * q * q, p * p * q * q,
               4.0 * p * p * q * q, 2.0 * p * p * p * q, p * p * p * p]
        e1s = [q * q * q, p * q * q, z, p * q, p * p * q, p * p * p]
        e2s = [q * q, z, z, 2.0 * p * q, z, p * p]
        grid = 1000000000.0
        den2 = grid * m_used
        k0 = np.full(npairs, 1.0 / 3.0)
        k1 = np.full(npairs, 1.0 / 3.0)
        k2 = np.full(npairs, 1.0 / 3.0)
        for _ in range(iters):
            k0r = k0[pidx]
            k1r = k1[pidx]
            k2r = k2[pidx]
            s0 = np.zeros(npairs)
            s1 = np.zeros(npairs)
            s2 = np.zeros(npairs)
            fb0 = np.floor(k0r * grid + 0.5)
            fb1 = np.floor(k1r * grid + 0.5)
            fb2 = np.floor(k2r * grid + 0.5)
            for c in range(6):
                a0 = k0r * e0s[c]
                a1 = k1r * e1s[c]
                a2 = k2r * e2s[c]
                den = a0 + a1 + a2
                with np.errstate(invalid="ignore", divide="ignore"):
                    u0 = np.where(
                        den > 0.0, np.floor(a0 / den * grid + 0.5), fb0
                    )
                    u1 = np.where(
                        den > 0.0, np.floor(a1 / den * grid + 0.5), fb1
                    )
                    u2 = np.where(
                        den > 0.0, np.floor(a2 / den * grid + 0.5), fb2
                    )
                s0 += np.bincount(
                    pidx, weights=ns[c] * u0, minlength=npairs
                )
                s1 += np.bincount(
                    pidx, weights=ns[c] * u1, minlength=npairs
                )
                s2 += np.bincount(
                    pidx, weights=ns[c] * u2, minlength=npairs
                )
            k0 = s0 / den2
            k1 = s1 / den2
            k2 = s2 / den2
        kin = (1.0 - k0 - k1) / 2.0 + k1 / 4.0
        yield pa.RecordBatch.from_arrays(
            [
                pa.array((uniq // n_samp).astype(np.int32)),
                pa.array((uniq % n_samp).astype(np.int32)),
                pa.array(m_used.astype(np.int64)),
                pa.array(k0),
                pa.array(k1),
                pa.array(kin),
            ],
            names=["_si", "_sj", "m_used", "k0", "k1", "kinship"],
        )

    # one hash shuffle co-locates each pair's cells; the EM task sees
    # its whole partition (pairs are independent — linear over pairs)
    res = cells.repartition("_si", "_sj").mapInArrow(
        em_kernel,
        schema=(
            "_si int, _sj int, m_used long, k0 double, k1 double, "
            "kinship double"
        ),
    )
    labels = F.array(*[F.lit(s) for s in sample_ids])
    return res.where(F.col("m_used") >= int(min_m)).select(
        F.element_at(labels, F.col("_si") + 1).alias("sample_i"),
        F.element_at(labels, F.col("_sj") + 1).alias("sample_j"),
        "m_used",
        "k0",
        "k1",
        "kinship",
    )


def ibd_mle_oracle_sql(
    n_bins: int = 128,
    em_iters: int = 30,
    min_m: int = 1,
    limit_samples: int | None = None,
) -> str:
    """DuckDB oracle twin of pack_2bit_genotypes -> ibd_mle_from_packed
    over the gvariants/gcalls CTEs: packed-dose dedup, per-variant
    allele frequency binned to the dyadic b/B grid, pooled (class,
    p-bin) cell counts per co-called pair, then em_iters EM steps
    unrolled as chained join+group CTEs — posteriors floored to the
    identical 1e-9 unit grid, so each step's per-pair sums are exact
    BIGINTs and the k's walk one float tree in both engines.
    `limit_samples` mirrors the gate's first-K-sorted sample panel."""
    B = int(n_bins)
    bf = float(B)
    lim = (
        f"""AND a.sample_id IN (SELECT sample_id FROM ordlim)
                    AND b.sample_id IN (SELECT sample_id FROM ordlim)"""
        if limit_samples
        else ""
    )
    ordlim = (
        f"""
        , ordlim AS (
          SELECT sample_id
          FROM (SELECT DISTINCT sample_id FROM gcalls) u
          ORDER BY sample_id LIMIT {int(limit_samples)}
        )"""
        if limit_samples
        else ""
    )
    # p over the SAME restricted panel the engine packs
    plim = (
        "WHERE sample_id IN (SELECT sample_id FROM ordlim)"
        if limit_samples
        else ""
    )
    head = f"""
        , dosem AS (
          SELECT variant_id, sample_id, {_DOSE_PACKED_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnnm AS (
          SELECT variant_id, sample_id, d FROM dosem WHERE d IS NOT NULL
        ){ordlim}, dpan AS (
          SELECT variant_id, sample_id, d FROM dnnm {plim}
        ), stpm AS (
          SELECT variant_id,
                 CAST(SUM(d) AS DOUBLE)
                   / (2.0 * CAST(COUNT(*) AS DOUBLE)) AS p
          FROM dpan GROUP BY variant_id
        ), pbins AS (
          SELECT variant_id, CAST(FLOOR(p * {bf!r} + 0.5) AS BIGINT) AS pbin
          FROM stpm
          WHERE FLOOR(p * {bf!r} + 0.5) > 0.0
            AND FLOOR(p * {bf!r} + 0.5) < {bf!r}
        ), mcell AS (
          SELECT a.sample_id AS si, b.sample_id AS sj,
                 CASE
                   WHEN LEAST(a.d, b.d) = 0 AND GREATEST(a.d, b.d) = 0
                     THEN 0
                   WHEN LEAST(a.d, b.d) = 0 AND GREATEST(a.d, b.d) = 1
                     THEN 1
                   WHEN LEAST(a.d, b.d) = 0 AND GREATEST(a.d, b.d) = 2
                     THEN 2
                   WHEN LEAST(a.d, b.d) = 1 AND GREATEST(a.d, b.d) = 1
                     THEN 3
                   WHEN LEAST(a.d, b.d) = 1 AND GREATEST(a.d, b.d) = 2
                     THEN 4
                   ELSE 5 END AS cls,
                 w.pbin,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM dpan a
          JOIN dpan b ON a.variant_id = b.variant_id
                     AND a.sample_id < b.sample_id {lim}
          JOIN pbins w ON w.variant_id = a.variant_id
          GROUP BY a.sample_id, b.sample_id, cls, w.pbin
        ), cellsp AS MATERIALIZED (
          -- class-conditional probabilities as cell constants; p, q
          -- and every product in the kernel's op order
          -- (MATERIALIZED: referenced by every unrolled EM step —
          -- DuckDB's default inlining re-plans it per step and the
          -- optimizer goes super-linear past ~12 steps: measured
          -- 0.6s@10 -> 108s@18 iters inlined vs 0.4s@30 materialized)
          SELECT si, sj, n,
                 CASE cls
                   WHEN 0 THEN q * q * q * q
                   WHEN 1 THEN 2.0 * p * q * q * q
                   WHEN 2 THEN p * p * q * q
                   WHEN 3 THEN 4.0 * p * p * q * q
                   WHEN 4 THEN 2.0 * p * p * p * q
                   ELSE p * p * p * p END AS e0,
                 CASE cls
                   WHEN 0 THEN q * q * q
                   WHEN 1 THEN p * q * q
                   WHEN 2 THEN 0.0
                   WHEN 3 THEN p * q
                   WHEN 4 THEN p * p * q
                   ELSE p * p * p END AS e1,
                 CASE cls
                   WHEN 0 THEN q * q
                   WHEN 1 THEN 0.0
                   WHEN 2 THEN 0.0
                   WHEN 3 THEN 2.0 * p * q
                   WHEN 4 THEN 0.0
                   ELSE p * p END AS e2
          FROM (SELECT si, sj, cls, n,
                       CAST(pbin AS DOUBLE) / {bf!r} AS p,
                       1.0 - CAST(pbin AS DOUBLE) / {bf!r} AS q
                FROM mcell) raw
        ), mit0 AS MATERIALIZED (
          SELECT si, sj, CAST(SUM(n) AS BIGINT) AS m_used,
                 1.0 / 3.0 AS k0, 1.0 / 3.0 AS k1, 1.0 / 3.0 AS k2
          FROM cellsp GROUP BY si, sj
        )"""

    def ustep(km: str) -> str:
        den = "t.k0 * c.e0 + t.k1 * c.e1 + t.k2 * c.e2"
        return (
            f"CAST(FLOOR((CASE WHEN {den} > 0.0 "
            f"THEN t.{km} * c.e{km[1]} / ({den}) * 1000000000.0 "
            f"ELSE t.{km} * 1000000000.0 END) + 0.5) AS BIGINT)"
        )

    steps = []
    for i in range(int(em_iters)):
        steps.append(f"""
        , mit{i + 1} AS MATERIALIZED (
          SELECT c.si, c.sj, t.m_used,
                 CAST(CAST(SUM(c.n * {ustep("k0")}) AS BIGINT) AS DOUBLE)
                   / (1000000000.0 * CAST(t.m_used AS DOUBLE)) AS k0,
                 CAST(CAST(SUM(c.n * {ustep("k1")}) AS BIGINT) AS DOUBLE)
                   / (1000000000.0 * CAST(t.m_used AS DOUBLE)) AS k1,
                 CAST(CAST(SUM(c.n * {ustep("k2")}) AS BIGINT) AS DOUBLE)
                   / (1000000000.0 * CAST(t.m_used AS DOUBLE)) AS k2
          FROM cellsp c
          JOIN mit{i} t ON t.si = c.si AND t.sj = c.sj
          GROUP BY c.si, c.sj, t.m_used
        )""")
    return f"""{head}{"".join(steps)}
        SELECT si AS sample_i, sj AS sample_j, m_used, k0, k1,
               (1.0 - k0 - k1) / 2.0 + k1 / 4.0 AS kinship
        FROM mit{int(em_iters)} WHERE m_used >= {int(min_m)}
    """


def inbreeding_mle(
    calls: DataFrame,
    n_bins: int = 128,
    em_iters: int = 30,
    min_m: int = 1,
    assume_unique: bool = False,
) -> DataFrame:
    """Maximum-likelihood per-sample inbreeding F — snpgdsIndInb
    (method='mle'; the reference delegates the whole IndInb family to
    SNPRelate, src/LinkSNPRelate.cpp:69-407): the EM refinement of
    inbreeding_coeff's moment estimators, the per-INDIVIDUAL analogue
    of ibd_mle_from_packed's pair EM.

    Model: each called genotype is IBD-derived with probability F —
    P(g | F) = F*A_g + (1-F)*B_g with A = (q, 0, p) the autozygous
    class probabilities and B = (q^2, 2pq, p^2) the HWE ones (p the
    variant's cohort alt frequency). E-step posterior z = F*A /
    (F*A + (1-F)*B); M-step F' = mean(z). Monotone in likelihood,
    F stays in [0, 1].

    Determinism contract (the seq_ld_em / seq_ibd_mle pattern): p is
    binned to the dyadic round(p * n_bins) grid (bins 0 and n_bins —
    monomorphic-in-effect — dropped as uninformative), cells are
    exact BIGINT (sample, p-bin, genotype-class) counts, fixed
    em_iters steps, and each step's posterior is floored to the
    half-up 1e-9 unit grid so the per-sample reduction is an integer
    sum — the oracle unrolls the identical float tree as chained
    MATERIALIZED CTEs. Exactness bound: m_used * 1e9 must stay inside
    double's 2^53 integer range -> m <= ~9e6 variants per sample
    (document-checked; the engine's float64 bincount and DuckDB's
    HUGEINT sum agree below it).

    Plan: one dose pass, one per-variant stats agg broadcast back,
    one (sample, p-bin, class) agg — cells bounded by n_samples *
    (n_bins-1) * 3 rows — then the vectorized EM in ONE Arrow kernel
    per sample partition. Strictly linear in calls; no pair relation
    anywhere. Output: (sample_id, m_used, inb_f)."""
    if int(n_bins) < 2 or (int(n_bins) & (int(n_bins) - 1)) != 0:
        raise ValueError("n_bins must be a power of two >= 2")
    if int(em_iters) < 1:
        raise ValueError("em_iters must be >= 1")
    bf = float(int(n_bins))
    iters = int(em_iters)
    grid = 1_000_000_000.0

    d, release = _dose_once(calls, assume_unique)
    st = d.groupBy("variant_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("d").cast("bigint").alias("_s"),
    )
    p_expr = F.col("_s").cast("double") / (
        F.lit(2.0) * F.col("_n").cast("double")
    )
    pb = F.floor(p_expr * F.lit(bf) + F.lit(0.5))
    pbins = st.select(
        "variant_id", pb.cast("bigint").alias("pbin")
    ).where((pb > 0.0) & (pb < F.lit(bf)))
    cells = (
        d.join(F.broadcast(pbins), "variant_id")
        .groupBy("sample_id", "pbin", F.col("d").cast("int").alias("cls"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )

    import numpy as np
    import pyarrow as pa

    def em_kernel(batches):
        bl = list(batches)
        if not bl:
            return
        tbl = pa.Table.from_batches(bl)
        if tbl.num_rows == 0:
            return
        sid = tbl["sample_id"].to_numpy(zero_copy_only=False)
        pbin = tbl["pbin"].to_numpy()
        cls = tbl["cls"].to_numpy()
        n = tbl["n"].to_numpy().astype(np.float64)
        uniq, sidx = np.unique(sid, return_inverse=True)
        ns = len(uniq)
        m_used = np.bincount(sidx, weights=n, minlength=ns)
        # cell constants, hoisted: every float op below is in the
        # exact order inbreeding_mle_oracle_sql spells it
        p = pbin.astype(np.float64) / bf
        q = 1.0 - p
        a = np.select(
            [cls == 0, cls == 1], [q, np.zeros_like(p)], default=p
        )
        b = np.select(
            [cls == 0, cls == 1], [q * q, 2.0 * p * q], default=p * p
        )
        f = np.full(ns, 1.0 / 3.0)
        den2 = grid * m_used
        for _ in range(iters):
            fr = f[sidx]
            fa = fr * a
            den = fa + (1.0 - fr) * b
            with np.errstate(invalid="ignore", divide="ignore"):
                u = np.where(
                    den > 0.0,
                    np.floor(fa / den * grid + 0.5),
                    np.floor(fr * grid + 0.5),
                )
            f = np.bincount(sidx, weights=n * u, minlength=ns) / den2
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(uniq),
                pa.array(m_used.astype(np.int64)),
                pa.array(f),
            ],
            names=["sample_id", "m_used", "inb_f"],
        )

    out = (
        cells.repartition("sample_id")
        .mapInArrow(
            em_kernel, schema="sample_id string, m_used bigint, inb_f double"
        )
        .where(F.col("m_used") >= int(min_m))
    )
    return release(out)


def inbreeding_mle_oracle_sql(
    n_bins: int = 128, em_iters: int = 30, min_m: int = 1
) -> str:
    """DuckDB oracle twin of inbreeding_mle over the gcalls CTE
    (caller prepends oracle_prelude()): dedup dose, dyadic p-bins,
    (sample, p-bin, class) BIGINT cells, then em_iters EM steps
    unrolled as chained MATERIALIZED CTEs (the ibd_mle_oracle_sql
    lesson: DuckDB's default CTE inlining goes super-linear past ~12
    steps), posteriors floored to the identical 1e-9 unit grid."""
    B = int(n_bins)
    bf = float(B)
    head = f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), stf AS (
          SELECT variant_id,
                 CAST(SUM(d) AS DOUBLE)
                   / (2.0 * CAST(COUNT(*) AS DOUBLE)) AS p
          FROM dnn GROUP BY variant_id
        ), fbins AS (
          SELECT variant_id, CAST(FLOOR(p * {bf!r} + 0.5) AS BIGINT) AS pbin
          FROM stf
          WHERE FLOOR(p * {bf!r} + 0.5) > 0.0
            AND FLOOR(p * {bf!r} + 0.5) < {bf!r}
        ), fcell AS (
          SELECT d.sample_id, w.pbin, d.d AS cls,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM dnn d JOIN fbins w ON w.variant_id = d.variant_id
          GROUP BY d.sample_id, w.pbin, d.d
        ), fcellp AS MATERIALIZED (
          SELECT sample_id, n,
                 CASE cls WHEN 0 THEN q WHEN 1 THEN 0.0 ELSE p END AS ap,
                 CASE cls WHEN 0 THEN q * q WHEN 1 THEN 2.0 * p * q
                          ELSE p * p END AS bp
          FROM (SELECT sample_id, cls, n,
                       CAST(pbin AS DOUBLE) / {bf!r} AS p,
                       1.0 - CAST(pbin AS DOUBLE) / {bf!r} AS q
                FROM fcell) raw
        ), fit0 AS MATERIALIZED (
          SELECT sample_id, CAST(SUM(n) AS BIGINT) AS m_used,
                 1.0 / 3.0 AS f
          FROM fcellp GROUP BY sample_id
        )"""
    den = "t.f * c.ap + (1.0 - t.f) * c.bp"
    ustep = (
        f"CAST(FLOOR((CASE WHEN {den} > 0.0 "
        f"THEN t.f * c.ap / ({den}) * 1000000000.0 "
        f"ELSE t.f * 1000000000.0 END) + 0.5) AS BIGINT)"
    )
    steps = []
    for i in range(int(em_iters)):
        steps.append(f"""
        , fit{i + 1} AS MATERIALIZED (
          SELECT c.sample_id, t.m_used,
                 CAST(CAST(SUM(c.n * {ustep}) AS BIGINT) AS DOUBLE)
                   / (1000000000.0 * CAST(t.m_used AS DOUBLE)) AS f
          FROM fcellp c
          JOIN fit{i} t ON t.sample_id = c.sample_id
          GROUP BY c.sample_id, t.m_used
        )""")
    return f"""{head}{"".join(steps)}
        SELECT sample_id, m_used, f AS inb_f
        FROM fit{int(em_iters)} WHERE m_used >= {int(min_m)}
    """
