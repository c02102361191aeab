"""EIGMIX eigenanalysis + admixture proportions — SNPRelate's
snpgdsEIGMIX / snpgdsAdmixProp (Zheng & Weir 2016, "Eigenanalysis of
SNP genotypes"), the ancestry workflow the reference delegates through
src/LinkSNPRelate.cpp:69-407, composed on the grm_pca substrate.

EIGMIX differs from the GCTA GRM in its normalization: the coancestry
matrix is the RATIO OF SUMS

    M_ij = sum_v (d_i - 2p)(d_j - 2p)  /  sum_v 2p(1-p)

over each pair's co-called polymorphic variants — one shared
denominator per pair instead of a per-variant 1/(2pq) weight, which
keeps rare variants from dominating (the same mean-of-ratios vs
ratio-of-sums distinction as fst_wc_genome). Admixture proportions
then come from the barycentric coordinates of each sample in the
simplex spanned by reference-group centroids in the top K-1
eigenvector space.

Oracle split (the grm_pca precedent): the PAIR RELATION is gated with
a full SQL oracle (integer-unit quantized contributions, exact BIGINT
sums); the eigensolve is pytest-pinned (deterministic _fix_signs);
admix_prop's K=3 closed-form barycentric tree is gated end to end on
deterministic md5-Rademacher coordinates."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from seqarray_spark.operators.ld import (
    _DOSE_ALT_SQL,
    _dose_flat,
    _spread_pairs,
    grm_pca,
)


def eigmix_pairs(
    calls: DataFrame,
    min_m: int = 1,
    unit_scale: int = 6,
    include_diag: bool = False,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """EIGMIX coancestry for sample pairs: numerator and denominator
    terms quantized to the half-up 1e-unit_scale integer grid per
    (variant, pair), BIGINT-summed per pair (aggregation-order-free),
    final value = exact-sum ratio — the SAME dedup-dose + within-
    variant self-join shape as grm_pairs, which is the oracle-
    checkable contract; eigmix_from_packed is the matmul production
    form. include_diag adds sample_i == sample_j rows (the
    non-constant EIGMIX diagonal eigmix() assembles).

    Output: (sample_i, sample_j, m_used, eigmix); NULL eigmix if the
    pair's denominator mass rounds to zero."""
    # r13 opt (see ld._pair_table_sums): the per-(variant, pair)
    # numerator depends only on (variant, x, y) — a 3×3 quantized table
    # per variant, each entry the ORIGINAL expression tree evaluated at
    # literal dosages (same doubles, same IEEE ops, same HALF_UP round,
    # so every summed integer is bit-identical); the quantized
    # denominator _de is (x,y)-independent and sums once per
    # co-observation. The blocked indicator-matmul kernel replaces the
    # r_v² self-join blowup (measured 10.75s task time on 2 tasks at
    # sf0.1 BEFORE the repartition fix; the blowup itself is gone now).
    from seqarray_spark.operators.ld import _dose_once, _pair_table_sums

    # sample_ids: superset-tolerant inventory (the grm_pairs rule —
    # zero-observation ids produce only m_used = 0 pairs, dropped by
    # min_m >= 1; diagonal rows included, same filter applies)
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
    st = st.where((F.col("_s") > 0) & (F.col("_s") < 2 * F.col("_n")))
    scale = float(10 ** int(unit_scale))
    twop_v = F.col("_s").cast("double") / F.col("_n").cast("double")
    st = st.select(
        "variant_id",
        *[
            F.round(
                ((F.lit(float(x)) - twop_v) * (F.lit(float(y)) - twop_v))
                * F.lit(scale)
            )
            .cast("bigint")
            .alias(f"nu_{x}{y}")
            for x in range(3)
            for y in range(3)
        ],
        F.round(
            (twop_v * (F.lit(1.0) - twop_v / F.lit(2.0))) * F.lit(scale)
        )
        .cast("bigint")
        .alias("de"),
    )
    sums = _pair_table_sums(
        d, ids, st=st, tables=("nu",), consts=("de",),
        include_diag=include_diag,
    )
    lab = F.array(*[F.lit(s) for s in ids])
    out = (
        _spread_pairs(sums).groupBy("_si", "_sj")
        .agg(
            F.sum("m_used").alias("m_used"),
            F.sum("_s_nu").alias("_snu"),
            F.sum("_s_de").alias("_sde"),
        )
        .where(F.col("m_used") >= int(min_m))
        .select(
            F.element_at(lab, F.col("_si") + 1).alias("sample_i"),
            F.element_at(lab, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            F.when(
                F.col("_sde") != 0,
                F.col("_snu").cast("double") / F.col("_sde").cast("double"),
            ).alias("eigmix"),
        )
    )
    return release(out)


def eigmix_pairs_oracle_sql(min_m: int = 1, unit_scale: int = 6) -> str:
    """DuckDB oracle twin of eigmix_pairs (off-diagonal form) over the
    gcalls CTE; contribution expressions spelled in the engine's op
    order, units BIGINT before summing (the grm_pairs pattern)."""
    scale = float(10 ** int(unit_scale))
    twop = "(CAST(st.s_sum AS DOUBLE) / CAST(st.n_obs AS DOUBLE))"
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), st AS (
          SELECT variant_id, COUNT(*) AS n_obs,
                 CAST(SUM(d) AS BIGINT) AS s_sum
          FROM dnn GROUP BY variant_id
          HAVING CAST(SUM(d) AS BIGINT) > 0
             AND CAST(SUM(d) AS BIGINT) < 2 * COUNT(*)
        ), u AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 CAST(round(((CAST(a.d AS DOUBLE) - {twop})
                             * (CAST(b.d AS DOUBLE) - {twop}))
                            * {scale!r}) AS BIGINT) AS nu_units,
                 CAST(round(({twop} * (1.0 - {twop} / 2.0))
                            * {scale!r}) AS BIGINT) AS de_units
          FROM dnn a
          JOIN dnn b ON a.variant_id = b.variant_id
                    AND a.sample_id < b.sample_id
          JOIN st ON st.variant_id = a.variant_id
        )
        SELECT sample_i, sample_j, COUNT(*) AS m_used,
               CASE WHEN CAST(SUM(de_units) AS BIGINT) <> 0
                    THEN CAST(CAST(SUM(nu_units) AS BIGINT) AS DOUBLE)
                         / CAST(CAST(SUM(de_units) AS BIGINT) AS DOUBLE)
               END AS eigmix
        FROM u GROUP BY sample_i, sample_j
        HAVING COUNT(*) >= {int(min_m)}
    """


def eigmix(
    calls: DataFrame,
    k: int = 2,
    min_m: int = 1,
    unit_scale: int = 6,
    sample_ids: list[str] | None = None,
    block: int = 2048,
) -> DataFrame:
    """snpgdsEIGMIX: eigen-decomposition of the EIGMIX coancestry
    matrix WITH its true (non-constant) diagonal — rides grm_pca's
    blocked-Arrow assembly + deterministic-sign eigensolve (diag=None
    keeps the sample_i == sample_j rows the pair build provides).
    Output: (sample_id, pc array<double> of k eigenvector entries)."""
    pairs = eigmix_pairs(
        calls, min_m=min_m, unit_scale=unit_scale, include_diag=True
    ).select(
        "sample_i", "sample_j", "m_used", F.col("eigmix").alias("grm")
    )
    return grm_pca(
        pairs, k=k, diag=None, sample_ids=sample_ids, block=block
    )


def admix_prop(
    coords: DataFrame,
    groups: DataFrame,
    coord_col: str = "pc",
    group_col: str = "population",
    id_col: str = "sample_id",
) -> DataFrame:
    """snpgdsAdmixProp: admixture proportions relative to K reference
    groups, as the barycentric coordinates of each sample against the
    group CENTROIDS in the top K-1 eigenvector dimensions (Zheng &
    Weir 2016 §'estimating admixture proportions'): solve
    x = sum_k a_k c_k with sum_k a_k = 1 — an exactly-determined K x K
    linear system. Estimates are raw (can fall outside [0,1] for
    samples beyond the reference simplex — SNPRelate's bounded variant
    is presentation policy, callers clamp).

    `coords` is (id, array<double>) — eigmix()/grm_pca() output;
    `groups` (id, group) lists the REFERENCE members only (typically a
    labeled subset; every coords row gets proportions). K = distinct
    groups; the first K-1 coordinate dims are used.

    K=3 runs the closed-form triangle barycentric tree (what the
    seq_admix_prop gate replays in SQL); general K solves the
    centroid system driver-side (numpy) and applies it as literal
    Column coefficients — either way ONE broadcast-size collect
    (K rows) and a linear per-sample projection, no shuffle.

    Output: (sample_id, prop array<double>) ordered by sorted group
    label (prop[i] <-> i-th group)."""
    import numpy as np

    from seqarray_spark.operators.ld import _array_width

    width = _array_width(coords, coord_col, None, "coords")
    k = groups.select(group_col).distinct().count()
    if k < 2:
        raise ValueError("admix_prop needs >= 2 reference groups")
    dims = k - 1
    if width < dims:
        raise ValueError(
            f"coords carry {width} dims; K = {k} groups need >= {dims}"
        )
    cen_rows = (
        coords.join(
            groups.select(
                F.col(id_col).alias("_aid"), F.col(group_col).alias("_g")
            ),
            F.col(id_col) == F.col("_aid"),
        )
        .groupBy("_g")
        .agg(
            *[
                (
                    F.sum(F.element_at(coord_col, t + 1))
                    / F.count(F.lit(1))
                ).alias(f"_c{t}")
                for t in range(dims)
            ],
        )
        .orderBy("_g")
        .collect()
    )
    if len(cen_rows) != k:
        raise ValueError(
            "reference group lost all members in the coords join"
        )
    cen = [[float(r[f"_c{t}"]) for t in range(dims)] for r in cen_rows]
    x = [F.element_at(coord_col, t + 1) for t in range(dims)]
    if k == 3:
        # closed-form triangle barycentric — the oracle-replayable
        # float tree (admix_prop_oracle_sql spells the same ops)
        (x1, y1), (x2, y2), (x3, y3) = cen
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        if det == 0.0:
            raise ValueError("reference centroids are collinear")
        a1 = (
            F.lit(y2 - y3) * (x[0] - F.lit(x3))
            + F.lit(x3 - x2) * (x[1] - F.lit(y3))
        ) / F.lit(det)
        a2 = (
            F.lit(y3 - y1) * (x[0] - F.lit(x3))
            + F.lit(x1 - x3) * (x[1] - F.lit(y3))
        ) / F.lit(det)
        props = [a1, a2, F.lit(1.0) - a1 - a2]
    else:
        mat = np.vstack(
            [np.array(cen, dtype=np.float64).T, np.ones((1, k))]
        )
        inv = np.linalg.inv(mat)  # raises LinAlgError if degenerate
        props = [
            sum(
                (F.lit(float(inv[r, t])) * x[t] for t in range(dims)),
                F.lit(float(inv[r, dims])),
            )
            for r in range(k)
        ]
    return coords.select(
        id_col, F.array(*props).alias("prop")
    )


def admix_prop_oracle_groups_sql(mod: int = 3) -> str:
    """The seq_admix_prop gate's reference-group rule as SQL: sample
    suffix mod `mod`, total under TRY_CAST failure (the _parity_pops
    convention). Keep in lockstep with the engine's gate expression in
    __spark_entry__._mod3_groups."""
    return (
        "CONCAT('G', CAST(COALESCE("
        f"TRY_CAST(SUBSTRING(sample_id, 2) AS INT) % {int(mod)}, 9) "
        "AS STRING))"
    )


def admix_prop_oracle_sql() -> str:
    """DuckDB oracle twin of the seq_admix_prop gate: 2-d md5-
    Rademacher coordinates (the shared omega rule), suffix-mod-3
    reference groups, group centroids as SUM/COUNT (exact on the ±1
    coordinate grid), then the SAME closed-form K=3 barycentric tree
    admix_prop spells. Output (sample_id, prop_0, prop_1, prop_2)."""
    from seqarray_spark.operators.ld import _OMEGA_EVENS

    evens = ", ".join(f"'{e}'" for e in _OMEGA_EVENS)

    def om(c: int) -> str:
        return (
            "(CASE WHEN SUBSTRING(md5(CONCAT(sample_id, "
            f"':{c}')), 1, 1) IN ({evens}) THEN 1.0 ELSE -1.0 END)"
        )

    grp = admix_prop_oracle_groups_sql()
    return f"""
        , acoords AS (
          SELECT sample_id, {om(0)} AS cx, {om(1)} AS cy, {grp} AS g
          FROM (SELECT DISTINCT sample_id FROM gcalls) u
        ), cgrp AS (
          SELECT g, SUM(cx) / COUNT(*) AS mx, SUM(cy) / COUNT(*) AS my
          FROM acoords GROUP BY g
        ), cent AS (
          SELECT
            MAX(CASE WHEN rk = 1 THEN mx END) AS x1,
            MAX(CASE WHEN rk = 1 THEN my END) AS y1,
            MAX(CASE WHEN rk = 2 THEN mx END) AS x2,
            MAX(CASE WHEN rk = 2 THEN my END) AS y2,
            MAX(CASE WHEN rk = 3 THEN mx END) AS x3,
            MAX(CASE WHEN rk = 3 THEN my END) AS y3
          FROM (SELECT mx, my,
                       ROW_NUMBER() OVER (ORDER BY g) AS rk
                FROM cgrp) r
        )
        SELECT s.sample_id,
               ((c.y2 - c.y3) * (s.cx - c.x3)
                + (c.x3 - c.x2) * (s.cy - c.y3))
               / ((c.y2 - c.y3) * (c.x1 - c.x3)
                  + (c.x3 - c.x2) * (c.y1 - c.y3)) AS prop_0,
               ((c.y3 - c.y1) * (s.cx - c.x3)
                + (c.x1 - c.x3) * (s.cy - c.y3))
               / ((c.y2 - c.y3) * (c.x1 - c.x3)
                  + (c.x3 - c.x2) * (c.y1 - c.y3)) AS prop_1,
               1.0 - ((c.y2 - c.y3) * (s.cx - c.x3)
                      + (c.x3 - c.x2) * (s.cy - c.y3))
                     / ((c.y2 - c.y3) * (c.x1 - c.x3)
                        + (c.x3 - c.x2) * (c.y1 - c.y3))
                   - ((c.y3 - c.y1) * (s.cx - c.x3)
                      + (c.x1 - c.x3) * (s.cy - c.y3))
                     / ((c.y2 - c.y3) * (c.x1 - c.x3)
                        + (c.x3 - c.x2) * (c.y1 - c.y3)) AS prop_2
        FROM acoords s, cent c
    """


def ibs_dist(ibs_pairs: DataFrame) -> DataFrame:
    """Allele-sharing distance d = 1 - IBS from an ibs_from_packed
    relation — PLINK's `--distance 1-ibs` matrix, the dissimilarity
    snpgdsHCluster-style ancestry clustering consumes (the reference
    ecosystem's snpgdsDiss fills the same role). Pure projection; the
    1.0 - ibs expression is spelled identically in the oracle."""
    return ibs_pairs.select(
        "sample_i",
        "sample_j",
        "m_used",
        (F.lit(1.0) - F.col("ibs")).alias("dist"),
    )


def ibs_dist_oracle_sql(min_m: int = 1) -> str:
    """DuckDB oracle twin of pack_2bit_genotypes -> ibs_from_packed ->
    ibs_dist (the ibs chain + the identical 1.0 - ibs projection)."""
    from seqarray_spark.operators.ld import ibs_packed_oracle_sql

    inner = ibs_packed_oracle_sql(min_m=min_m)
    return f"""{inner.rsplit("SELECT", 1)[0]}
        SELECT sample_i, sample_j, m_used,
               1.0 - ((2.0 * CAST(m_used AS DOUBLE) - CAST(sd AS DOUBLE))
                      / (2.0 * CAST(m_used AS DOUBLE))) AS dist
        FROM s WHERE m_used >= {int(min_m)}
    """


def hcluster_average(
    dist: DataFrame,
    sample_ids: list[str] | None = None,
    val_col: str = "dist",
):
    """UPGMA (average-linkage) agglomerative clustering over a pair
    dissimilarity relation — the snpgdsHCluster step of the ancestry
    workflow (dendrogram over 1-IBS / coancestry distance). The pair
    relation is distributed; the agglomeration itself is driver-side
    numpy over the collected n x n matrix (Lance-Williams average
    update), O(n^2) memory / O(n^3) worst time — right for cohort
    n <= ~5k dendrograms; at biobank n the workflow is eigmix/grm_pca
    coordinates + a flat clusterer, not a dendrogram. Deterministic:
    each step merges the globally closest pair, ties to the smallest
    (i, j) in the row-major condensed scan; missing pairs (min_m
    filtering) are treated as the maximum observed distance.

    Returns (merges, ids): merges is a list of
    (a, b, height, n_members) scipy-linkage-style rows (leaves are
    0..n-1 in sorted-id order; the step-t merge creates node n+t);
    ids is the sorted sample axis."""
    import numpy as np

    from seqarray_spark.operators.ld import _grm_sample_axis

    renamed = dist.select(
        "sample_i", "sample_j", F.col(val_col).alias("grm")
    )
    ids = _grm_sample_axis(renamed, sample_ids)
    n = len(ids)
    if n < 2:
        raise ValueError("hcluster needs >= 2 samples")
    pos = {s: i for i, s in enumerate(ids)}
    d = np.full((n, n), np.nan)
    for r in renamed.collect():
        i, j = pos[r["sample_i"]], pos[r["sample_j"]]
        d[i, j] = d[j, i] = float(r["grm"])
    finite = d[np.isfinite(d)]
    fill = float(finite.max()) if len(finite) else 1.0
    d[~np.isfinite(d)] = fill
    np.fill_diagonal(d, np.inf)

    active = list(range(n))  # current node id per matrix row
    sizes = np.ones(n)
    merges = []
    work = d.copy()
    nxt = n
    for _ in range(n - 1):
        m = len(active)
        sub = work[:m, :m]
        flat = int(np.argmin(sub))  # ties -> smallest row-major (i, j)
        i, j = divmod(flat, m)
        if i > j:
            i, j = j, i
        h = float(sub[i, j])
        na, nb = sizes[i], sizes[j]
        merges.append(
            (int(active[i]), int(active[j]), h, int(na + nb))
        )
        # Lance-Williams average update into row i, then drop row j
        newrow = (na * sub[i, :m] + nb * sub[j, :m]) / (na + nb)
        work[i, :m] = newrow
        work[:m, i] = newrow
        work[i, i] = np.inf
        keep = [t for t in range(m) if t != j]
        work[: m - 1, : m - 1] = work[np.ix_(keep, keep)]
        sizes[i] = na + nb
        sizes = np.concatenate([sizes[:j], sizes[j + 1 : m]])
        active[i] = nxt
        nxt += 1
        del active[j]
    return merges, ids


def cut_tree(merges, ids, k: int) -> list[tuple[str, int]]:
    """Cut an hcluster_average dendrogram into k flat clusters —
    snpgdsCutTree: undo the last k-1 merges; cluster labels are
    0..k-1 in order of each cluster's smallest member index
    (deterministic). Returns [(sample_id, cluster)] sorted by id."""
    import numpy as np

    n = len(ids)
    if not (1 <= k <= n):
        raise ValueError(f"k must be in [1, {n}]")
    parent = list(range(n + len(merges)))
    for t, (a, b, _h, _sz) in enumerate(merges[: n - k]):
        parent[a] = n + t
        parent[b] = n + t

    def root(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    roots = [root(i) for i in range(n)]
    order = {}
    for i in range(n):
        order.setdefault(roots[i], len(order))
    assert len(order) == k, (len(order), k)
    return [(ids[i], order[roots[i]]) for i in np.argsort(np.array(ids))]


def beta_pairs(
    calls: DataFrame,
    min_m: int = 1,
    unit_scale: int = 9,
    sample_ids: list[str] | None = None,
) -> DataFrame:
    """Weir & Goudet (2017) individual-beta kinship for sample pairs —
    SNPRelate's snpgdsGRM(method='IndivBeta') / snpgdsIndivBeta,
    delegated by the reference like the rest of the GRM family
    (src/LinkSNPRelate.cpp:69-407). Allele-matching based, no allele
    frequencies anywhere:

        M_ij   = (1/L) sum_v m_v,  m_v = (x_i x_j + (2-x_i)(2-x_j))/4
        beta_ij = (M_ij - M_B) / (1 - M_B)

    with m_v the proportion of matching allele comparisons between the
    two genotypes, L the pair's co-called variant count, and M_B the
    unweighted average of M over ALL pairs — the 'average pair in this
    sample' reference point that makes beta a relative-kinship measure
    robust to allele-frequency misspecification (the paper's point).
    Off-diagonal (i < j) form, the grm_pairs convention. The dose
    relation is variant-repartitioned to cluster parallelism before
    the self-join (the eigmix_pairs fix: the pair blowup's CPU ran on
    the 2 tasks AQE left the tiny upstream exchange at).

    Exactness: 4*m_v is an integer in {0,2,4}, so the per-pair sum S4
    is an exact BIGINT and M_ij = S4/(4L) an exact-sum ratio; M_B
    averages the pairs' M on the half-up 1e-unit_scale grid (exact
    BIGINT over pairs) — the whole estimator is two exact reductions
    + one shared float tree, fully oracle-replayable. Plan: the
    within-variant pair self-join + pair agg (the GRM relation shape),
    then ONE 1-row global reduce broadcast back — no extra wide
    shuffle. Output (sample_i, sample_j, m_used, beta)."""
    # r13 opt (see ld._pair_table_sums): 4·m_v = x·y + (2-x)(2-y) is a
    # variant-INDEPENDENT 3×3 integer table, so the whole matching sum
    # is 9 indicator matmuls per block — the r_v² self-join blowup and
    # its per-row arithmetic are gone; the exact BIGINT sums (and
    # everything downstream: the pair grid, the global average, the
    # beta tree) are unchanged.
    from seqarray_spark.operators.ld import _dose_nn, _pair_table_sums

    # sample_ids: superset-tolerant inventory (the grm_pairs rule;
    # M_B averages pairs AFTER the min_m filter, so zero-observation
    # ids change nothing)
    if sample_ids is not None and int(min_m) >= 1:
        ids = list(sample_ids)
    else:
        ids = [
            r[0] for r in calls.select("sample_id").distinct().collect()
        ]
    ids.sort()
    d = _dose_nn(calls, False)
    m4_table = [[4, 2, 0], [2, 2, 2], [0, 2, 4]]
    sums = _pair_table_sums(d, ids, const_tables={"m4": m4_table})
    lab = F.array(*[F.lit(s) for s in ids])
    pairs = (
        _spread_pairs(sums).groupBy("_si", "_sj")
        .agg(
            F.sum("m_used").alias("m_used"),
            F.sum("_s_m4").cast("bigint").alias("_s4"),
        )
        .where(F.col("m_used") >= int(min_m))
        .select(
            F.element_at(lab, F.col("_si") + 1).alias("sample_i"),
            F.element_at(lab, F.col("_sj") + 1).alias("sample_j"),
            "m_used",
            "_s4",
        )
    )
    scale = float(10 ** int(unit_scale))
    mij = F.col("_s4").cast("double") / (
        F.lit(4.0) * F.col("m_used").cast("double")
    )
    pq = pairs.select(
        "sample_i",
        "sample_j",
        "m_used",
        "_s4",
        F.round(mij * F.lit(scale)).cast("bigint").alias("_mq"),
    )
    # pq feeds BOTH the global average and the final projection — the
    # whole dose+kernel pipeline ran twice without a persist (r13 opt,
    # guide §5: cache what is reused; pq is n_pairs rows — tiny)
    pq = pq.persist()
    from seqarray_spark.plans.lifecycle import release_on_gc

    glob = pq.groupBy().agg(
        F.sum("_mq").alias("_smq"),
        F.count(F.lit(1)).alias("_np"),
    )
    mb = F.col("_smq").cast("double") / (
        F.lit(scale) * F.col("_np").cast("double")
    )
    out = pq.crossJoin(F.broadcast(glob)).select(
        "sample_i",
        "sample_j",
        "m_used",
        F.when(
            F.lit(1.0) - mb != 0.0,
            (mij - mb) / (F.lit(1.0) - mb),
        ).alias("beta"),
    )
    return release_on_gc(pq, out)


def beta_pairs_oracle_sql(min_m: int = 1, unit_scale: int = 9) -> str:
    """DuckDB oracle twin of beta_pairs over the gcalls CTE: identical
    matching-sum, pair grid, global average, and beta tree."""
    scale = float(10 ** int(unit_scale))
    mij = "CAST(s4 AS DOUBLE) / (4.0 * CAST(m_used AS DOUBLE))"
    mb = f"(CAST(smq AS DOUBLE) / ({scale!r} * CAST(np_t AS DOUBLE)))"
    return f"""
        , dose AS (
          SELECT variant_id, sample_id, {_DOSE_ALT_SQL} AS d
          FROM gcalls GROUP BY variant_id, sample_id
        ), dnn AS (
          SELECT variant_id, sample_id, d FROM dose WHERE d IS NOT NULL
        ), bp AS (
          SELECT a.sample_id AS sample_i, b.sample_id AS sample_j,
                 COUNT(*) AS m_used,
                 CAST(SUM(a.d * b.d + (2 - a.d) * (2 - b.d)) AS BIGINT)
                   AS s4
          FROM dnn a
          JOIN dnn b ON a.variant_id = b.variant_id
                    AND a.sample_id < b.sample_id
          GROUP BY a.sample_id, b.sample_id
          HAVING COUNT(*) >= {int(min_m)}
        ), bq AS (
          SELECT sample_i, sample_j, m_used, s4,
                 CAST(round({mij} * {scale!r}) AS BIGINT) AS mq
          FROM bp
        ), bglob AS (
          SELECT CAST(SUM(mq) AS BIGINT) AS smq,
                 CAST(COUNT(*) AS BIGINT) AS np_t
          FROM bq
        )
        SELECT q.sample_i, q.sample_j, q.m_used,
               CASE WHEN 1.0 - {mb} <> 0.0
                    THEN ({mij} - {mb}) / (1.0 - {mb})
               END AS beta
        FROM bq q, bglob g
    """
