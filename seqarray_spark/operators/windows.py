"""Genomic sliding-window units and unit algebra (SURVEY.md §2.7).

Reference parity:
- seqUnitSlidingWindows (R/UnitList.R:121-175; SEQ_Unit_SlidingWindows
  src/ReadByUnit.cpp:30-114)
- seqUnitCreate/Subset/Merge/SetDiff (R/UnitList.R:181-284)
- seqUnitFilterCond (R/UnitList.R:12-114)
- seqUnitApply (R/UnitList.R:290-443)

Representation: a *units* DataFrame in long form —
    (chromosome, unit_start, unit_end, variant_id)
one row per (window, member variant). The reference's list-of-index-vectors
becomes this relation. Convention: a row with NULL variant_id is an
EMPTY-WINDOW PLACEHOLDER (sliding_windows(dup_rm=False) emits one per
memberless grid window, matching the reference's unconditional window
walk). Consumers honor it as "window exists, zero members": unit_counts
counts it as 0, equi-joins on variant_id (unit_apply/unit_filter_cond)
naturally drop it, and unit_merge keeps at most one placeholder per
window and only when no side contributes real members.

Scale: window membership is computed per-variant with a bounded explode
(size/shift window ids per variant — a constant), so there is no range
join and no driver-side window enumeration. Everything downstream is
groupBy(chromosome, unit_start) — one shuffle, prunable by chromosome.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_windows(
    variants: DataFrame,
    win_size: int = 5000,
    win_shift: int = 2500,
    win_start: int = 0,
    dup_rm: bool = True,
) -> DataFrame:
    """Per chromosome, assign each variant to every sliding bp window
    [start, start+size) covering its position (reference defaults
    win.size=5000, win.shift=2500, win.start=0 —
    seqUnitSlidingWindows R/UnitList.R:121-124; window walk
    src/ReadByUnit.cpp:44-67, end reported inclusive start+size-1).

    Each variant belongs to at most ceil(size/shift) windows: window ids
    k with  win_start + k*shift <= pos < win_start + k*shift + size.
    dup_rm drops duplicate-content windows (keeps the earliest start) and
    skips empty ones, matching the reference's dup.rm=TRUE; with
    dup_rm=False the reference walks EVERY grid window whose start is
    <= the chromosome's max position (src/ReadByUnit.cpp:44-67 'num++'
    unconditional), so empty windows appear as rows with a NULL
    variant_id (unit_counts reports them as 0).
    """
    if win_size <= 0 or win_shift <= 0:
        raise ValueError("win_size and win_shift must be positive")
    pos = F.col("position")
    k_hi = F.floor((pos - F.lit(win_start)) / F.lit(win_shift)).cast("long")
    k_lo = F.greatest(
        F.ceil((pos - F.lit(win_start) - F.lit(win_size) + 1) / F.lit(win_shift)).cast("long"),
        F.lit(0).cast("long"),
    )
    units = (
        variants.select("variant_id", "chromosome", "position")
        .filter(pos >= win_start)
        .withColumn("__k", F.explode(F.sequence(k_lo, k_hi)))
        .select(
            "chromosome",
            (F.lit(win_start) + F.col("__k") * F.lit(win_shift)).cast("long").alias("unit_start"),
            "variant_id",
        )
        .withColumn("unit_end", (F.col("unit_start") + F.lit(win_size) - 1).cast("long"))
        .select("chromosome", "unit_start", "unit_end", "variant_id")
    )
    if not dup_rm:
        # full grid per chromosome (one tiny per-chrom max aggregate):
        # windows with no members join as NULL-variant rows
        grid = (
            variants.filter(pos >= win_start)
            .groupBy("chromosome")
            .agg(F.max("position").alias("__maxp"))
            .select(
                "chromosome",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.floor(
                            (F.col("__maxp") - F.lit(win_start)) / F.lit(win_shift)
                        ).cast("long"),
                    )
                ).alias("__k"),
            )
            .select(
                "chromosome",
                (F.lit(win_start) + F.col("__k") * F.lit(win_shift))
                .cast("long").alias("unit_start"),
            )
            .withColumn(
                "unit_end", (F.col("unit_start") + F.lit(win_size) - 1).cast("long")
            )
        )
        return grid.join(
            units, ["chromosome", "unit_start", "unit_end"], "left"
        ).select("chromosome", "unit_start", "unit_end", "variant_id")
    if dup_rm:
        content = units.groupBy("chromosome", "unit_start", "unit_end").agg(
            F.sort_array(F.collect_list("variant_id")).alias("__content")
        )
        keep = (
            content.groupBy("chromosome", "__content")
            .agg(F.min("unit_start").alias("unit_start"))
            .select("chromosome", "unit_start")
        )
        units = units.join(keep, ["chromosome", "unit_start"], "left_semi")
    return units


def unit_counts(units: DataFrame) -> DataFrame:
    """Variants per window — the basic windowed profile. Empty windows
    (NULL-variant grid rows from dup_rm=False) count 0."""
    return units.groupBy("chromosome", "unit_start", "unit_end").agg(
        F.count("variant_id").alias("n_variants")
    )


def unit_create(spark, idx, desp: list[dict] | None = None) -> DataFrame:
    """User-defined unit list from per-unit variant-id vectors
    (reference: seqUnitCreate R/UnitList.R:181-209). Reference
    sanitization preserved: None and <1 entries are silently dropped
    from each vector; a non-sequence unit errors. `desp` is the
    reference's desp data.frame — one dict per unit, joined onto the
    rows; default desp is the 1-based unit id alone.

    Returns a long (unit_id, variant_id, <desp columns...>) frame —
    the engine's id-keyed unit shape (unit lists are caller-supplied
    driver data by definition, so driver-side assembly is the
    reference's own shape, not a scale concession)."""
    if desp is not None and len(desp) != len(idx):
        raise ValueError("desp must have one row per unit")
    rows = []
    for i, ks in enumerate(idx):
        if not hasattr(ks, "__iter__"):
            raise ValueError(f"idx[{i}] should be a sequence of variant ids")
        ks = [int(k) for k in ks if k is not None and int(k) >= 1]
        d = desp[i] if desp is not None else {}
        for k in ks:
            rows.append((i + 1, k, *d.values()))
        if not ks:
            rows.append((i + 1, None, *d.values()))
    extra = ""
    if desp:
        def styp(v):
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, int):
                return "bigint"
            if isinstance(v, float):
                return "double"
            return "string"

        extra = "".join(
            f", `{k}` {styp(v)}" for k, v in desp[0].items()
        )
    return spark.createDataFrame(
        rows, f"unit_id int, variant_id bigint{extra}"
    )


def unit_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of unit lists (reference: seqUnitMerge R/UnitList.R:242-260).
    Empty-window placeholders (NULL variant_id) survive only for windows
    with no real members on either side — a window that is empty in one
    list and populated in the other merges to its members alone."""
    u = a.unionByName(b).distinct()
    wkey = ["chromosome", "unit_start", "unit_end"]
    members = u.filter(F.col("variant_id").isNotNull())
    placeholders = u.filter(F.col("variant_id").isNull()).join(
        members.select(*wkey).distinct(), wkey, "left_anti"
    )
    return members.unionByName(placeholders)


def unit_set_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Units of `a` not fully present in `b` — membership rows removed
    (reference: seqUnitSetDiff R/UnitList.R:262-284)."""
    return a.exceptAll(b.select(*a.columns))


def unit_subset(units: DataFrame, chromosome=None, start=None, end=None) -> DataFrame:
    """Window subset by coordinates (reference: seqUnitSubset)."""
    out = units
    if chromosome is not None:
        chroms = [chromosome] if isinstance(chromosome, str) else list(chromosome)
        out = out.filter(F.col("chromosome").isin(chroms))
    if start is not None:
        out = out.filter(F.col("unit_start") >= int(start))
    if end is not None:
        out = out.filter(F.col("unit_end") <= int(end))
    return out


def unit_filter_cond(
    units: DataFrame,
    calls: DataFrame,
    maf: float | None = None,
    mac: int | None = None,
    missing_rate: float | None = None,
    min_num: int = 1,
) -> DataFrame:
    """Threshold variants *within each window unit* and drop units that
    fall below min_num members (reference: seqUnitFilterCond
    R/UnitList.R:12-114).

    Per-variant stats are computed once (one shuffle) and broadcast-joined
    into the membership relation — the per-unit re-aggregation the
    reference does per worker is unnecessary because stats are
    variant-level.
    """
    from seqarray_spark.operators.aggregates import af_ac_missing

    stats = af_ac_missing(calls)
    pred = F.lit(True)
    if maf is not None:
        pred = pred & (F.col("maf") >= float(maf))
    if mac is not None:
        pred = pred & (F.col("mac") >= int(mac))
    if missing_rate is not None:
        pred = pred & (F.col("missing_rate") <= float(missing_rate))
    kept = units.join(
        stats.filter(pred).select("variant_id"), "variant_id", "left_semi"
    )
    big_enough = (
        kept.groupBy("chromosome", "unit_start")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= int(min_num))
        .select("chromosome", "unit_start")
    )
    return kept.join(big_enough, ["chromosome", "unit_start"], "left_semi")


def unit_apply_agg(units: DataFrame, calls: DataFrame, *aggs) -> DataFrame:
    """Declarative per-unit aggregation over member variants' calls —
    covers the dominant seqUnitApply use (fold over each window) without
    Python. For arbitrary python kernels use apply.unit_apply."""
    joined = units.join(calls, "variant_id")
    return joined.groupBy("chromosome", "unit_start", "unit_end").agg(*aggs)
