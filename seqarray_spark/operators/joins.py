"""Join operators Spark lacks natively: as-of join and interval (range)
join — composed from built-in operators so Catalyst still owns the
physical strategy (SURVEY.md §2.4 notes the reference has neither; both
are core to time-series and genomic-annotation workloads).

Scale shapes:
- asof_join: union + one window pass — a single shuffle on (keys), no
  join at all. The classic merge_asof-per-group pandas fallback shuffles
  the same data but then single-threads each group through Python; the
  window form stays in codegen.
- interval_join: fixed-bin bucketing turns the non-equi range predicate
  into an equi-join on (partition key, bin) + residual filter. Interval
  rows explode to ~(len/bin_size + 1) copies — bounded fan-out chosen by
  bin_size; no broadcast requirement, no cartesian fallback (Spark's
  default for non-equi joins is BroadcastNestedLoop — unusable at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    keys: list[str],
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on (direction='backward'; 'forward' = nearest
    right.on >= left.on), per join keys. Ties on `on` match (inclusive).

    right must be unique per (keys, on) — pre-aggregate otherwise.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    value_cols = value_cols or [
        c for c in right.columns if c not in keys + [on]
    ]
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *keys,
        F.col(on),
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in keys + [on]],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).select(*lcols, "__is_left", *[f"__r_{c}" for c in value_cols])

    u = l_tag.unionByName(r_tag)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ]
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = [
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ]
    out = u.select(*lcols, "__is_left", *picked).filter(F.col("__is_left") == 1)
    return out.select(
        *lcols, *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "position",
    start_col: str = "start",
    end_col: str = "end",
    keys: list[str] | None = None,
    bin_size: int = 100_000,
    how: str = "inner",
    point_keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join (genomic annotation overlap; closed
    interval [start, end]). Both sides are bucketed into fixed bins so
    the range predicate rides an equi-join on (keys..., bin).

    Each point lands in exactly one bin -> no dedup needed; each interval
    replicates into (end//bin - start//bin + 1) bins. Pick bin_size near
    the median interval length.

    how: 'inner' (one row per overlapping pair), 'left' (points with no
    overlap survive null-extended — the range predicate is folded into
    the join condition so outer semantics hold), 'left_semi' (points
    overlapping ANY interval, one row each).

    point_keys: unique key of `points` (e.g. ['variant_id']). With
    'left_semi' it turns the dedup into a distinct() on the narrow key +
    a semi join back — the matched-key set is usually small enough for
    AQE to broadcast, so full-width point rows never shuffle twice.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError("how must be inner|left|left_semi")
    keys = keys if keys is not None else ["chromosome"]
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_size))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_size),
                F.floor(F.col(end_col) / bin_size),
            )
        ),
    )
    residual = F.col(point_col).between(F.col(start_col), F.col(end_col))
    if how == "left_semi":
        joined = p.join(i, keys + ["__bin"], "inner").filter(residual)
        if point_keys:
            matched = joined.select(*point_keys).distinct()
            return points.join(matched, point_keys, "left_semi").select(
                *points.columns
            )
        # no key given: dedup on full width (last resort — pass
        # point_keys at scale)
        return joined.select(*points.columns).dropDuplicates(points.columns)
    if how == "left":
        # fold the range predicate into the join condition so
        # non-matching points survive null-extended instead of being
        # dropped by a post-join filter
        ren = {k: f"__i_{k}" for k in keys}
        i2 = i.withColumnRenamed("__bin", "__ibin")
        for k, rk in ren.items():
            i2 = i2.withColumnRenamed(k, rk)
        cond = (F.col("__bin") == F.col("__ibin")) & F.col(point_col).between(
            F.col(start_col), F.col(end_col)
        )
        for k, rk in ren.items():
            cond = cond & (F.col(k) == F.col(rk))
        return p.join(i2, cond, "left").drop("__bin", "__ibin", *ren.values())
    joined = p.join(i, keys + ["__bin"], "inner").filter(residual)
    return joined.drop("__bin")
