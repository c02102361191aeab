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
) -> DataFrame:
    """Point-in-interval join (genomic annotation overlap; closed
    interval [start, end]). Both sides are bucketed into fixed bins so
    the range predicate rides an equi-join on (keys..., bin).

    Each point lands in exactly one bin -> no dedup needed; each interval
    replicates into (end//bin - start//bin + 1) bins. Pick bin_size near
    the median interval length.
    """
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
    if how == "left_semi":
        # selection semantics: keep points overlapping ANY interval, one
        # row each (the residual filter needs interval columns, so this
        # is inner-join + dedupe rather than a native semi join)
        joined = p.join(i, keys + ["__bin"], "inner").filter(
            F.col(point_col).between(F.col(start_col), F.col(end_col))
        )
        return joined.select(*points.columns).dropDuplicates(points.columns)
    joined = p.join(i, keys + ["__bin"], how).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bin")
