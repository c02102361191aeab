"""Join-side hinting that stays safe at 100 TB.

An unconditional ``F.broadcast()`` on a frame that scales with the dataset
(a filtered variant selection, an old->new id mapping) is an OOM at
cluster scale: the hint overrides ``autoBroadcastJoinThreshold`` and AQE,
forcing tens of GB onto the driver and every executor.

``maybe_broadcast`` keeps the hint only when Catalyst's own size estimate
for the optimized plan is below a cap. The estimate costs only driver-side
planning (no job). It is deliberately conservative: plans whose size the
optimizer cannot bound (filters over big scans inherit the child's size)
lose the hint — and AQE then converts the join to broadcast *at runtime*
if the built side turns out small, which is exactly the desired degrade
path. Provably small frames (literal probe lists, sample tables,
``createDataFrame`` inputs) keep the compile-time hint and skip the
runtime exchange altogether.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Catalyst-estimated bytes above which we refuse to force a broadcast.
# Larger than autoBroadcastJoinThreshold on purpose: the estimate is an
# upper bound (uncompressed row width x rows), so a moderate margin keeps
# the hint for genuinely small sides whose estimate is pessimistic.
BROADCAST_CAP_BYTES = 256 * 1024 * 1024


def estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes for the optimized logical plan (no job run).

    Returns None when the estimate is unavailable (e.g. Spark Connect,
    where the JVM plan is not reachable) — callers must treat None as
    'unknown, assume big'.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = stats.sizeInBytes()  # scala BigInt -> py4j delivers int
        return int(size if isinstance(size, int) else size.toString())
    except Exception:
        return None


def maybe_broadcast(df: DataFrame, cap_bytes: int = BROADCAST_CAP_BYTES) -> DataFrame:
    """Broadcast-hint `df` only if Catalyst can prove it is small."""
    est = estimated_plan_bytes(df)
    if est is not None and est <= cap_bytes:
        return F.broadcast(df)
    return df
