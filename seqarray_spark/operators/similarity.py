"""Similarity search over embedding columns: brute-force cosine top-k as
the exact baseline, plus LSH-bucketed and IVF-style scale paths.

Scale design: brute-force is a single narrow projection + top-k (no
shuffle except the final k-row ordering — Spark's TakeOrderedAndProject).
The IVF variant prunes to the nprobe nearest coarse cells so the scored
row count drops by ~ncells/nprobe; centroids are broadcast (tiny), so the
only shuffle left is the same final top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seqarray_spark.operators.dedup import _hyperplane_bucket, cosine


def _query_lit(query_vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: one scan, TakeOrderedAndProject
    (per-partition heaps + driver-side k-merge; nothing else shuffles)."""
    q = _query_lit(query_vec)
    return (
        emb.select(
            F.col(id_col),
            cosine(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket. Recall grows with fewer planes (bigger buckets); production
    layout would pre-materialize `_bucket` as a partition column so the
    scan prunes to one bucket's files."""
    q = _query_lit(query_vec)
    bucketed = emb.withColumn("_bucket", _hyperplane_bucket(F.col(vec_col), planes))
    qb = bucketed.sparkSession.range(1).select(
        _hyperplane_bucket(q, planes).alias("_bucket")
    )
    return (
        bucketed.join(F.broadcast(qb), "_bucket")
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent_vec: str = "c_vec",
    cent_id: str = "c_id",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (broadcast cross-score + per-vector argmax). Centroids can come from
    any clustering; ivf_centroids_sample gives a deterministic seed set."""
    scored = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine(F.col(vec_col), F.col(cent_vec))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col(cent_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, F.col(cent_id).alias("ivf_cell"))
    )


def ivf_centroids_sample(
    emb: DataFrame, ncells: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic centroid seed set: the ncells vectors with the
    smallest ids (stand-in for a k-means fit; stable across runs)."""
    return (
        emb.orderBy(id_col)
        .limit(ncells)
        .select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    )


def ivf_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score centroids against the query, keep the nprobe
    nearest cells, score only vectors assigned there."""
    cents = ivf_centroids_sample(emb, ncells, vec_col, id_col)
    assigned = ivf_assign(emb, cents, vec_col, id_col)
    q = _query_lit(query_vec)
    probe = (
        cents.select(F.col("c_id").alias("ivf_cell"), cosine(F.col("c_vec"), q).alias("_s"))
        .orderBy(F.col("_s").desc(), "ivf_cell")
        .limit(nprobe)
        .select("ivf_cell")
    )
    return (
        assigned.join(F.broadcast(probe), "ivf_cell")
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
