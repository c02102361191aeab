"""Mutation / DDL-ish operators (SURVEY.md §2.9).

Reference parity:
- seqAddValue   (R/AddValue.R:520-591)  -> withColumn + dataset rewrite
- seqDelete     (R/Utilities.R:1176-1227) -> drop columns
- seqRecompress (R/UtilsExport.R:357-463) -> rewrite with another codec
- seqTranspose/seqOptimize (R/Utilities.R:1235-1429) -> sample-major
  secondary layout / chromosome partitioning
- seqEmptyFile  (R/Conversion.R:1453+)   -> empty frames with the schema
- seqSystem     (R/Summary.R:826-833)    -> runtime capability report

In Spark these are thin by design: immutability + columnar storage make
most of the reference's node-level surgery a projection + write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seqarray_spark.dataset import SeqDataset


def add_variant_value(ds: SeqDataset, name: str, col_or_df, join_key: str = "variant_id") -> SeqDataset:
    """Add/replace a variant-level variable (reference: seqAddValue
    R/AddValue.R:520-591). Accepts a Column expression or a
    (variant_id, value) DataFrame — the latter is the reference's
    'length must equal #variants' path, here a broadcast join."""
    from seqarray_spark.plans.hints import maybe_broadcast

    v = ds._base_variants
    if isinstance(col_or_df, DataFrame):
        aux = col_or_df.withColumnRenamed(
            [c for c in col_or_df.columns if c != join_key][0], name
        )
        # aux is variants-sized in the worst case — size-guarded hint
        v = v.drop(name).join(maybe_broadcast(aux), join_key, "left")
    else:
        v = v.withColumn(name, col_or_df)
    return SeqDataset(v, ds._base_calls, ds._base_samples, ploidy=ds.ploidy,
                      meta=ds.meta)


#: varnm -> variants-frame column for the reference's core-node paths
_CORE_VARIANT_NODES = {
    "variant.id": "variant_id",
    "position": "position",
    "chromosome": "chromosome",
    "allele": None,  # handled specially: "REF,ALT1,..." splits into ref/alt
    "annotation/id": "id",
    "annotation/qual": "qual",
    "annotation/filter": "filter",
}


def add_value(ds: SeqDataset, varnm: str, val, replace: bool = False) -> SeqDataset:
    """The reference's node-path dispatch form of seqAddValue
    (R/AddValue.R:520-591): ``varnm`` addresses the same GDS node paths —
    core variant nodes (variant.id/position/chromosome/allele,
    annotation/id|qual|filter), ``annotation/info/<NAME>`` (a field inside
    the info struct), and ``sample.annotation/<NAME>`` / ``sample.id``.

    ``val`` is a Column expression, or a keyed DataFrame
    ((variant_id, value) / (sample_id, value)) for the reference's
    'length == #variants/#samples' vector path (broadcast-joined).
    Adding an existing node without ``replace=True`` errors, matching the
    reference's replace guard (R/AddValue.R:56-66)."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias clarity)

    if varnm in _CORE_VARIANT_NODES:
        if not replace:
            raise ValueError(f"'{varnm}' exists; pass replace=True (reference guard)")
        if varnm == "variant.id" and isinstance(val, DataFrame):
            # id replacement by (old id -> new id) mapping — the DataFrame
            # analogue of the reference's positional vector form. The
            # reference's genotype planes are positional so re-labeling
            # variant.id keeps them aligned for free (.r_variant_id,
            # R/AddValue.R); the long-format analogue remaps calls too.
            from seqarray_spark.plans.hints import maybe_broadcast

            aux = val.withColumnRenamed(
                [c for c in val.columns if c != "variant_id"][0], "__newid"
            )

            def _remap(df):
                return (
                    df.join(maybe_broadcast(aux), "variant_id", "left")
                    .withColumn("variant_id", F.coalesce("__newid", "variant_id"))
                    .drop("__newid")
                )

            c = ds._base_calls
            return SeqDataset(
                _remap(ds._base_variants),
                _remap(c) if c is not None else None,
                ds._base_samples,
                ploidy=ds.ploidy,
                meta=ds.meta,
            )
        if varnm == "allele":
            # reference stores "REF,ALT1,ALT2"; split back into ref/alt
            v = ds._base_variants
            if isinstance(val, DataFrame):
                aux = val.withColumnRenamed(
                    [c for c in val.columns if c != "variant_id"][0], "__allele"
                )
                from seqarray_spark.plans.hints import maybe_broadcast

                v = v.join(maybe_broadcast(aux), "variant_id", "left")
                src = F.col("__allele")
            else:
                src = val
            parts = F.split(src, ",")
            v = (
                v.withColumn("ref", parts[0])
                .withColumn("alt", F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))))
                .drop("__allele")
            )
            return SeqDataset(v, ds._base_calls, ds._base_samples,
                              ploidy=ds.ploidy, meta=ds.meta)
        return add_variant_value(ds, _CORE_VARIANT_NODES[varnm], val)
    if varnm.startswith("annotation/info/"):
        name = varnm[len("annotation/info/"):]
        if not name:
            raise ValueError("Invalid 'varnm'.")
        v = ds._base_variants
        have = (
            "info" in v.columns
            and name in [f.name for f in v.schema["info"].dataType.fields]
        )
        if have and not replace:
            raise ValueError(f"info/{name} exists; pass replace=True")
        if isinstance(val, DataFrame):
            from seqarray_spark.plans.hints import maybe_broadcast

            aux = val.withColumnRenamed(
                [c for c in val.columns if c != "variant_id"][0], "__v"
            )
            v = v.join(maybe_broadcast(aux), "variant_id", "left")
            new = F.col("__v")
        else:
            new = val
        keep = (
            [f.name for f in v.schema["info"].dataType.fields if f.name != name]
            if "info" in v.columns
            else []
        )
        v = v.withColumn(
            "info",
            F.struct(*[F.col(f"info.{n}").alias(n) for n in keep], new.alias(name)),
        ).drop("__v")
        return SeqDataset(v, ds._base_calls, ds._base_samples,
                          ploidy=ds.ploidy, meta=ds.meta)
    if varnm == "sample.id":
        if not replace:
            raise ValueError("'sample.id' exists; pass replace=True")
        if isinstance(val, DataFrame):
            # (old sample_id -> new sample_id) mapping, remapped through
            # samples AND calls (see the variant.id note above)
            aux = val.withColumnRenamed(
                [c for c in val.columns if c != "sample_id"][0], "__newid"
            )

            def _remap_s(df):
                return (
                    df.join(F.broadcast(aux), "sample_id", "left")
                    .withColumn("sample_id", F.coalesce("__newid", "sample_id"))
                    .drop("__newid")
                )

            c = ds._base_calls
            return SeqDataset(
                ds._base_variants,
                _remap_s(c) if c is not None else None,
                _remap_s(ds._base_samples) if ds._base_samples is not None else None,
                ploidy=ds.ploidy,
                meta=ds.meta,
            )
        return add_sample_value(ds, "sample_id", val)
    if varnm == "sample.annotation" or varnm.startswith("sample.annotation/"):
        name = varnm[len("sample.annotation/"):] or None
        if name is None:
            raise ValueError("pass sample.annotation/<name>")
        s = ds._base_samples
        if s is not None and name in s.columns and not replace:
            raise ValueError(f"sample.annotation/{name} exists; pass replace=True")
        return add_sample_value(ds, name, val)
    raise ValueError("Invalid `varnm`.")


def add_sample_value(ds: SeqDataset, name: str, col_or_df) -> SeqDataset:
    """Per-sample annotation add (reference: seqAddValue
    'sample.annotation/<name>' path)."""
    s = ds._base_samples
    if s is None:
        raise ValueError("dataset has no samples table")
    if isinstance(col_or_df, DataFrame):
        aux = col_or_df.withColumnRenamed(
            [c for c in col_or_df.columns if c != "sample_id"][0], name
        )
        s = s.drop(name).join(F.broadcast(aux), "sample_id", "left")
    else:
        s = s.withColumn(name, col_or_df)
    return SeqDataset(ds._base_variants, ds._base_calls, s, ploidy=ds.ploidy,
                      meta=ds.meta)


def delete_vars(
    ds: SeqDataset,
    info_vars: list[str] | None = None,
    fmt_vars: list[str] | None = None,
    samp_vars: list[str] | None = None,
) -> SeqDataset:
    """Drop INFO / FORMAT / sample-annotation variables (reference:
    seqDelete R/Utilities.R:1176-1227)."""
    v, c, s = ds._base_variants, ds._base_calls, ds._base_samples
    if info_vars:
        if "info" in v.columns:
            keep = [
                f.name
                for f in v.schema["info"].dataType.fields
                if f.name not in set(info_vars)
            ]
            v = v.withColumn(
                "info", F.struct(*[F.col(f"info.{n}").alias(n) for n in keep])
            )
        v = v.drop(*[x for x in info_vars if x in v.columns])
    if fmt_vars and c is not None:
        c = c.drop(*[x for x in fmt_vars if x in c.columns])
    if samp_vars and s is not None:
        s = s.drop(*[x for x in samp_vars if x in s.columns])
    return SeqDataset(v, c, s, ploidy=ds.ploidy, meta=ds.meta)


def recompress(
    spark: SparkSession, path: str, out_path: str, codec: str = "zstd"
) -> None:
    """Re-encode a stored dataset with another codec (reference:
    seqRecompress R/UtilsExport.R:357-463). Parquet handles per-column
    encodings; only the file codec is a choice."""
    import os

    for sub in ("variants.parquet", "calls.parquet", "samples.parquet"):
        src = f"{path}/{sub}"
        if os.path.isdir(src):
            (
                spark.read.parquet(src)
                .write.mode("overwrite")
                .option("compression", codec)
                .parquet(f"{out_path}/{sub}")
            )


def recompress_gds(
    spark: SparkSession, src: str, dst: str, coder: str = "LZMA_ra", **kwargs
) -> None:
    """Re-encode a .gds CONTAINER with another storage coder — the
    reference's primary seqRecompress use (R/UtilsExport.R:357-463:
    rewrite every node's stream under a new compression setting).
    Distributed end to end: from_gds block-decodes (broadcast metadata +
    frame-level random access), to_gds re-encodes executor-side into the
    requested coder's random-access frames ('LZMA_ra', 'ZIP_ra', with
    .fast/.def/.max levels, or ''/None for raw)."""
    from seqarray_spark.sources.gds_spark import from_gds

    from_gds(spark, src).to_gds(dst, coder=coder, **kwargs)


def transpose_sample_major(ds: SeqDataset, out_path: str | None = None) -> DataFrame:
    """Sample-major calls layout (reference: seqTranspose/seqOptimize
    'by.sample' — the on-disk '~data' duplicate, R/Utilities.R:1235-1323).
    In Spark this is a repartition+sort, optionally persisted as a second
    dataset for hot per-sample scan paths."""
    c = ds._base_calls
    out = c.repartition("sample_id").sortWithinPartitions("sample_id", "variant_id")
    if out_path:
        out.write.mode("overwrite").parquet(out_path)
    return out


def optimize_by_chromosome(ds: SeqDataset, out_dir: str) -> None:
    """Chromosome-partitioned, position-sorted layout (reference:
    seqOptimize 'chromosome' target + the RLE chrom index,
    R/Utilities.R:1351-1429). This is what makes set_filter_chrom pure
    partition pruning + row-group skipping."""
    (
        ds._base_variants.repartition("chromosome")
        .sortWithinPartitions("position")
        .write.mode("overwrite")
        .partitionBy("chromosome")
        .parquet(f"{out_dir}/variants.parquet")
    )
    if ds._base_calls is not None:
        ds._base_calls.write.mode("overwrite").parquet(f"{out_dir}/calls.parquet")
    if ds._base_samples is not None:
        ds._base_samples.write.mode("overwrite").parquet(f"{out_dir}/samples.parquet")


def optimize_bucketed(
    ds: SeqDataset, database_table_prefix: str, n_buckets: int = 64
) -> None:
    """Bucketed layout for shuffle-free variant-keyed joins: calls and
    variants both bucketed+sorted by variant_id via saveAsTable. A later
    calls⋈variants join then co-locates without ANY Exchange — at 100 TB
    this converts the biggest recurring shuffle (fact⋈dim on variant_id)
    into a map-side zip. This is the engine's analogue of the reference's
    file-order locality (SURVEY §2.8: data kept sorted and relied upon).

    n_buckets sizing: target ~(total calls bytes / n_buckets) ≈ 1-2 GB
    per bucket at full scale; 64 suits the local harness.
    """
    (
        ds._base_calls.write.mode("overwrite")
        .bucketBy(n_buckets, "variant_id")
        .sortBy("variant_id")
        .saveAsTable(f"{database_table_prefix}_calls")
    )
    (
        ds._base_variants.write.mode("overwrite")
        .bucketBy(n_buckets, "variant_id")
        .sortBy("variant_id")
        .saveAsTable(f"{database_table_prefix}_variants")
    )


def empty_dataset(spark: SparkSession, ploidy: int = 2) -> SeqDataset:
    """Minimal valid empty dataset (reference: seqEmptyFile
    R/Conversion.R:1453+)."""
    v = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("variant_id", T.LongType()),
                T.StructField("chromosome", T.StringType()),
                T.StructField("position", T.IntegerType()),
                T.StructField("id", T.StringType()),
                T.StructField("ref", T.StringType()),
                T.StructField("alt", T.ArrayType(T.StringType())),
                T.StructField("qual", T.DoubleType()),
                T.StructField("filter", T.StringType()),
            ]
        ),
    )
    c = spark.createDataFrame(
        [],
        "variant_id long, sample_id string, alleles array<smallint>, phased array<boolean>",
    )
    s = spark.createDataFrame([], "sample_id string")
    return SeqDataset(v, c, s, ploidy=ploidy)


def system_info(spark: SparkSession) -> dict:
    """Runtime capability report (reference: seqSystem R/Summary.R:826-833
    — SIMD flags become Spark/JVM/conf facts)."""
    sc = spark.sparkContext
    return {
        "spark_version": spark.version,
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe_enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "arrow_enabled": spark.conf.get("spark.sql.execution.arrow.pyspark.enabled"),
        "ansi_mode": spark.conf.get("spark.sql.ansi.enabled", "true"),
    }
