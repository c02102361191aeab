"""Apply / UDF surface (SURVEY.md §2.6) — the escape hatch for semantics
the declarative operators can't express.

Reference parity:
- seqBlockApply (R/Methods.R:690-769; SEQ_BApply_Variant
  src/GetData.cpp:1486-1730)  -> mapInPandas (Arrow batches ARE the
  reference's 1024-variant blocks)
- seqApply margin='by.sample' (SEQ_Apply_Sample src/ReadBySample.cpp:495)
  -> groupBy(sample_id).applyInPandas — no transposed '~data' copy needed;
  the shuffle regroups by sample
- seqUnitApply (R/UnitList.R:290-443) -> join units + applyInPandas
- seqParallel .combine reducers (R/Utilities.R:1008-1124) -> the Spark
  scheduler + agg; provided here only as a thin reduce helper

Everything is Arrow-batched; no row-at-a-time Python anywhere.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def block_apply(
    df: DataFrame,
    func: Callable,
    schema: str,
    var_index: str = "none",
    base_df: DataFrame | None = None,
) -> DataFrame:
    """Vectorized per-block apply (seqBlockApply parity): `func` receives
    pandas DataFrames of whole rows (an Arrow batch ≙ the reference's
    bsize=1024 variant block; tune via
    spark.sql.execution.arrow.maxRecordsPerBatch) and yields output
    frames matching `schema`.

    var_index (reference: seqBlockApply var.index= R/Methods.R:690-769,
    dispatching SEQ_BApply_Variant src/ReadByVariant.cpp:1284-1316):
    both modes attach a 1-based `variant_index` column —
    - 'relative': position within the CURRENT selection (the
      reference's per-call `ans_index + 1`, here per-row);
    - 'absolute': position within the FULL dataset in file order (the
      reference's `NodeList[0]->Position + 1`, the pre-filter ordinal —
      r9 parity review: this previously only guaranteed variant_id rode
      along, which matches the file ordinal ONLY for dense file-order
      ids). Pass `base_df` = the UNFILTERED variants/calls frame;
      without it `df` is assumed unfiltered (the two modes then agree,
      like the reference with no filter active).
    Global row_number is single-partition; acceptable because the index
    frame is id+ordinal only (same caveat as $variant_index)."""
    if var_index not in ("none", "absolute", "relative"):
        raise ValueError("var_index must be none|absolute|relative")
    if var_index != "none" and "variant_id" not in df.columns:
        raise ValueError("var_index requires a variant_id column")
    if var_index == "relative":
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        df = df.withColumn(
            "variant_index", F.row_number().over(Window.orderBy("variant_id"))
        )
    elif var_index == "absolute":
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        base = base_df if base_df is not None else df
        idx = (
            base.select("variant_id")
            .distinct()
            .select(
                "variant_id",
                F.row_number()
                .over(Window.orderBy("variant_id"))
                .alias("variant_index"),
            )
        )
        df = df.join(idx, "variant_id", "left")

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = func(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(gen, schema=schema)


def block_apply_to(
    df: DataFrame,
    func: Callable,
    schema: str,
    path: str,
    output_format: str = "parquet",
    mode: str = "append",
    var_index: str = "none",
) -> None:
    """seqApply(as.is=<connection>/<gdsn>) parity: stream the apply's
    results straight to a sink instead of returning them — the
    reference appends each block's result to an open connection or GDS
    node (src/ReadByVariant.cpp:1177-1287); here every task writes its
    partition directly to the target, so results never gather on any
    single node."""
    out = block_apply(df, func, schema, var_index=var_index)
    out.write.mode(mode).format(output_format).save(path)


def apply_by_sample(
    calls: DataFrame,
    func: Callable,
    schema: str,
    var_index: str = "none",
    sample_order: list[str] | None = None,
    base_sample_order: list[str] | None = None,
) -> DataFrame:
    """Per-sample grouped apply (seqApply margin='by.sample' parity):
    `func(pdf)` gets one sample's calls as a pandas DataFrame. The
    reference needed a transposed on-disk copy (seqOptimize '~data',
    R/Utilities.R:1235-1323) to make this fast; in Spark the shuffle *is*
    the transpose.

    var_index (reference SEQ_Apply_Sample src/ReadBySample.cpp:612-645,
    the by-sample twin of block_apply's variant modes): attaches a
    1-based `sample_index` column to each group —
    - 'relative': position within the CURRENT sample selection
      (`ans_index + 1`), order given by `sample_order` (the dataset's
      ordered selected ids, e.g. dataset.ordered_sample_ids);
    - 'absolute': position within the PRE-filter file order
      (`NodeList.begin()->Position + 1`) via `base_sample_order` (the
      unfiltered samples frame's order; defaults to `sample_order`,
      the two modes agreeing exactly when no filter is active, like
      the reference).
    The index rides as a column rather than a separate FUN argument —
    the pandas-native rendering of the reference's prepended R_Index."""
    if var_index not in ("none", "relative", "absolute"):
        raise ValueError("var_index must be none|relative|absolute")
    if var_index != "none":
        if sample_order is None:
            raise ValueError(
                "var_index needs sample_order (the selection's ordered "
                "sample ids)"
            )
        if var_index == "relative" or base_sample_order is None:
            # falsiness would silently turn an explicitly-passed empty
            # base order into relative indexes — only None falls back
            order = sample_order
        else:
            order = base_sample_order
        from pyspark.sql import functions as F

        spark = calls.sparkSession
        idx = F.broadcast(
            spark.createDataFrame(
                [(s, i + 1) for i, s in enumerate(order)],
                "sample_id string, sample_index int",
            )
        )
        # fail fast (with the sample named) on a call whose sample is
        # absent from the supplied order — a stale/incomplete list
        # would otherwise surface as a NULL index inside the kernel
        calls = calls.join(idx, "sample_id", "left").withColumn(
            "sample_index",
            F.when(
                F.col("sample_index").isNotNull(), F.col("sample_index")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("sample not in sample_order: "),
                        F.col("sample_id"),
                    )
                )
            ),
        )
    return calls.groupBy("sample_id").applyInPandas(func, schema=schema)


def apply_by_variant_group(
    calls: DataFrame,
    func: Callable,
    schema: str,
) -> DataFrame:
    """Per-variant grouped apply for kernels that need the full call
    vector of one variant at a time (seqApply margin='by.variant' with an
    R closure). Prefer the declarative aggregates when expressible."""
    return calls.groupBy("variant_id").applyInPandas(func, schema=schema)


def unit_apply(
    units: DataFrame,
    calls: DataFrame,
    func: Callable,
    schema: str,
) -> DataFrame:
    """Per-window-unit apply (seqUnitApply parity): join membership with
    calls, group by window, hand each window's member calls to `func`."""
    joined = units.join(calls, "variant_id")
    return joined.groupBy("chromosome", "unit_start").applyInPandas(func, schema=schema)


def par_reduce(df: DataFrame, *aggs) -> list:
    """seqParallel(.combine=...) parity: partial aggregation per partition
    + final combine is exactly Spark's agg; returns the single combined row."""
    return df.agg(*aggs).first()
