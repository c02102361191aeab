"""Ragged-value helpers (reference: seqNewVarData / seqListVarData,
R/Methods.R:526-575; SEQ_ListVarData src/GetData.cpp:1732; the '.padNA' /
'.tolist' output modes of seqGetData, src/GetData.cpp:940-1061).

The reference encodes variable-length values as (length-vector, flattened
data). In Spark the native encoding is ArrayType; these helpers convert
between the two and reproduce the padding/listing read modes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pad_na(col: str | Column, length: int = 1) -> Column:
    """Raw fixed-length pad/truncate primitive (length=1 returns the
    scalar-ified column). NOTE: the reference's seqGetData(.padNA=TRUE)
    NEVER truncates — it flattens only fields whose file-wide max length
    is 1 and leaves longer (e.g. Number=G mixed-ploidy) fields in list
    form untouched (src/GetData.cpp:984-1037). That contract lives in
    SeqDataset.get_data(pad_na=True); this helper is the explicit-length
    building block for callers who KNOW the arity they want."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(
        F.coalesce(c, F.array()),
        F.array_repeat(F.lit(None), F.greatest(F.lit(length) - F.size(F.coalesce(c, F.array())), F.lit(0))),
    )
    out = F.slice(padded, 1, length)
    return F.element_at(out, 1) if length == 1 else out


def to_lengths_data(df: DataFrame, col: str, key: str = "variant_id"):
    """ArrayType column -> the reference's (length, data) pair: a lengths
    frame and a flattened data frame in key order (seqNewVarData's inverse)."""
    lengths = df.select(key, F.coalesce(F.size(col), F.lit(0)).alias("length"))
    data = df.select(key, F.explode(col).alias("value"))
    return lengths, data


def from_lengths_data(
    lengths: DataFrame, data: DataFrame, key: str = "variant_id", col: str = "value"
) -> DataFrame:
    """(length, data) -> ArrayType column (seqNewVarData parity): zero
    lengths become empty arrays, not NULLs."""
    packed = data.groupBy(key).agg(F.collect_list(col).alias("values"))
    return lengths.join(packed, key, "left").select(
        key,
        F.when(F.col("length") == 0, F.array()).otherwise(F.col("values")).alias("values"),
    )
