"""Adapters from the driver's TPC-H-ish testdata to the engine's
variant-call data model.

The driver's correctness gate compares each Spark query against a DuckDB
oracle over the same parquet tables (TESTDATA.md). The genomic tables the
engine natively consumes (variants/calls/samples) are therefore *derived
deterministically* from `part` / `lineitem` / `supplier` with SQL that both
Spark SQL and DuckDB execute identically; the engine operators then run on
the derived frames, and each oracle replays derivation + operator math in
pure SQL.

Derivation sketch (seeded entirely by table keys, no randomness):
  gvariants <- part      (variant_id=p_partkey; chrom/pos/ref/alt/filter
                          are arithmetic on p_partkey)
  gcalls    <- lineitem  (variant_id=l_partkey, sample_id from l_suppkey;
                          two allele slots from l_linenumber/l_quantity;
                          missingness from l_discount thresholds so the
                          partial-missing path is exercised)
  gsamples  <- supplier-ish (distinct sample ids + a deterministic pheno)
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-session cache of (logical) DataFrames keyed by (kind, sf_dir, name).
# DataFrames are immutable plans, so reuse is safe; what this saves is the
# per-construction driver work — parquet file listing + footer schema read
# + temp-view registration + SQL parse — a fixed ~0.5s that otherwise
# repeats in EVERY registry query touching the derived genomic frames
# (the registry-size dilution mechanism from the r8 bench decomposition).
# WeakKey so a stopped session's entries drop with it.
_df_cache: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _session_cache(spark: SparkSession) -> dict:
    try:
        d = _df_cache.get(spark)
        if d is None:
            d = {}
            _df_cache[spark] = d
        return d
    except TypeError:  # non-weakrefable session stand-in (mocks)
        return {}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs this engine depends on, set defensively so queries
    work under ANY caller-provided session (the driver harness builds its
    own), not just session.get_spark():
    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which Spark
      otherwise refuses to read;
    - UTC session timezone: timestamp values must align with the
      (tz-naive) DuckDB oracle."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # static-conf lockdown; session.get_spark() already set them


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cache = _session_cache(spark)
    key = ("table", sf_dir, name)
    if key in cache:
        return cache[key]
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong read: int64 nanos -> TIMESTAMP
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    cache[key] = df
    return df


def register_testdata(spark: SparkSession, sf_dir: str, tables=None) -> None:
    """Register the testdata parquet files as temp views (idempotent)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Dialect-common derivation SQL (runs identically under Spark SQL and DuckDB).
# Alleles are kept as scalar slots a1/a2 here because array syntax diverges
# between the dialects; the Spark-side adapter assembles ARRAY<INT> alleles.
# ---------------------------------------------------------------------------

GVARIANTS_SQL = """
SELECT
  p_partkey                                   AS variant_id,
  CAST(1 + p_partkey % 22 AS STRING)          AS chromosome,
  CAST(1 + (p_partkey * 37) % 1000000 AS INT) AS position,
  CASE WHEN p_partkey % 7 = 0
       THEN CONCAT('rs', CAST(p_partkey AS STRING)) END AS id,
  SUBSTRING('ACGT', CAST(p_partkey % 4 AS INT) + 1, 1)  AS ref,
  CASE
    WHEN p_partkey % 15 = 0 THEN
      CONCAT(SUBSTRING('ACGTACGT', CAST(p_partkey % 4 AS INT) + 2, 1), ',',
             SUBSTRING('ACGTACGT', CAST(p_partkey % 4 AS INT) + 3, 1), ',',
             SUBSTRING('ACGTACGT', CAST(p_partkey % 4 AS INT) + 4, 1))
    WHEN p_partkey % 5 = 0 THEN
      CONCAT(SUBSTRING('ACGTACGT', CAST(p_partkey % 4 AS INT) + 2, 1), ',',
             SUBSTRING('ACGTACGT', CAST(p_partkey % 4 AS INT) + 3, 1))
    ELSE SUBSTRING('ACGTACGT', CAST(p_partkey % 4 AS INT) + 2, 1)
  END                                         AS alt_str,
  CAST(CAST(p_partkey % 1000 AS DOUBLE) / 10.0 AS DOUBLE) AS qual,
  CASE WHEN p_partkey % 10 < 8 THEN 'PASS' ELSE 'q10' END AS filter
FROM part
"""

GCALLS_SQL = """
SELECT
  l_partkey                                        AS variant_id,
  CONCAT('S', CAST(l_suppkey % 100 AS STRING))     AS sample_id,
  CASE WHEN l_discount > 0.09 THEN NULL
       ELSE CAST(l_linenumber % 2 AS INT) END      AS a1,
  CASE WHEN l_discount > 0.07 THEN NULL
       ELSE CAST(CAST(l_quantity AS INT) % 3 AS INT) END AS a2,
  (l_orderkey % 4 = 0)                             AS is_phased
FROM lineitem
"""

GSAMPLES_SQL = """
SELECT DISTINCT
  CONCAT('S', CAST(l_suppkey % 100 AS STRING)) AS sample_id,
  CASE WHEN l_suppkey % 100 < 50 THEN 'POP1' ELSE 'POP2' END AS population
FROM lineitem
"""


def oracle_prelude() -> str:
    """CTE prefix for oracle SQL strings: WITH gvariants AS (...), ..."""
    return (
        "WITH gvariants AS ("
        + GVARIANTS_SQL
        + "), gcalls AS ("
        + GCALLS_SQL
        + "), gsamples AS ("
        + GSAMPLES_SQL
        + ")"
    )


def gvariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived variants frame with a real ARRAY<STRING> alt column."""
    cache = _session_cache(spark)
    key = ("gvariants", sf_dir)
    if key not in cache:
        register_testdata(spark, sf_dir, ["part"])
        cache[key] = spark.sql(GVARIANTS_SQL).withColumn(
            "alt", F.split("alt_str", ",")
        )
    return cache[key]


def gcalls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived calls frame with ARRAY<INT> alleles / ARRAY<BOOLEAN> phased."""
    cache = _session_cache(spark)
    key = ("gcalls", sf_dir)
    if key not in cache:
        register_testdata(spark, sf_dir, ["lineitem"])
        df = spark.sql(GCALLS_SQL)
        out = df.select(
            "variant_id",
            "sample_id",
            F.array("a1", "a2").alias("alleles"),
            # engine invariant: len(phased) == len(alleles) - 1 (one
            # separator per allele boundary — what vcf/plink/gds sources
            # produce and seq_check/write paths expect)
            F.array("is_phased").alias("phased"),
        )
        cache[key] = out
    return cache[key]


def gsample_ids_superset(sf_dir: str) -> list[str] | None:
    """Sample-inventory SUPERSET from the supplier DIMENSION table —
    the ids a superset-tolerant ordinal space needs (the bitset-plane
    LD substrate), without the full facts-scan distinct+collect the
    operators otherwise run per query. gcalls derives sample_id as
    CONCAT('S', l_suppkey % 100) and l_suppkey is a foreign key into
    supplier, so {CONCAT('S', s_suppkey % 100)} ⊇ the observed ids.
    Driver-side pyarrow read of the one small dimension column (the
    n_variants_hint precedent); None when the file is unreadable —
    callers fall back to the operator's own probe."""
    try:
        import pyarrow.parquet as pq

        col = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
        ).column(0)
        return sorted({f"S{int(k) % 100}" for k in col.to_pylist()})
    except Exception:
        return None


def gsamples(spark: SparkSession, sf_dir: str) -> DataFrame:
    cache = _session_cache(spark)
    key = ("gsamples", sf_dir)
    if key not in cache:
        register_testdata(spark, sf_dir, ["lineitem"])
        cache[key] = spark.sql(GSAMPLES_SQL)
    return cache[key]


def variant_dataset(spark: SparkSession, sf_dir: str):
    """Full SeqDataset view over the derived tables."""
    from seqarray_spark.dataset import SeqDataset

    # variant count == part row count, free from the parquet footer (no
    # Spark job); lets $chromosome's RLE skip its size probe entirely
    n_variants = None
    try:
        import pyarrow.parquet as pq

        n_variants = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    except Exception:
        pass
    return SeqDataset(
        gvariants(spark, sf_dir), gcalls(spark, sf_dir), gsamples(spark, sf_dir),
        # p_partkey is a gapless 1..N sequence — file-order ids
        ids_dense=True,
        n_variants_hint=n_variants,
    )
