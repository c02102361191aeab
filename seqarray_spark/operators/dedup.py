"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the whole point of these):
- exact: one groupBy on a 128-bit content hash — the only full shuffle,
  and it is on pre-hashed fixed-width keys.
- MinHash+LSH: per-doc signature is a narrow map-side expression; the
  candidate join is an equi-join on band keys (only docs sharing a band
  collide), so the quadratic all-pairs never materializes. Exact Jaccard
  verification runs only on candidates.
- n-gram Jaccard: exact but intersection-driven — explode distinct
  shingles, self-join on shingle, count per pair; pairs with zero overlap
  never appear. For 100 TB use minhash_dup_pairs and verify=True instead.
- SimHash: 64-bit majority sketch from md5 nibbles (hex-string encoded);
  candidates from 4x16-bit band equi-joins, Hamming verification — exact
  recall for distance <= 3 by pigeonhole.
- embedding cosine: normalized dot via zip_with/aggregate; all-pairs form
  for small N, LSH-bucketed form (random-hyperplane signs) for scale.

MinHash permutations are simulated as min(md5(seed || shingle)) — engine-
portable (md5 is standardized) and deterministic, so results are
reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seqarray_spark.operators.text import spread as _spread
from seqarray_spark.operators.text import tokens, word_shingles


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: keeper = min id per md5(text)."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_md5")).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return docs with duplicates removed (keeper = min id)."""
    keepers = exact_dup_groups(docs, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return docs.join(keepers, id_col, "left_semi")


def write_corpus_hash_index(
    docs: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Persist the corpus EXACT-dedup index — (content_md5, doc_id) for
    the corpus's kept docs — bucketed+sorted by content_md5, one file
    per bucket (same layout contract as write_corpus_band_index): the
    per-batch exact-dup probe then joins with zero Exchange and zero
    Sort on the corpus side. At 10^10 docs this is two narrow columns;
    the batch pays the only shuffle."""
    (
        docs.select(
            F.md5(F.col(text_col)).alias("content_md5"),
            F.col(id_col).alias("corpus_id"),
        )
        .repartition(n_buckets, "content_md5")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "content_md5")
        .sortBy("content_md5")
        .saveAsTable(table)
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-dedup an ingest BATCH against a stored corpus hash index
    (the exact-hash sibling of incremental_dup_pairs): keeps each new
    doc only if its content hash is absent from the corpus AND it is
    the min-id representative within the batch. Precedence is
    CORPUS-FIRST — an already-ingested doc wins over any batch doc with
    the same hash regardless of id (the corpus is immutable at ingest
    time), so with monotonically growing ids this equals re-running
    exact_dedup over corpus+batch and taking the batch-side keepers;
    with id inversions the corpus copy still wins where a full re-run
    would have preferred the smaller batch id (pytest-pinned).

    Plan shape: the batch hashes + one left_anti join against the index
    (bucket-aligned and shuffle-free on the corpus side when the index
    came from write_corpus_hash_index) + one batch-internal groupBy.
    Per-batch cost scales with the batch."""
    hashed = new_docs.withColumn("content_md5", F.md5(F.col(text_col)))
    batch_keepers = hashed.groupBy("content_md5").agg(
        F.min(id_col).alias(id_col)
    )
    return (
        hashed.join(batch_keepers, ["content_md5", id_col], "left_semi")
        .join(
            corpus_index.select("content_md5"), "content_md5", "left_anti"
        )
        .drop("content_md5")
    )


def recover_bucketed_index(spark, table: str) -> None:
    """Heal an interrupted compact_bucketed_index swap (r10 review, the
    bucketed-table twin of similarity.recover_pq_codes_index): a crash
    between the DROP TABLE and the RENAME leaves no live index table
    but a COMPLETE staged copy — a restarted ingest loop's
    tableExists() check would then re-bootstrap an index holding only
    the replayed batch, silently forgetting the corpus. Idempotent and
    catalog-only: if the table exists nothing happens; if it is missing
    and the staged copy exists, the stage is renamed into place
    (saveAsTable finished before the swap began, so the stage is always
    complete). Called by compact itself and by every ingest loop before
    its existence check."""
    stage = f"{table}__compacting"
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(
        stage
    ):
        spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")


def compact_bucketed_index(spark, table: str) -> None:
    """Restore a streamed-into bucketed index (corpus hash index or
    band-key index) to ONE file per bucket.

    The ingest loops append one file per bucket per micro-batch; Spark
    only trusts (and reuses) a bucket's stored sort when the bucket is
    a single file, so after N batches every batch join re-sorts the
    whole corpus side — exactly the per-batch corpus-scale cost the
    bucketed layout exists to avoid. Run this periodically (e.g. every
    K batches or nightly): it reads the table's own bucket spec from
    the catalog, rewrites through the same repartition-by-bucket-hash
    recipe as the original writers, and swaps via a staging table +
    RENAME — so a crash mid-compaction leaves either the old table or
    a complete staged copy, never a half-written index. Not atomic
    against concurrent readers; run it from the ingest loop's driver
    between batches (foreachBatch is serial per query). Crash states
    are healed by recover_bucketed_index (run here and by the ingest
    loops before their existence checks)."""
    recover_bucketed_index(spark, table)
    rows = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    n_buckets = int(rows["Num Buckets"])
    def _cols(spec: str) -> list[str]:
        return [c.strip(" `") for c in spec.strip("[]").split(",")]
    bucket_cols = _cols(rows["Bucket Columns"])
    sort_cols = _cols(rows["Sort Columns"]) if rows.get("Sort Columns") else bucket_cols
    stage = f"{table}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    # FORCE the bucketed scan for the rewrite: Catalyst elides the
    # repartition (the catalog bucket spec already satisfies its
    # distribution) while the auto-bucketed-scan rule simultaneously
    # decides the query "doesn't benefit" and reads plain files — net
    # effect, NO exchange AND per-file partitions, so two tasks can
    # hold the same bucket's rows and each writes its own bucket file
    # (observed: 16 files stayed 16). Pinning autoBucketedScan off
    # forces one-partition-per-bucket reads, making the elision
    # correct: task == bucket == one output file.
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto)
    spark.conf.set(auto, "false")
    try:
        (
            spark.table(table)
            .repartition(n_buckets, *bucket_cols)
            .write.mode("overwrite")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*sort_cols)
            .saveAsTable(stage)
        )
    finally:
        spark.conf.set(auto, prev)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_signatures(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """Long-form signature build -> (_id, h0..h{n-1}). Two structural
    facts drive this shape:
    (1) Spark does NOT subexpression-eliminate lambda-bearing
        expressions, so any array-expression formulation recomputes the
        md5 transform per reuse (measured 10-20x slower);
    (2) md5 yields 128 bits — four independent 32-bit minhash lanes per
        digest — so num_hashes hashes need only num_hashes/4 md5 passes.
    One explode + ONE groupBy (all mins as filtered aggregates) = one
    shuffle of |shingles| * num_hashes/4 narrow rows."""
    if num_hashes % 4:
        raise ValueError("num_hashes must be a multiple of 4")
    docs = _spread(docs)
    sh_long = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("s"),
    )
    n_md5 = num_hashes // 4
    # the n_md5 digests ride as COLUMNS of the single shingle explode —
    # same shuffle bytes as a second explode but 1/4 the rows and plain
    # min aggregates instead of filtered ones
    hashed = sh_long.select(
        "_id",
        *[
            F.md5(F.concat(F.lit(f"{b}:"), F.col("s"))).alias(f"d{b}")
            for b in range(n_md5)
        ],
    )
    sig_cols = [
        F.min(F.substring(f"d{j // 4}", (j % 4) * 8 + 1, 8)).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return hashed.groupBy("_id").agg(*sig_cols)


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    attach: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature: element j = min over shingles of 32-bit
    lane j%4 of md5(j//4:shingle). Adds `mh_sig ARRAY<STRING>[num_hashes]`
    (NULL for docs with no shingles). Same long-form build as
    minhash_dup_pairs — one explode + one groupBy.

    ``attach=False`` returns just (id_col, mh_sig) straight off the
    signature agg — no join back onto `docs` (r14 opt, guide §2.4: the
    join exists only to carry the OTHER doc columns; a consumer that
    immediately projects (id, mh_sig) paid a second docs scan + a join
    for nothing). Docs with zero shingles produce no row in this form
    (vs a NULL mh_sig row when attached)."""
    sigs = _minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    arr = sigs.select(
        "_id", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("mh_sig")
    )
    if not attach:
        return arr.select(F.col("_id").alias(id_col), "mh_sig")
    return docs.join(arr, docs[id_col] == arr["_id"], "left").drop("_id")


def lsh_band_keys(num_hashes: int, bands: int) -> list[Column]:
    """Band keys over a minhash signature column: band b = md5 of its rows
    concatenated. Docs agreeing on ANY band become join candidates."""
    rows = num_hashes // bands
    return [
        F.md5(
            F.concat_ws("|", *[F.col("mh_sig")[b * rows + r] for r in range(rows)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (assumed distinct elements)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(None)
    )


def minhash_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    tau: float | None = 0.7,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, optionally verified
    with exact Jaccard >= tau (tau=None returns raw candidates).

    Plan shape: narrow signature projection -> explode to (band_idx, key)
    -> self equi-join per band key -> distinct pairs -> verify. The join
    key space is ~uniform md5 values, so the shuffle is skew-free.
    """
    rows = num_hashes // bands
    sigs = _minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    band_exprs = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    band_keys = sigs.select("_id", *band_exprs).select(
        "_id",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    # bucket once and expand pairs in-bucket rather than self-joining:
    # a self-join evaluates the whole signature lineage twice (two scans
    # + two shuffles); groupBy is one scan + one shuffle. Pair count per
    # bucket is k^2/2 either way (LSH buckets are near-dup-sized by
    # construction; a degenerate all-identical corpus blows up both
    # formulations equally).
    buckets = (
        band_keys.groupBy("band_idx", "band_key")
        .agg(F.collect_list("_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, a -> "
                    "transform(filter(ids, b -> b > a), "
                    "b -> struct(a AS id_a, b AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    if tau is None:
        return cand
    # exact-Jaccard verification only on candidates. Candidates are a
    # tiny fraction of the corpus by construction, so: materialize the
    # pair list once (localCheckpoint — it is KBs), broadcast-semi-join
    # docs down to candidate ids, and build shingle sets for THOSE docs
    # only — instead of re-tokenizing the full corpus twice (once per
    # join side), which dominated the operator's cost
    cand = cand.localCheckpoint()
    ids = (
        cand.select(F.col("id_a").alias("_id"))
        .union(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    shingle_sets = (
        docs.join(
            F.broadcast(ids), docs[id_col] == ids["_id"], "left_semi"
        )
        .select(
            F.col(id_col).alias("_id"),
            F.array_distinct(word_shingles(text_col, shingle_n)).alias("_sh"),
        )
    )
    return (
        cand.join(shingle_sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(shingle_sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= float(tau))
        .select("id_a", "id_b", "jaccard")
    )


def corpus_band_index(
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Pre-exploded corpus band keys: (band_key, __cid) with the band
    ordinal folded INTO the key ('<b>:<md5>') so the ingest join is
    SINGLE-key — that's what lets a bucketed layout serve it with zero
    Exchange and zero Sort on the corpus side (a two-key join over a
    one-key bucket spec would re-sort every corpus bucket per batch)."""
    rows = num_hashes // bands
    keyed = corpus_sigs.select(
        F.col(id_col).alias("__cid"), *lsh_band_keys(num_hashes, bands)
    )
    return keyed.select(
        "__cid",
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(str(b)), F.col(f"band_{b}"))
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )


def write_corpus_band_index(
    corpus_sigs: DataFrame,
    table: str,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n_buckets: int = 64,
) -> None:
    """Persist the corpus band-key index bucketed+sorted by band_key
    (saveAsTable) — the stored layout incremental ingest dedup joins
    against with NO Exchange on the corpus side (plan-asserted in
    tests/test_plans.py). This is the operator's whole 100 TB claim:
    the corpus is exploded and hashed ONCE at ingest; every later batch
    pays only its own shuffle into the same bucket hash.

    n_buckets sizing: target corpus_band_rows/n_buckets ≈ 1-2 GB per
    bucket at full scale (band rows are two narrow columns; a 10^10-doc
    corpus at 4 bands is 4·10^10 rows ≈ 3 TB -> a few thousand
    buckets). Append new batches' own band keys with
    spark.table(table).writeTo(...).append() or a periodic rewrite."""
    (
        corpus_band_index(corpus_sigs, id_col, num_hashes, bands)
        # ONE file per bucket: Spark only trusts (and re-uses) the
        # stored per-bucket sort when a bucket is a single file —
        # multi-file buckets get re-sorted on every batch join, which
        # is exactly the per-batch corpus-scale cost this layout exists
        # to avoid. repartition uses the same Murmur3 hash as the
        # bucket spec, so each task owns exactly one bucket's rows.
        .repartition(n_buckets, "band_key")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "band_key")
        .sortBy("band_key")
        .saveAsTable(table)
    )


# Measured on this JVM (tools/emb_index_stress.py repro, r10): a
# parquet-pushed In filter compiles to a RECURSIVE OR-chain inside
# parquet-mr, and chains of >=1200 string keys overflow the executor
# stack; 800 is comfortably inside. At or below the session's
# spark.sql.parquet.pushdown.inFilterThreshold Spark pushes the IN
# verbatim (ParquetFilters keeps the chain while
# values.length <= threshold); strictly above it, a min..max RANGE
# (safe, but random hash keys stretch it over the whole keyspace — no
# row-group pruning). So the danger zone is
# SAFE_CAP < len(keys) <= threshold.
PARQUET_IN_CHAIN_SAFE = 800


def scan_safe_in_filter(df: DataFrame, col: Column, keys: list) -> DataFrame:
    """Apply `col IN keys` as a scan filter only when it cannot
    overflow the parquet OR-chain (see PARQUET_IN_CHAIN_SAFE): key
    counts strictly above the session inFilterThreshold push as a safe
    range, small counts push as a shallow chain, and the danger zone
    in between skips the filter — losing row-group pruning but never
    the join's correctness (an inner-join side filter is always
    optional). The range boundary is EXCLUSIVE: at exactly
    n == threshold ParquetFilters still builds the OR chain
    (values.length <= threshold), so n == thr stays in the danger
    zone."""
    n = len(keys)
    try:
        thr = int(
            df.sparkSession.conf.get(
                "spark.sql.parquet.pushdown.inFilterThreshold", "10"
            )
        )
    except Exception:
        thr = 10
    if n <= PARQUET_IN_CHAIN_SAFE or n > thr:
        return df.where(col.isin(keys))
    return df


def incremental_dup_pairs(
    new_docs: DataFrame,
    corpus_sigs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    tau: float | None = 0.7,
    corpus_docs: DataFrame | None = None,
    include_new_pairs: bool = True,
    corpus_band_table: DataFrame | None = None,
    batch_key_pushdown: int | None = 20_000,
) -> DataFrame:
    """Dedup an ingest BATCH against an existing corpus without
    re-hashing the corpus — the 100 TB production ingest pattern: the
    corpus side arrives as its stored `minhash_signature` output
    (`mh_sig` persisted at original ingest), so per-batch cost scales
    with the batch, not the corpus. Only the new docs are shingled;
    banded keys equi-join new→corpus (plus new→new bucket pairs when
    `include_new_pairs`).

    Returns the same (id_a < id_b, jaccard) frame as minhash_dup_pairs
    restricted to pairs touching the batch — identical values to running
    the full-corpus LSH and filtering, because band keys are per-doc
    independent. `tau` verification needs the matched corpus docs' text:
    pass `corpus_docs` (only the candidate ids are re-shingled, via a
    broadcast semi-join) or tau=None for raw candidates.

    At scale, pass `corpus_band_table` = the pre-exploded, bucketed
    band-key index written by write_corpus_band_index (and
    corpus_sigs=None): the per-batch join is then a single-key
    bucket-aligned sort-merge join with NO Exchange and NO Sort on the
    corpus side (plan-asserted in tests/test_plans.py) — only the
    batch's own band keys shuffle into the bucket hash.

    `batch_key_pushdown` (stored-index path only) is the DPP-style scan
    prune: when the batch's distinct band keys number at most the cap,
    they are bounded-collected and applied as an IN filter on the
    corpus index scan BEFORE the join — Spark then prunes whole buckets
    at planning time (SelectedBucketsCount in the scan) and, because
    each bucket file is sorted by band_key, parquet row-group min/max
    stats prune within the surviving files — corpus scan BYTES track
    the batch, not the corpus. An inner-join side can always be
    pre-filtered by the other side's keys, so values are unchanged
    (plan + equivalence tests in tests/test_plans.py). Batches touching
    more keys than the cap fall back to the plain bucket-aligned join —
    a batch that wide touches every bucket anyway. None disables. The
    batch's keyed frame is persist()ed so the minhash pass feeds both
    the key collect and the join once (released via release_on_gc /
    after the candidate checkpoint). Cluster note: raise
    spark.sql.parquet.pushdown.inFilterThreshold above the batch key
    count, else Spark pushes a min..max range that random md5 keys
    stretch over the whole keyspace (no row-group pruning); measured
    regime analysis in SCALE.md r9 + tools/dedup_pushdown_stress.py."""
    from seqarray_spark.plans.lifecycle import release_on_gc

    if tau is not None and corpus_docs is None:
        # validate BEFORE any persist() so the error path cannot leak a
        # pinned batch frame (r9 advice)
        raise ValueError("tau verification needs corpus_docs (or pass tau=None)")
    _pin = None  # persisted batch frame on the pushdown path
    rows = num_hashes // bands
    new_sigs = _minhash_signatures(new_docs, text_col, id_col, num_hashes, shingle_n)
    new_band_exprs = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    new_bands = new_sigs.select("_id", *new_band_exprs).select(
        "_id",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    if corpus_band_table is not None:
        # stored-index path: fold band_idx into the key exactly like
        # corpus_band_index did at write time, then SINGLE-key join —
        # bucket-aligned, so the corpus side neither shuffles nor sorts
        new_keyed = new_bands.select(
            "_id",
            F.concat_ws(
                ":", F.col("band_idx").cast("string"), F.col("band_key")
            ).alias("band_key"),
        )
        if batch_key_pushdown:
            # persist (NOT localCheckpoint: an ExistingRDD's unknown
            # stats made Spark inject a runtime bloom filter whose
            # creation side RE-SCANNED the corpus — the opposite of the
            # point) so the batch minhash pass feeds both the key
            # collect and the join once; unpersisted when the returned
            # frame is garbage-collected (release_on_gc at the returns)
            new_keyed = new_keyed.persist()
            _pin = new_keyed
            keys = [
                r[0]
                for r in new_keyed.select("band_key")
                .distinct()
                .limit(int(batch_key_pushdown) + 1)
                .collect()
            ]
            if len(keys) <= int(batch_key_pushdown):
                corpus_band_table = scan_safe_in_filter(
                    corpus_band_table, F.col("band_key"), keys
                )
        matched = new_keyed.join(corpus_band_table, "band_key")
    else:
        if corpus_sigs is None:
            raise ValueError("need corpus_sigs or corpus_band_table")
        corpus_bands = corpus_sigs.select(
            F.col(id_col).alias("__cid"), *lsh_band_keys(num_hashes, bands)
        ).select(
            "__cid",
            F.posexplode(
                F.array(*[F.col(f"band_{b}") for b in range(bands)])
            ).alias("band_idx", "band_key"),
        )
        matched = new_bands.join(corpus_bands, ["band_idx", "band_key"])
    cand = (
        matched.filter(F.col("_id") != F.col("__cid"))
        .select(
            F.least("_id", "__cid").alias("id_a"),
            F.greatest("_id", "__cid").alias("id_b"),
        )
    )
    if include_new_pairs:
        buckets = (
            new_bands.groupBy("band_idx", "band_key")
            .agg(F.collect_list("_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        new_pairs = (
            buckets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, a -> "
                        "transform(filter(ids, b -> b > a), "
                        "b -> struct(a AS id_a, b AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
        )
        cand = cand.unionByName(new_pairs)
    cand = cand.distinct()
    if tau is None:
        return release_on_gc(_pin, cand) if _pin is not None else cand
    cand = cand.localCheckpoint()
    if _pin is not None:
        # the candidate set is materialized by the checkpoint above, so
        # the persisted batch frame has served both its readers
        _pin.unpersist()
        _pin = None
    ids = (
        cand.select(F.col("id_a").alias("_id"))
        .union(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    texts = new_docs.select(id_col, text_col).unionByName(
        corpus_docs.select(id_col, text_col)
    )
    shingle_sets = texts.join(
        F.broadcast(ids), texts[id_col] == ids["_id"], "left_semi"
    ).select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("_sh"),
    )
    return (
        cand.join(
            shingle_sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")),
            "id_a",
        )
        .join(
            shingle_sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= float(tau))
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, intersection-driven)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    tau: float = 0.5,
) -> DataFrame:
    """Exact all-pairs Jaccard >= tau with prefix filtering (PPJoin-style):
    under any fixed global shingle order, two docs with J >= tau must
    share a shingle within each one's first floor((1-tau)*|d|)+1 shingles.
    The inverted-index self-join therefore runs only on those prefixes
    (ordered rarest-first so prefix postings are the short ones), and the
    exact Jaccard is computed on candidates via array_intersect. Results
    are identical to the naive join at a fraction of the pairs — the
    property that keeps this exact operator alive at corpus scale."""
    docs = _spread(docs)
    sh = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("shingle"),
    ).persist()
    # document frequency via groupBy + join-back, NOT a count window
    # (VERDICT r10): the window shape put EVERY occurrence of a hot
    # shingle ("in the of…" class, Zipfian at corpus scale) into one
    # task with no map-side combine — a guaranteed straggler at 100x.
    # groupBy gets a partial_count before its exchange (the hot key
    # arrives pre-collapsed, one row per upstream partition), and the
    # join-back's skew is AQE-splittable (the dfreq side replicates).
    # The single-evaluation property the window bought (the r10 worry:
    # groupBy + join evaluates the explode lineage twice) is kept by
    # persisting the exploded relation once instead — released
    # deterministically with the candidate set below.
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    with_df = sh.join(dfreq, "shingle")
    # per-doc prefix = the floor((1-tau)*|d|)+1 globally-rarest shingles,
    # carved with one sorted-collect aggregation (a window row_number here
    # costs an extra shuffle + full sort pass); posexplode keeps each
    # prefix shingle's 0-based rank for the positional filter
    prefix = (
        with_df
        .groupBy("_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("df", "shingle"))),
                F.lit(1),
                # +1e-9 before floor: (1-tau)*|d| lands EXACTLY on an
                # integer for boundary sizes (e.g. tau=0.8, |d|=10 ->
                # exact 2.0) but the double 1-0.8 = 0.19999999999999996
                # truncates it to 1, cutting the prefix one short and
                # silently LOSING true boundary pairs (found by the
                # sf0.1 oracle sweep: a J=0.8 pair at tau=0.8 vanished).
                # The epsilon only ever LENGTHENS the prefix — pruning
                # stays exact, marginally looser.
                (
                    F.floor(
                        F.lit(1.0 - float(tau)) * F.count(F.lit(1))
                        + F.lit(1e-9)
                    ).cast("int")
                    + 1
                ),
            ).alias("__prefix"),
            F.count(F.lit(1)).alias("__len"),
        )
        .select("_id", "__len", F.posexplode("__prefix").alias("__pos", "__ps"))
        .select(
            "_id", "__len", "__pos",
            F.col("__ps.df").alias("__df"),
            F.col("__ps.shingle").alias("shingle"),
        )
        # a shingle occurring in ONE doc can never witness a pair —
        # dropping df=1 postings loses no true pair (both docs of a pair
        # contain the shingle, so its df >= 2) and in natural text most
        # shingles are unique, so this empties most of the self-join
        .filter(F.col("__df") >= 2)
        .drop("__df")
    )
    # PPJoin+ candidate pruning on the prefix self-join (exact — no true
    # pair is lost):
    #   length filter: J>=tau forces tau*max(|a|,|b|) <= min(|a|,|b|)
    #   positional filter: at the pair's first shared prefix shingle
    #     (ranks pa, pb) the overlap can't exceed min(|a|-pa, |b|-pb),
    #     which must reach ceil(tau/(1+tau)*(|a|+|b|)); a pair survives
    #     if ANY of its matches passes, and the first match carries the
    #     loosest (valid) bound.
    # posting-list bucketing instead of a prefix self-join: one groupBy
    # of the prefix relation (the self-join would evaluate the whole
    # explode + dfreq-join + sorted-collect lineage TWICE), then pair
    # expansion + PPJoin+ filters inside each shingle's posting list.
    # Postings are short by construction (rarest-first prefixes, df=1
    # dropped), so the in-bucket k^2 is the same candidate count the
    # join produced.
    t = float(tau)
    # Every pruning bound gets a 1e-9 slack in the KEEP direction: at
    # exact boundaries the float products overshoot (0.8*10 =
    # 8.000000000000002 > 8 rejected a true J=0.8 pair on the length
    # filter; ceil of a barely-overshot alpha would do the same on the
    # positional filter). Slack only admits extra candidates — the
    # exact verify step still decides — so the operator stays exact.
    pair_expr = (
        "flatten(transform(ps, a -> transform(filter(ps, b -> "
        "b._id > a._id "
        f"AND least(a.__len, b.__len) >= {t} * greatest(a.__len, b.__len) - 1e-9 "
        "AND least(a.__len - a.__pos, b.__len - b.__pos) >= "
        f"ceil({t} / (1.0 + {t}) * (a.__len + b.__len) - 1e-9)"
        "), b -> struct(a._id AS id_a, b._id AS id_b))))"
    )
    cand = (
        prefix.groupBy("shingle")
        .agg(F.collect_list(F.struct("_id", "__len", "__pos")).alias("ps"))
        .filter(F.size("ps") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        # spread BELOW the distinct (r13 opt, guide §2.5): the
        # distinct's own exchange is tiny so AQE coalesced the cached
        # candidate pairs to ~1 partition and the verify work inherited
        # that single task. Repartitioning on the SAME keys makes the
        # distinct reuse this exchange (count unchanged) while the
        # REPARTITION_BY_NUM origin keeps it un-coalescible; a
        # repartition ABOVE the distinct would be elided as redundant.
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism,
            "id_a", "id_b",
        )
        .distinct()
        # persisted once (tiny — id pairs) because it feeds the
        # candidate-ids semi join AND the verify join; without it the
        # expensive prefix build would run three times. Released
        # deterministically when the caller drops the result
        # (plans/lifecycle.py) instead of pinning session storage.
        .persist()
    )
    # verify only candidate docs: re-shingle after a semi join on the
    # (small) candidate id set instead of materializing shingle arrays
    # for the whole corpus twice
    ids = (
        cand.select(F.col("id_a").alias("_id"))
        .unionByName(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    sets = (
        docs.join(ids, docs[id_col] == ids["_id"], "left_semi")
        .select(
            F.col(id_col).alias("_id"),
            F.array_distinct(word_shingles(text_col, shingle_n)).alias("_sh"),
        )
    )
    from seqarray_spark.plans.lifecycle import release_on_gc

    # the verify joins stay size-aware sort-merge/shuffled-hash: sets
    # carries the candidate docs' full shingle ARRAYS, which at corpus
    # scale exceed broadcast bounds — forcing a broadcast here would be
    # a local-only win and a cluster OOM hazard (guide §3.1's cost
    # caveat; examined r13, deliberately left alone)
    result = (
        cand.join(sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= float(tau))
        .select("id_a", "id_b", "jaccard")
    )
    release_on_gc(sh, result)
    return release_on_gc(cand, result)


def window_dup_pairs(
    docs: DataFrame,
    w: int = 8,
    max_hot: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-window dedup candidates (the Spark form of Lee et
    al. 2021's 'Deduplicating Training Data Makes Language Models
    Better', arXiv:2107.06499 — their suffix-array stage finds exact
    w-token repeats; this is the distributed hash-of-every-window
    equivalent): two docs pair when they share at least ONE exact
    w-token window, with the shared-window count as evidence.

    Output: (doc_a, doc_b, n_shared_windows) with doc_a < doc_b;
    n_shared_windows counts DISTINCT shared window hashes (within-doc
    repetition — doc_repetition's territory — does not inflate pairs).

    Windows appearing in > max_hot docs are excluded before the pair
    join: they are cross-corpus boilerplate (doc_boilerplate measures
    those), and a window shared by h docs contributes h^2/2 pairs — the
    cap is what keeps the exact operator alive at corpus scale, the
    same discipline as the PPJoin prefix filter above. Plan: one
    explode + distinct, ONE shuffle on win_h for the count window, a
    same-key self-join (no re-shuffle under AQE), and the pair groupBy."""
    from pyspark.sql.window import Window as _W

    from seqarray_spark.operators.text import bind1

    def _wins(t):
        return F.when(
            F.size(t) >= int(w),
            F.transform(
                F.sequence(F.lit(1), F.size(t) - int(w) + 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, int(w)))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    win_exprs = bind1(tokens(text_col), _wins)
    wins = (
        _spread(docs)
        .select(F.col(id_col).alias("_id"), F.explode(win_exprs).alias("win_h"))
        .distinct()
    )
    cold = (
        wins.withColumn("ndocs", F.count(F.lit(1)).over(_W.partitionBy("win_h")))
        .where(F.col("ndocs") <= int(max_hot))
        .select("_id", "win_h")
    )
    a, b = cold.alias("a"), cold.alias("b")
    return (
        a.join(
            b,
            (F.col("a.win_h") == F.col("b.win_h"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash, rendered as a 16-hex-char string: bit (4i+j) is the
    majority across tokens of bit j of md5-hex nibble i of the token hash.
    Engine-portable (md5 + substring + instr only). Adds `simhash STRING`
    (NULL for token-less docs).

    Long form (explode tokens, hash once, 64 vote sums in one groupBy) —
    the array-expression form would re-inline the md5 per bit fold. A
    string sketch sidesteps BIGINT sign overflow at bit 63 under ANSI
    mode, and substrings of it ARE the 16-bit bands for banded joins.
    """
    from seqarray_spark.operators.text import tokens

    docs = _spread(docs)
    tok = docs.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("__t")
    ).select("__id", F.md5("__t").alias("__h"))
    # project the 16 nibble ints ONCE (guaranteed single conv/substring
    # per nibble — inside the aggregates they would re-evaluate per bit),
    # then the 64 bit sums are plain shift/mask arithmetic. Majority of
    # +-1 votes == 2 * ones-count > n, tie (== n) excluded — identical
    # semantics to the vote-sum form the oracle mirrors.
    #
    # The whole 65-aggregate tree is rendered as SQL strings and parsed
    # once (r14 opt, guide §4.1's relation-construction rule applied to
    # EXPRESSION construction): building it out of per-node Column calls
    # cost a py4j round trip per node — measured ~1.2 s of the gate's
    # bench wall as pure driver-side tree assembly (plan_wall_r14:
    # t_build 1.2-1.7 s vs t_plan 0.04 s), the same finding similarity.py
    # documents for the inlined-centroid arrays. The parsed expression
    # trees are identical (same functions, same literals), so plans and
    # values are unchanged.
    nibs = tok.selectExpr(
        "__id",
        *[
            f"cast(conv(substring(__h, {i + 1}, 1), 16, 10) as int) as __n{i}"
            for i in range(16)
        ],
    )
    aggs = [F.expr("count(1)").alias("__n")]
    for i in range(16):
        for j in range(4):
            aggs.append(
                F.expr(f"sum(shiftright(__n{i}, {j}) & 1)").alias(f"__v_{i}_{j}")
            )
    votes = nibs.groupBy("__id").agg(*aggs)
    chars = []
    for i in range(16):
        nibble = " + ".join(
            f"(CASE WHEN 2 * __v_{i}_{j} > __n THEN {1 << j} ELSE 0 END)"
            for j in range(4)
        )
        chars.append(f"substr('{_HEX}', ({nibble}) + 1, 1)")
    sketch = votes.selectExpr(
        "__id", "concat(" + ", ".join(chars) + ") as simhash"
    )
    return docs.join(sketch, docs[id_col] == sketch["__id"], "left").drop("__id")


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-hex-char simhash strings: sum over
    nibbles of popcount(xor). 16 independent terms, no lambda (lambda
    expressions recompute on reuse)."""
    total = None
    for i in range(16):
        na = F.conv(F.substring(a, i + 1, 1), 16, 10).cast("int")
        nb = F.conv(F.substring(b, i + 1, 1), 16, 10).cast("int")
        term = F.bit_count(na.bitwiseXOR(nb))
        total = term if total is None else total + term
    return total.cast("int")


def simhash_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs via banded 64-bit SimHash: candidates share at least
    one of the four 16-bit bands exactly (equi-join per band — the r1
    16-bit whole-sketch bucket join went ~N^2/65536 past 10^5 docs);
    verification keeps pairs with Hamming distance <= max_hamming.

    Pigeonhole guarantee: <= 3 flipped bits cannot touch all 4 bands, so
    recall is exact (not probabilistic) for max_hamming <= 3."""
    s = simhash64(docs, text_col, id_col).select(F.col(id_col).alias("_id"), "simhash")
    bands = s.select(
        "_id",
        "simhash",
        F.posexplode(
            F.array(*[F.substring("simhash", b * 4 + 1, 4) for b in range(4)])
        ).alias("band_idx", "band_key"),
    )
    a = bands.select(
        F.col("_id").alias("id_a"), F.col("simhash").alias("sk_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("_id").alias("id_b"), F.col("simhash").alias("sk_b"), "band_idx", "band_key"
    )
    # verify (cheap bit math) BEFORE the dedup exchange: the distinct then
    # shuffles (id, id, int) survivors only — the 16-char sketches never
    # leave the map side, and multi-band collisions dedup on identical rows
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            simhash_hamming(F.col("sk_a"), F.col("sk_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= int(max_hamming))
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (_norm(a) * _norm(b))


def embedding_dup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tau: float = 0.95,
    bucketed: bool = False,
    planes: int = 6,
    bands: int = 8,
    blocks: int | None = None,
) -> DataFrame:
    """Pairs with cosine >= tau.

    bucketed=False: exact all-pairs via distributed block-matmul (triangle
    partitioning) — O(N^2) compute by definition, but fully distributed:
    no driver collect, no broadcast of the matrix, shuffle volume N*B rows
    for B^2/2 block-pair tasks. Exactness is the point; for corpus-scale
    near-dup detection prefer bucketed=True.
    bucketed=True: banded random-hyperplane LSH (the OR-of-ANDs
    construction, same shape as minhash_dup_pairs' bands): each vector is
    keyed by `bands` independent sign patterns of `planes` deterministic
    hyperplanes, the self-join runs per (band, bucket), and exact cosine
    verifies before a distinct collapses multi-band hits. A single band
    misses any near-dup pair split by one of its hyperplanes (recall
    (1-θ/π)^planes per band); OR'ing `bands` bands lifts recall to
    1-(1-r)^bands — ≥0.98 at tau=0.9 with the 6-plane/8-band default.
    `planes` is the precision knob (bucket count 2^planes bounds
    candidate volume), `bands` the recall knob. This is the 100 TB path:
    the shuffle key is (band, bucket) and only same-bucket pairs are
    scored; the sign matrix is folded into the plan as literals (no
    runtime hashing, no stored model).
    """
    # per-row norm computed ONCE per side before the join, so per-pair
    # work is a single dot fold + one division
    df = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    if not bucketed:
        return _all_pairs_matmul(df, tau, blocks)
    first = emb.select(vec_col).first()
    if first is None:
        dim = 1
    else:
        dim = len(first[0])
    band_buckets = F.array(*[
        _signed_bucket(F.col("_v"), _plane_signs(dim, planes, band))
        for band in range(bands)
    ])
    df = df.select(
        "_id", "_v", "_n",
        F.posexplode(band_buckets).alias("_band", "_bucket"),
    )
    a = df.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                  F.col("_n").alias("na"), "_band", "_bucket")
    b = df.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                  F.col("_n").alias("nb"), "_band", "_bucket")
    joined = a.join(b, ["_band", "_bucket"]).filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # verify IN-BUCKET (map-side after the join), then distinct: the
    # cosine fold is deterministic in array order, so a pair surfacing in
    # several bands collapses exactly
    return (
        joined.withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= float(tau))
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


def _all_pairs_matmul(
    df: DataFrame,
    tau: float,
    blocks: int | None = None,
    group_col: str | None = None,
    carry_col: str | None = None,
) -> DataFrame:
    """Exact all-pairs cosine>=tau as a distributed block matmul (triangle
    partitioning). df: (_id, _v, _n) plus `group_col` if given.

    Each vector lands in block b = hash(_id) % B and is replicated to the
    B block-pair groups {(min(b,p), max(b,p)) : p in 0..B-1}; each group
    holds two blocks (~2N/B rows) and scores them with ONE BLAS matmul.
    Every unordered row pair belongs to exactly one group, so pairs emerge
    exactly once with id_a < id_b. Fully lazy: no driver collect, no
    broadcast — shuffle volume is N*B rows, and per-task memory is
    (2N/B)*dim*8 bytes, so B is the knob that fits the task in RAM at any
    N. The division-by-norms formula matches the expression path
    bit-for-bit up to BLAS summation order.

    `group_col` restricts pairs to rows sharing the column's value (the
    within-cluster form semantic_dedup rides): the task key becomes
    (group, i, j), so a skewed group still fans out over B^2/2 tasks
    instead of serializing on one.

    `carry_col` names an optional per-row double column to thread
    through to the output as (carry_a, carry_b) — aligned with the
    min/max id orientation — so callers needing a per-endpoint value on
    each pair (semantic_dedup's centroid-cos keeper rule) skip two
    joins back against the point frame.

    Ids may be any integral type or string (r10 review — the hardcoded
    int64 path made semantic_dedup's new default mode='blas' a silent
    regression for string-keyed corpora that the r9 exact path served):
    the id_a/id_b output type follows the input's _id, the block hash
    (xxhash64) is type-agnostic, and the kernel compares via numpy
    object arrays when ids aren't integral. Other id types raise
    up front with the exact-mode escape hatch named."""
    import numpy as np
    import pandas as pd

    sc = df.sparkSession.sparkContext
    # B^2/2 groups ~ default parallelism keeps every core busy without
    # over-replicating; callers at real scale size B from N and task RAM
    b_num = blocks or max(2, int((2 * sc.defaultParallelism) ** 0.5))
    gcols = [group_col] if group_col else []
    ccols = [carry_col] if carry_col else []
    id_type = dict(df.dtypes)["_id"]
    ids_integral = id_type in ("tinyint", "smallint", "int", "bigint")
    if not ids_integral and id_type != "string":
        raise ValueError(
            f"_all_pairs_matmul supports integral or string ids, got "
            f"{id_type} — use the join-based mode='exact' path"
        )
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"
    empty = {"id_a": [], "id_b": [], "cosine": []}
    if carry_col:
        out_schema += ", carry_a double, carry_b double"
        empty.update({"carry_a": [], "carry_b": []})

    replicated = (
        df.withColumn("_blk", F.pmod(F.xxhash64("_id"), F.lit(b_num)).cast("int"))
        .select(
            *gcols,
            *ccols,
            "_id",
            "_v",
            "_n",
            "_blk",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {b_num - 1}), "
                    "p -> struct(least(_blk, p) as i, greatest(_blk, p) as j))"
                )
            ).alias("_bp"),
        )
        .select(*gcols, *ccols, "_id", "_v", "_n", "_blk",
                F.col("_bp.i").alias("_i"), F.col("_bp.j").alias("_j"))
    )

    def kernel(key, pdf):
        i, j = int(key[-2]), int(key[-1])
        a = b = pdf
        if i != j:
            a = pdf[pdf["_blk"] == i]
            b = pdf[pdf["_blk"] == j]
        # object arrays for string ids: numpy elementwise <, minimum
        # and maximum dispatch to Python comparisons, so the triangle
        # and min/max orientation rules below hold for both id kinds
        np_t = np.int64 if ids_integral else object
        a_ids = a["_id"].to_numpy(dtype=np_t)
        b_ids = b["_id"].to_numpy(dtype=np_t)
        if not len(a_ids) or not len(b_ids):
            return pd.DataFrame(empty)
        a_mat = np.array(list(a["_v"]), dtype=np.float64)
        b_mat = np.array(list(b["_v"]), dtype=np.float64)
        sims = (a_mat @ b_mat.T) / np.outer(
            a["_n"].to_numpy(dtype=np.float64), b["_n"].to_numpy(dtype=np.float64)
        )
        if i == j:
            # same block on both sides: keep the upper triangle
            ai, bi = np.nonzero((sims >= tau) & (a_ids[:, None] < b_ids[None, :]))
            id_a, id_b = a_ids[ai], b_ids[bi]
            swap = np.zeros(len(ai), dtype=bool)
        else:
            # disjoint blocks: each pair appears once, in either order
            ai, bi = np.nonzero(sims >= tau)
            swap = a_ids[ai] > b_ids[bi]
            id_a = np.minimum(a_ids[ai], b_ids[bi])
            id_b = np.maximum(a_ids[ai], b_ids[bi])
        out = {"id_a": id_a, "id_b": id_b, "cosine": sims[ai, bi]}
        if carry_col:
            xa = a[carry_col].to_numpy(dtype=np.float64)[ai]
            xb = b[carry_col].to_numpy(dtype=np.float64)[bi]
            out["carry_a"] = np.where(swap, xb, xa)
            out["carry_b"] = np.where(swap, xa, xb)
        return pd.DataFrame(out)

    return replicated.groupBy(*gcols, "_i", "_j").applyInPandas(
        kernel, schema=out_schema
    )


def _plane_signs(dim: int, planes: int, band: int = 0) -> list[list[float]]:
    """Deterministic ±1 hyperplane components, computed driver-side and
    folded into the plan as literals. Band 0 plane p component d seeds
    from md5('p:d') (identical to the runtime-hashed _hyperplane_bucket,
    so single-band bucket ids are unchanged); band b>0 seeds from
    md5('b<b>:p:d') — independent planes per band."""
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            seed = f"{p}:{d}" if band == 0 else f"b{band}:{p}:{d}"
            nib = hashlib.md5(seed.encode()).hexdigest()[0]
            row.append(1.0 if nib in "89abcdef" else -1.0)
        out.append(row)
    return out


def _signed_bucket(vec: Column, signs: list[list[float]]) -> Column:
    """Bucket id = sign pattern of literal-matrix projections (the
    constant-folded twin of _hyperplane_bucket: one zip_with fold per
    plane, zero runtime hashing)."""
    out = None
    for p, row in enumerate(signs):
        arr = F.array(*[F.lit(s) for s in row])
        proj = F.aggregate(
            F.zip_with(vec, arr, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def _hyperplane_bucket(vec: Column, planes: int) -> Column:
    """Sign pattern of `planes` deterministic hyperplanes. Component (p,d)
    = +1 if md5('p:d') first nibble >= 8 else -1 — reproducible anywhere,
    no stored model."""
    bits = []
    for p in range(planes):
        def signed(p):
            return lambda x, d: x.cast("double") * F.when(
                F.substring(
                    F.md5(F.concat(F.lit(f"{p}:"), d.cast("string"))), 1, 1
                ).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))

        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), signed(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def dup_clusters(pairs: DataFrame, max_iter: int = 30,
                 driver_threshold: int = 200_000) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components over the pair graph, labeled by each component's minimum
    id -> (doc_id, cluster_id). This is the step a curation pipeline
    runs after any pair generator (minhash/simhash/embedding) to pick
    one keeper per duplicate group — pairs alone under-remove when dups
    chain (A~B, B~C but not A~C).

    Pair sets up to `driver_threshold` rows take a BOUNDED driver
    union-find fast path (a few MB at the cap): iterative CC pays
    several Spark stage launches per round, which on a near-dup graph
    of a few hundred edges is pure scheduling overhead — the same
    bounded-small-side trade as IVF's driver centroid sample. Identical
    labels either way (pytest-pinned); pass driver_threshold=0 to force
    the distributed loop. At corpus scale the count exceeds the
    threshold and the label-propagation path below is the only one that
    runs.

    Algorithm: min-label propagation with pointer jumping — each round
    every node adopts the min of its own label, its neighbors' labels,
    AND its current label's label (path halving), so convergence takes
    O(log diameter) rounds rather than O(diameter): a 10^6-long dup
    chain converges in ~20 rounds. The label's-label lookup rides the
    SAME join as the neighbor pass (each node contributes a transient
    id->label edge), so a round is ONE shuffled join + one agg; LAZY
    `localCheckpoint`s per round keep the plan from growing but
    materialize only when the label-sum convergence probe (every SECOND
    round — labels only decrease, so an unchanged sum across two rounds
    proves both were no-ops) runs its action, so two propagation rounds
    cost ONE Spark job instead of three. No driver-side graph. Raises
    RuntimeError if max_iter rounds don't converge (never returns a
    partially-propagated labeling — downstream keeper selection would
    silently over-keep)."""
    id_type = pairs.schema["id_a"].dataType.simpleString()
    # lazy-checkpoint BEFORE the threshold probe: the probe's
    # limit+collect materializes (and caches) the upstream pair plan —
    # typically a full LSH pipeline — so when the count exceeds the
    # threshold the distributed loop's `edges` reads the cached
    # partitions instead of re-running the pair generator from scratch
    # (at corpus scale that re-run is a full extra LSH pass)
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
    if driver_threshold:
        head = pairs.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _driver_union_find(pairs.sparkSession, head, id_type)
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .union(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # seed labels one propagation step ahead: label0 = min(id, neighbors)
    # — identical to the state after a first nbr-min round (pointer
    # jumping is the identity when label == id), so shallow graphs (the
    # near-dup norm) converge one full round earlier
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("__nb"))
        .select(
            F.col("a").alias("id"),
            F.least(F.col("a"), F.col("__nb")).alias("label"),
        )
        .localCheckpoint(eager=False)
    )
    # convergence check by label-hash-sum: labels only ever DECREASE
    # (min-propagation), so any change alters the multiset of labels and
    # with it the sum of xxhash64(label) — one tiny agg per round
    # instead of a self-join diff. xxhash64 keeps the probe id-type-
    # agnostic (string doc ids hash like longs); a no-change round can
    # only alias a changed round via a 64-bit sum collision
    def _label_sum(lb):
        # decimal(38,0) accumulator: ANSI mode aborts on long overflow,
        # and a sum of 64-bit hashes overflows at ~2 rows
        return lb.agg(
            F.sum(F.xxhash64("label").cast("decimal(38,0)"))
        ).first()[0]

    prev_sum = _label_sum(labels)
    converged = False
    for it in range(max_iter):
        # neighbor pass + pointer jump in ONE join: every node also
        # contributes a transient (id -> label) edge, so min over the
        # combined neighborhood = min(neighbor labels, label's label)
        cedges = edges.union(
            labels.select(F.col("id").alias("a"), F.col("label").alias("b"))
        )
        nbr_min = (
            cedges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nbr"))
            .withColumnRenamed("a", "id")
        )
        labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # probe every 2nd round: the sum is monotone non-increasing, so
        # equality with the sum from two rounds ago proves convergence
        if it % 2 == 1 or it == max_iter - 1:
            cur_sum = _label_sum(labels)
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds; "
            f"raise max_iter (components of diameter > ~2^{max_iter} "
            f"should not exist in a near-dup graph)"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _driver_union_find(spark, rows, id_type: str = "bigint") -> DataFrame:
    """Min-label connected components over a BOUNDED collected pair
    list (the dup_clusters small-input fast path): classic union-find
    with path compression, then every root relabeled to its component's
    minimum member id — the exact labeling the distributed
    min-label-propagation loop converges to. Id-type-agnostic like the
    distributed path (min/max over any orderable id — string doc ids
    included); `id_type` is the pairs' id_a Spark type, echoed into the
    result schema."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["id_a"], r["id_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = [(x, find(x)) for x in parent]
    schema = f"doc_id {id_type}, cluster_id {id_type}"
    if not out:
        return spark.createDataFrame([], schema)
    # ONE partition, not defaultParallelism slices: the label frame is
    # bounded (<= 2*driver_threshold rows, a few MB at the cap) and the
    # default slicing turns every downstream action into ~32 near-empty
    # tasks (the header_df lesson)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), schema
    )
