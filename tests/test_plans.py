"""Plan-shape regression tests: the scale guarantees (pushdown, pruning,
broadcast, partial agg) asserted at the physical-plan level — the Spark
equivalents of the reference's hand-built mechanisms (SURVEY.md §4)."""

import pytest
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset
from seqarray_spark.plans import explain as E
from seqarray_spark.sources import testdata as td


@pytest.fixture(scope="module")
def stored(spark, sf_dir, tmp_path_factory):
    """Dataset written in the recommended layout: variants partitioned by
    chromosome, calls plain parquet."""
    out = str(tmp_path_factory.mktemp("layout"))
    ds = td.variant_dataset(spark, sf_dir)
    from seqarray_spark.operators.mutate import optimize_by_chromosome

    optimize_by_chromosome(ds, out)
    return SeqDataset.read(spark, out)


def test_chrom_filter_is_partition_pruning(stored):
    """set_filter_chrom must prune partition directories AND push the
    position predicate to the scan (reference's RLE chrom index + bp
    range test, src/SeqArray.cpp:709-883)."""
    stored.reset_filter()
    stored.set_filter_chrom(["5"], from_bp=1000, to_bp=500000)
    v = stored.variants
    parts = " ".join(E.partition_filters(v))
    assert "chromosome" in parts
    pushed = " ".join(E.pushed_filters(v))
    assert "position" in pushed
    stored.reset_filter()


def test_projection_prunes_columns(stored):
    """A 2-column projection must not read the whole variant schema."""
    df = stored.variants.select("variant_id", "position")
    schemas = E.read_schemas(df)
    assert schemas and all("ref" not in s and "alt" not in s for s in schemas)


def test_allele_freq_has_partial_agg_and_one_shuffle(stored):
    from seqarray_spark.operators.aggregates import allele_freq

    df = allele_freq(stored._base_calls, ref_allele=0)
    assert E.has_partial_aggregation(df)
    assert E.num_shuffles(df) == 1


def test_variant_filter_reaches_calls_as_broadcast(stored):
    """Calls filtered through a variant selection must use a broadcast
    join (no shuffle of the fact table)."""
    stored.reset_filter()
    stored.set_filter_chrom(["1", "2"])
    df = stored.calls
    assert E.broadcast_join_count(df) >= 1
    assert E.sortmerge_join_count(df) == 0
    stored.reset_filter()


def test_q3_broadcasts_dimensions(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.q3_top_revenue(spark, sf_dir)
    assert E.broadcast_join_count(df) >= 2


def test_probe_join_is_broadcast(stored, spark):
    stored.reset_filter()
    probes = stored.variants.filter(F.col("variant_id") % 50 == 0).select(
        "chromosome", "position"
    )
    stored.set_filter_pos(probes, match_alleles=False)
    assert E.broadcast_join_count(stored.variants) >= 1
    stored.reset_filter()


def test_unbounded_frame_is_not_force_broadcast(spark):
    """maybe_broadcast must DROP the hint when Catalyst estimates the
    frame above the cap — a forced broadcast of a dataset-sized selection
    is an OOM at 100 TB; AQE picks broadcast at runtime if it turns out
    small (VERDICT r1 'what's wrong' #3)."""
    from seqarray_spark.plans.hints import estimated_plan_bytes, maybe_broadcast

    big = spark.range(2_000_000_000).withColumnRenamed("id", "variant_id")
    assert estimated_plan_bytes(big) > 1 << 30
    fact = spark.range(1000).withColumnRenamed("id", "variant_id")
    plan = (
        fact.join(maybe_broadcast(big), "variant_id", "left_semi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan

    small = spark.range(100).withColumnRenamed("id", "variant_id")
    plan_small = (
        fact.join(maybe_broadcast(small), "variant_id", "left_semi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan_small


def test_emb_dup_pairs_runs_no_eager_job(spark):
    """Constructing the exact all-pairs query must not run a Spark job
    (r1 shipped a df.collect() at query-construction time) and must not
    reference a driver-materialized broadcast variable."""
    from pyspark.sql import Row

    from seqarray_spark.operators.dedup import embedding_dup_pairs

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(50)]
    )
    sc = spark.sparkContext
    sc.setJobGroup("construct-only", "plan construction must be lazy")
    try:
        df = embedding_dup_pairs(emb, tau=0.9, bucketed=False)
        _ = df._jdf.queryExecution().executedPlan().toString()
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("construct-only")
    assert list(jobs) == []
    assert df.count() > 0  # still executes


def test_ivf_topk_zero_shuffle_over_vectors(spark):
    """IVF assign must be a mapInPandas projection, not the r1
    crossJoin + row_number formulation (N*ncells window shuffle)."""
    from pyspark.sql import Row

    from seqarray_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 7), float(i % 3), 1.0]) for i in range(200)]
    )
    df = S.ivf_topk(emb, [1.0, 0.0, 0.0], k=5, ncells=4, nprobe=2)
    assert E.num_shuffles(df) == 0
    plan = E.plan_string(df, "simple")
    assert "Window" not in plan and "CartesianProduct" not in plan
    assert len(df.collect()) == 5


def test_fused_agg_is_single_pass(stored):
    """seqGetAF_AC_Missing parity: one scan, one shuffle, all stats."""
    from seqarray_spark.operators.aggregates import af_ac_missing

    df = af_ac_missing(stored._base_calls)
    assert E.num_shuffles(df) == 1


def test_fused_dosage_agg_is_single_pass(spark):
    from pyspark.sql import Row

    from seqarray_spark.operators.aggregates import af_ac_missing_dosage

    calls = spark.createDataFrame(
        [Row(variant_id=i % 5, sample_id=f"S{i}", DS=float(i % 3) / 2) for i in range(50)]
    )
    df = af_ac_missing_dosage(calls)
    assert E.num_shuffles(df) == 1


def test_pack_sequences_no_global_sort(spark):
    """Sequence packing windows are per-shard: one hash-partitioned
    Exchange, never an Exchange SinglePartition (a global-ordered window
    would funnel the corpus through one partition)."""
    from pyspark.sql import Row

    from seqarray_spark.operators.curate import pack_sequences

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="w " * 20) for i in range(100)]
    )
    df = pack_sequences(docs, budget=64, shards=8)
    plan = E.plan_string(df, "simple")
    assert "SinglePartition" not in plan
    assert E.num_shuffles(df) == 1


def test_stratified_sample_no_global_sort(spark):
    from pyspark.sql import Row

    from seqarray_spark.operators.curate import sample_stratified

    docs = spark.createDataFrame(
        [Row(doc_id=i, stratum=i % 3) for i in range(100)]
    )
    df = sample_stratified(docs, "stratum", 0.5)
    plan = E.plan_string(df, "simple")
    assert "SinglePartition" not in plan


def test_minhash_pairs_single_signature_scan(spark):
    """The LSH candidate stage buckets ONE signature build (groupBy +
    in-bucket pair expansion) instead of self-joining two copies of the
    signature lineage."""
    from pyspark.sql import Row

    from seqarray_spark.operators.dedup import minhash_dup_pairs

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{j+i%3}" for j in range(12)))
         for i in range(30)]
    )
    cand = minhash_dup_pairs(docs, tau=None)
    plan = E.plan_string(cand, "simple")
    # candidate generation is join-free (the verify stage joins later)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_pii_scrub_is_pure_projection(spark, sf_dir):
    """pii_scrub must stay a Column pipeline: no aggregation shuffle, no
    Python eval node — the scan-speed property its docstring promises.
    (spread() may add at most one round-robin exchange on a narrow
    scan.)"""
    from seqarray_spark.operators.curate import pii_scrub

    docs = td.load_table(spark, sf_dir, "documents")
    df = pii_scrub(docs)
    assert E.num_shuffles(df) <= 1
    plan = E.plan_string(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_broadcasts_probes(spark, sf_dir):
    """The corpus side of contamination_check must never shuffle for the
    join: probe shingles broadcast, and no sort-merge join appears."""
    from seqarray_spark.operators.curate import contamination_check

    docs = td.load_table(spark, sf_dir, "documents")
    probes = docs.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    df = contamination_check(docs, probes, n=5)
    assert E.broadcast_join_count(df) >= 1
    assert E.sortmerge_join_count(df) == 0


def test_lm_score_broadcasts_vocab(spark, sf_dir):
    """lm_score's vocab table must broadcast back onto the token stream
    (no sort-merge join of the corpus against its own vocabulary)."""
    from seqarray_spark.operators.text import lm_score

    docs = td.load_table(spark, sf_dir, "documents")
    df = lm_score(docs)
    assert E.broadcast_join_count(df) >= 2  # freq + total scalar
    assert E.sortmerge_join_count(df) == 0


def test_domain_mix_plan_shape(spark):
    """domain_mix: the domain-count aggregate must combine map-side, the
    tiny targets frame must broadcast back (never shuffle the corpus
    against it), and only the ranked-selection window may shuffle the
    data-sized frame."""
    from seqarray_spark.operators.curate import domain_mix

    docs = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    out = domain_mix(docs, "source", 0.3)
    assert E.has_partial_aggregation(out)
    assert E.broadcast_join_count(out) >= 1
    # counts agg + its single-partition total + the per-domain window:
    # nothing else may introduce an Exchange
    assert E.num_shuffles(out) <= 3


def test_geno_gt_is_pure_projection(stored):
    """geno_gt must ride the calls scan: no shuffle, no join."""
    from seqarray_spark.functions.accessors import geno_gt

    stored.reset_filter()
    out = geno_gt(stored)
    assert E.num_shuffles(out) <= 1  # at most the filter-stack semi-join


def test_chrom_rle_no_single_partition_exchange(spark):
    """$chromosome RLE must not funnel the variant axis through one
    task: no Exchange SinglePartition and no global Window in the plan
    (the fold is per-partition; only run-count rows shuffle)."""
    from pyspark.sql import Row

    from seqarray_spark.dataset import SeqDataset

    from seqarray_spark.dataset import chrom_rle

    v = spark.createDataFrame(
        [Row(variant_id=i + 1, chromosome=str(1 + i // 40)) for i in range(200)]
    )
    # driver_threshold=0 forces the distributed fold (the default takes
    # the bounded driver fast path on a selection this small)
    df = chrom_rle(v, driver_threshold=0)
    plan = E.plan_string(df, "simple")
    # the output orderBy sorts run-count rows (tiny) — rangepartitioning
    # is fine; what must be absent is a SinglePartition funnel or a
    # global window over the variant axis
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_incremental_dedup_corpus_side_shuffle_free(spark):
    """The operator's 100 TB claim, proven in the plan: joining a batch
    against the stored bucketed band-key index produces exactly ONE
    Exchange (the batch's own band keys hashing into the bucket layout)
    and at most one Sort (the batch side) — the corpus side is read
    bucket-aligned and pre-sorted, so per-batch cost scales with the
    batch, never the corpus."""
    from pyspark.sql import Row

    from seqarray_spark.operators.dedup import (
        incremental_dup_pairs,
        minhash_signature,
        write_corpus_band_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta epsilon zeta {i % 7}")
         for i in range(60)]
    )
    batch = docs.where("doc_id % 6 = 0")
    corpus = docs.where("doc_id % 6 != 0")
    sigs = minhash_signature(corpus, num_hashes=16, shingle_n=3).select(
        "doc_id", "mh_sig"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_corpus_band_index(sigs, "cbi_plan", num_hashes=16, bands=4,
                                n_buckets=8)
        # batch_key_pushdown=None: this test pins the PURE bucket-layout
        # shape (full-index join); the pushdown variant has its own
        # plan+equivalence test below
        cand = incremental_dup_pairs(
            batch, None, num_hashes=16, bands=4, shingle_n=3, tau=None,
            include_new_pairs=False,
            corpus_band_table=spark.table("cbi_plan"),
            batch_key_pushdown=None,
        )
        plan = E.plan_string(cand, "simple")
        assert E.sortmerge_join_count(cand) >= 1
        # corpus side read bucket-aligned...
        assert "Bucketed: true" in plan
        # ...with its stored sort trusted: the ONLY sort on the join key
        # is the batch side's (one occurrence); a second one would mean
        # the corpus re-sorts per batch
        assert plan.count("Sort [band_key") == 1, plan
        # exchanges: batch minhash groupBy + batch join hash + final
        # distinct — all batch/pair-scaled; NONE on the corpus side
        n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_exchanges <= 3, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cbi_plan")


def test_incremental_dedup_batch_key_pushdown(spark):
    """VERDICT r8 item 4 / SCALE.md's named next lever: with
    batch_key_pushdown (the default), the batch's distinct band keys are
    bounded-collected and applied as an IN filter on the corpus index
    scan BEFORE the join — PushedFilters shows In(band_key, ...) on the
    bucketed scan, so parquet row-group min/max stats (files are sorted
    by band_key) and bucket pruning make corpus scan BYTES track the
    batch, not the corpus. Values must equal the unpruned join (an
    inner-join side can always be pre-filtered by the other side's
    keys). Also guards the two regressions found while building it: no
    runtime bloom-filter injection (an ExistingRDD batch side once made
    Spark RE-SCAN the corpus to build a bloom), and exactly ONE corpus
    FileScan in the plan."""
    from pyspark.sql import Row

    from seqarray_spark.operators.dedup import (
        incremental_dup_pairs,
        minhash_signature,
        write_corpus_band_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta epsilon zeta {i % 7}")
         for i in range(60)]
    )
    batch = docs.where("doc_id % 6 = 0")
    corpus = docs.where("doc_id % 6 != 0")
    sigs = minhash_signature(corpus, num_hashes=16, shingle_n=3).select(
        "doc_id", "mh_sig"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS cbi_pushdown")
    try:
        write_corpus_band_index(sigs, "cbi_pushdown", num_hashes=16,
                                bands=4, n_buckets=8)
        tbl = spark.table("cbi_pushdown")
        cand = incremental_dup_pairs(
            batch, None, num_hashes=16, bands=4, shingle_n=3, tau=None,
            include_new_pairs=False, corpus_band_table=tbl,
        )
        plan = E.plan_string(cand, "simple")
        # the batch's keys reached the corpus parquet scan
        assert "PushedFilters: [In(band_key" in plan, plan
        # and only ONE corpus scan exists (no bloom-creation re-scan)
        assert plan.count("FileScan parquet") == 1, plan
        assert "might_contain" not in plan, plan
        base = incremental_dup_pairs(
            batch, None, num_hashes=16, bands=4, shingle_n=3, tau=None,
            include_new_pairs=False, corpus_band_table=tbl,
            batch_key_pushdown=None,
        )
        assert sorted(map(tuple, cand.collect())) == sorted(
            map(tuple, base.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cbi_pushdown")


def test_compaction_restores_shuffle_free_corpus_join(spark):
    """The ingest loops' append path adds one file per bucket per batch;
    multi-file buckets make Spark distrust the stored sort, so the
    corpus side re-sorts on every batch join. compact_bucketed_index
    rewrites to one file per bucket and the plan returns to the
    single-Sort (batch-side-only) shape the layout promises."""
    from pyspark.sql import Row

    from seqarray_spark.operators.dedup import (
        compact_bucketed_index,
        corpus_band_index,
        incremental_dup_pairs,
        minhash_signature,
        write_corpus_band_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta epsilon zeta {i % 7}")
         for i in range(60)]
    )
    batch = docs.where("doc_id % 6 = 0")
    corpus1 = docs.where("doc_id % 6 = 1")
    corpus2 = docs.where("doc_id % 6 = 2")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS cbi_compact")
    try:
        sigs1 = minhash_signature(corpus1, num_hashes=16, shingle_n=3) \
            .select("doc_id", "mh_sig")
        write_corpus_band_index(sigs1, "cbi_compact", num_hashes=16,
                                bands=4, n_buckets=8)
        # streamed append: second batch of band keys -> 2 files/bucket
        sigs2 = minhash_signature(corpus2, num_hashes=16, shingle_n=3) \
            .select("doc_id", "mh_sig")
        (
            corpus_band_index(sigs2, "doc_id", 16, 4)
            .repartition(8, "band_key")
            .write.mode("append")
            .bucketBy(8, "band_key")
            .sortBy("band_key")
            .saveAsTable("cbi_compact")
        )

        def probe():
            # pushdown off: this test is about the stored-sort trust,
            # which the batch-key filter deliberately bypasses
            cand = incremental_dup_pairs(
                batch, None, num_hashes=16, bands=4, shingle_n=3, tau=None,
                include_new_pairs=False,
                corpus_band_table=spark.table("cbi_compact"),
                batch_key_pushdown=None,
            )
            return cand, E.plan_string(cand, "simple")

        cand, plan = probe()
        # multi-file buckets: the corpus side re-sorts -> 2 band_key sorts
        assert plan.count("Sort [band_key") == 2, plan
        rows_before = cand.count()

        compact_bucketed_index(spark, "cbi_compact")
        cand, plan = probe()
        assert plan.count("Sort [band_key") == 1, plan
        assert "Bucketed: true" in plan
        assert cand.count() == rows_before  # identical results
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cbi_compact")
        spark.sql("DROP TABLE IF EXISTS cbi_compact__compacting")


def test_boilerplate_two_shuffles(spark, sf_dir):
    """boilerplate_signals: df-by-window + per-doc groupBy + the id
    join back — shuffle count stays O(1) (no join-back for df, no
    all-pairs)."""
    from seqarray_spark.operators.text import boilerplate_signals

    docs = td.load_table(spark, sf_dir, "documents")
    df = boilerplate_signals(docs)
    # window(shingle) + groupBy(doc) + id-join sides; spread() may add
    # one narrow-scan round-robin
    assert E.num_shuffles(df) <= 5
    plan = E.plan_string(df, "simple")
    assert "CartesianProduct" not in plan


def test_kmeans_assign_is_pure_projection(spark, sf_dir):
    """kmeans_assign_exact (r10): the bounded centroid frame inlines as
    literals, so the assignment is ONE shuffle-free projection riding
    the vector scan — no join of any kind, no window, 0 Exchanges
    (the r1-r9 broadcast-crossJoin + row_number form shuffled k·N rows
    per point for the same values)."""
    from seqarray_spark.operators.similarity import kmeans_assign_exact

    emb = td.load_table(spark, sf_dir, "embeddings")
    init = emb.orderBy("vec_id").limit(4).collect()
    cents = spark.createDataFrame(
        [(i, list(map(float, r["embedding"]))) for i, r in enumerate(init)],
        "centroid_ord int, cvec array<float>",
    )
    df = kmeans_assign_exact(emb, cents)
    plan = E.plan_string(df, "simple")
    assert E.num_shuffles(df) == 0, plan
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in plan, f"{bad} in assignment plan:\n{plan}"


def test_pq_encode_zero_shuffle(spark, sf_dir):
    """r10 (VERDICT r9 item 2): pq_encode is ONE narrow projection that
    rides the corpus scan — the m·k codebook is inlined as literals,
    so the plan has 0 Exchanges, no join, no window, no explode (the
    r9 form shuffled 2 wide exchanges of m× the corpus)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.emb_pq_codes(spark, sf_dir)
    plan = E.plan_string(df, "simple")
    assert E.num_shuffles(df) == 0, plan
    for bad in ("Join", "Window", "Generate", "HashAggregate"):
        assert bad not in plan, f"{bad} in pq_encode plan:\n{plan}"


def test_semantic_dedup_gate_plan_not_quadratic_join(spark, sf_dir):
    """r10 (VERDICT r9 item 1): the graded emb_semantic_dedup plan must
    NOT contain the r9 scale-killer — a pair self-join keyed on
    centroid_ord alone. The pairs come from the grouped triangle
    block-matmul kernel (FlatMapGroupsInPandas keyed (centroid_ord,
    block_i, block_j)), so a skewed cell fans out over block-pair
    tasks instead of serializing on one partition."""
    import re

    import __spark_entry__ as entry_mod

    df = entry_mod.emb_semantic_dedup(spark, sf_dir)
    plan = E.plan_string(df, "simple")
    assert "FlatMapGroupsInPandas" in plan
    assert not re.search(
        r"Join \[centroid_ord#\d+\], \[centroid_ord#\d+\]", plan
    ), plan


def _planted_emb(spark, n=60, dim=16):
    import hashlib

    def vec(seed):
        h = hashlib.md5(str(seed).encode()).digest()
        return [(b / 255.0) - 0.5 for b in h]

    rows = [(i, vec(i)) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_incremental_semantic_corpus_side_shuffle_free(spark):
    """The embedding index's 100 TB claim, proven in the plan (the
    sibling of test_incremental_dedup_corpus_side_shuffle_free):
    joining a batch against the stored bucketed cell-key index
    produces NO Exchange and NO Sort on the corpus side — the batch
    side's keying is a shuffle-free projection (cell_assign_expr +
    literal hyperplanes), so the only exchanges are the batch keys
    hashing into the bucket layout and the candidate distinct."""
    from seqarray_spark.operators.similarity import (
        incremental_semantic_pairs,
        write_embedding_cell_index,
    )

    emb = _planted_emb(spark)
    cents = spark.createDataFrame(
        [(i, r["embedding"]) for i, r in
         enumerate(emb.orderBy("vec_id").limit(4).collect())],
        "centroid_ord int, cvec array<float>",
    )
    batch = emb.where("vec_id % 6 = 0")
    corpus = emb.where("vec_id % 6 != 0")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS eci_plan")
    try:
        write_embedding_cell_index(corpus, cents, "eci_plan", n_buckets=4)
        cand = incremental_semantic_pairs(
            batch, cents, tau=None, mode="banded",
            include_new_pairs=False,
            corpus_cell_table=spark.table("eci_plan"),
            batch_key_pushdown=None,
        )
        plan = E.plan_string(cand, "simple")
        assert E.sortmerge_join_count(cand) >= 1
        assert "Bucketed: true" in plan
        # only the batch side sorts on the join key
        assert plan.count("Sort [cell_key") == 1, plan
        # no per-point window/assignment shuffle: batch keying rides the
        # batch scan; exchanges = batch bucket hash + distinct
        n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_exchanges <= 2, plan
        assert "Window" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS eci_plan")


def test_incremental_semantic_batch_key_pushdown(spark):
    """The r9 batch-key pushdown composes with the embedding index:
    the batch's distinct cell keys reach the corpus index scan as an
    In() filter (bucket + row-group pruning), one corpus FileScan, no
    bloom re-scan, values unchanged vs the unpruned join."""
    from seqarray_spark.operators.similarity import (
        incremental_semantic_pairs,
        write_embedding_cell_index,
    )

    emb = _planted_emb(spark)
    cents = spark.createDataFrame(
        [(i, r["embedding"]) for i, r in
         enumerate(emb.orderBy("vec_id").limit(4).collect())],
        "centroid_ord int, cvec array<float>",
    )
    batch = emb.where("vec_id % 6 = 0")
    corpus = emb.where("vec_id % 6 != 0")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS eci_pushdown")
    try:
        write_embedding_cell_index(corpus, cents, "eci_pushdown",
                                   n_buckets=4)
        tbl = spark.table("eci_pushdown")
        cand = incremental_semantic_pairs(
            batch, cents, tau=None, mode="banded",
            include_new_pairs=False, corpus_cell_table=tbl,
        )
        plan = E.plan_string(cand, "simple")
        assert "PushedFilters: [In(cell_key" in plan, plan
        assert plan.count("FileScan parquet") == 1, plan
        assert "might_contain" not in plan, plan
        base = incremental_semantic_pairs(
            batch, cents, tau=None, mode="banded",
            include_new_pairs=False, corpus_cell_table=tbl,
            batch_key_pushdown=None,
        )
        assert sorted(map(tuple, cand.collect())) == sorted(
            map(tuple, base.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS eci_pushdown")


def test_scan_in_filter_danger_zone_skipped(spark):
    """r10 sharp edge, measured: a parquet-pushed In filter compiles to
    a RECURSIVE OR-chain in parquet-mr — >=1200 string keys overflow
    the executor stack (StackOverflowError mid-scan). The pushdown
    operators therefore skip the IN when the key count sits between
    PARQUET_IN_CHAIN_SAFE and the session inFilterThreshold (the range
    push at/above the threshold and shallow chains below the cap are
    both safe). This pins the guard: a danger-zone key list leaves the
    frame unfiltered; a safe one filters."""
    from seqarray_spark.operators.dedup import (
        PARQUET_IN_CHAIN_SAFE,
        scan_safe_in_filter,
    )

    df = spark.range(10).select(F.col("id").cast("string").alias("k"))
    prev = spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
    try:
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
                       "100000")
        danger = [str(i) for i in range(PARQUET_IN_CHAIN_SAFE + 1)]
        out = scan_safe_in_filter(df, F.col("k"), danger)
        assert out.count() == 10  # unfiltered: the IN was skipped
        safe = [str(i) for i in range(5)]
        out2 = scan_safe_in_filter(df, F.col("k"), safe)
        assert out2.count() == 5  # filtered: shallow chain is fine
        # STRICTLY above the threshold Spark pushes a safe RANGE
        # instead of the chain, so the key list IS applied as a filter
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
                       str(len(danger) - 1))
        out3 = scan_safe_in_filter(df, F.col("k"), danger)
        assert "Filter" in E.plan_string(out3, "simple")
        assert out3.count() == 10  # all ids 0..9 are in the key list
        # boundary (r10 review): at EXACTLY n == threshold
        # ParquetFilters still builds the OR chain
        # (values.length <= threshold) — must stay skipped
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
                       str(len(danger)))
        out4 = scan_safe_in_filter(df, F.col("k"), danger)
        assert "Filter" not in E.plan_string(out4, "simple")
    finally:
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", prev)


def test_ngram_df_count_is_partial_agg_not_window(spark, sf_dir):
    """VERDICT r10 item 2's done-criterion: the shingle document
    frequency must reach its exchange PRE-COLLAPSED (partial_count in a
    HashAggregate below the shuffle) and there must be NO Window node —
    the r10 count-window shape put every occurrence of a hot shingle in
    one task with no remedy at any scale."""
    from seqarray_spark.operators.dedup import ngram_jaccard_pairs
    from seqarray_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        ngram_jaccard_pairs(docs, tau=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan
    assert "Window" not in plan


def test_grm_sketch_scans_pair_relation_once(spark, sf_dir):
    """VERDICT r11 item 1's done-criterion: grm_sketch_y must not
    duplicate its input lineage. The r11 Union-of-two-selects form
    embedded the full grm_pairs build (the most expensive subtree in
    the registry) under both branches with zero ReusedExchange; the
    explode form adds ZERO source scans beyond what grm_pairs itself
    plans, and no Union node at all."""
    from seqarray_spark.operators.ld import grm_pairs, grm_sketch_y
    from seqarray_spark.sources import testdata as td

    grm = grm_pairs(td.gcalls(spark, sf_dir))
    sketch = grm_sketch_y(grm, n_cols=4)
    base_plan = E.plan_string(grm, "simple")
    plan = E.plan_string(sketch, "simple")
    assert "Union" not in plan
    assert plan.count("Scan ") == base_plan.count("Scan ")


def test_assoc_phenotype_join_is_broadcast(spark, sf_dir):
    """The association family's scale contract: the phenotype/trio/pair
    attribute frame is broadcast (bounded by n_samples rows) — the big
    dose relation must never shuffle to meet it, leaving one
    variant-keyed agg exchange as the only wide movement."""
    from seqarray_spark.operators.assoc import (
        case_control_assoc,
        trend_assoc,
    )

    calls = td.gcalls(spark, sf_dir)
    ph = td.gsamples(spark, sf_dir).select(
        "sample_id",
        (F.length("sample_id") % 2).alias("is_case"),
    )
    for op in (case_control_assoc, trend_assoc):
        plan = E.plan_string(op(calls, ph), "simple")
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        assert "SortMergeJoin" not in plan


def test_ld_score_single_pair_build(spark, sf_dir):
    """ld_score composes ld_pairs once: the explode-to-both-endpoints
    form must not duplicate the pair-build lineage (the grm_sketch_y
    precedent — no Union of two pair scans)."""
    from seqarray_spark.operators.ld import ld_pairs, ld_score

    variants = td.gvariants(spark, sf_dir)
    calls = td.gcalls(spark, sf_dir)
    base = E.plan_string(
        ld_pairs(variants, calls, bp_window=5000), "simple"
    )
    plan = E.plan_string(
        ld_score(variants, calls, bp_window=5000), "simple"
    )
    # one extra scan allowed: the LEFT-join back to the variant frame
    assert plan.count("Scan ") <= base.count("Scan ") + 1
