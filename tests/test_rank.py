"""BM25 ranking + DSIR importance weighting (operators/rank.py, new r10).

Value parity vs DuckDB is covered by the full-registry sweep
(doc_bm25_topk / doc_dsir_weights); these tests pin the operator
SEMANTICS (monotonicity, exclusions, the amortized-stats path) and the
scale-critical plan shapes."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqarray_spark.operators.rank import (  # noqa: E402
    bm25_stats,
    bm25_topk,
    dsir_logratios,
)
from seqarray_spark.plans import explain as E  # noqa: E402


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark shuffle join join join performance"),
        (2, "spark join"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "join join spark spark shuffle shuffle " * 8),  # long doc
        (5, "hash partitions"),
        (6, ""),
        (7, "one"),
        (8, "spark join the quick brown fox over lazy dog"),  # tf=1 each, longer
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_bm25_scores_and_exclusions(corpus):
    out = {
        r["doc_id"]: r for r in bm25_topk(corpus, "spark join", k=10).collect()
    }
    # docs with no query term (3, 5, 6, 7) score exactly 0 and are dropped
    assert set(out) == {1, 2, 4, 8}
    # length normalization: equal tf (1 per term) but doc 8 is 4.5x
    # longer, so the short doc 2 must outscore it
    assert out[2]["bm25"] > out[8]["bm25"]
    # tf saturation still rewards the tf-16 doc over a tf-1 doc
    assert out[4]["bm25"] > out[2]["bm25"]
    # every kept score is positive (Lucene +1 idf is non-negative)
    assert all(r["bm25"] > 0 for r in out.values())
    # n_tokens matches the shared tokenizer
    assert out[2]["n_tokens"] == 2


def test_bm25_precomputed_stats_path_identical(corpus):
    """stats= (the workload-amortized single-scan path) must reproduce
    the self-computed scores exactly."""
    from seqarray_spark.operators.rank import _query_terms

    terms = _query_terms("spark join")
    pre = bm25_stats(corpus, terms)
    a = sorted(bm25_topk(corpus, "spark join", k=10).collect())
    b = sorted(bm25_topk(corpus, "spark join", k=10, stats=pre).collect())
    assert a == b


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(corpus, "!!! ???")


def test_bm25_repeated_query_terms_dedupe(corpus):
    a = sorted(bm25_topk(corpus, "spark join", k=10).collect())
    b = sorted(bm25_topk(corpus, "spark spark JOIN join", k=10).collect())
    assert a == b


def test_bm25_plan_no_explode_no_wide_join(corpus):
    """The scoring pass must ride the scan: no Generate (explode), no
    SortMergeJoin — the only join is the broadcast of the 1-row stats,
    and the only Exchange is the stats reduce's SinglePartition (plus
    nothing on the scoring side before TakeOrderedAndProject)."""
    df = bm25_topk(corpus, "spark join", k=10)
    plan = E.plan_string(df, "simple")
    assert "Generate" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert E.num_shuffles(df) <= 1, plan


def test_dsir_weights_point_to_target(spark):
    """Planted two-domain corpus: target-domain docs must receive a
    strictly higher mean log-ratio than raw-domain docs."""
    tgt = [(i, "alpha beta gamma delta " * 5, "tgt") for i in range(20)]
    raw = [(100 + i, "zeta eta theta iota " * 5, "raw") for i in range(20)]
    docs = spark.createDataFrame(tgt + raw, "doc_id int, text string, source string")
    out = dsir_logratios(docs, F.col("source") == "tgt").collect()
    by_id = {r["doc_id"]: r["dsir_logratio"] for r in out}
    t_mean = sum(by_id[i] for i in range(20)) / 20
    r_mean = sum(by_id[100 + i] for i in range(20)) / 20
    assert t_mean > 0 > r_mean
    assert t_mean > r_mean + 1.0


def test_dsir_sub_two_token_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "solo", "a"), (2, "", "a"), (3, "two tokens here", "a")],
        "doc_id int, text string, source string",
    )
    out = dsir_logratios(docs, F.col("source") == "a").collect()
    assert {r["doc_id"] for r in out} == {3}
    assert out[0]["n_feats"] == 2  # bigrams of a 3-token doc


def test_dsir_plan_broadcast_bucket_join(spark):
    """The O(B)-bounded bucket-weight table must broadcast — a
    SortMergeJoin here would wide-shuffle the exploded corpus on a
    65536-key space at 100 TB."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", "a") for i in range(10)],
        "doc_id int, text string, source string",
    )
    df = dsir_logratios(docs, F.col("source") == "a")
    plan = E.plan_string(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bm25_stored_stats_index_identical(spark, corpus, tmp_path):
    """The stored-stats serve path (write_bm25_stats +
    bm25_stats_from_index) must reproduce the self-computed scores
    exactly, including unseen query terms (df 0)."""
    from seqarray_spark.operators.rank import (
        _query_terms,
        bm25_stats_from_index,
        bm25_topk,
        write_bm25_stats,
    )

    path = str(tmp_path / "bm25idx")
    write_bm25_stats(corpus, path)
    q = "spark join neverseenterm"
    terms = _query_terms(q)
    pre = bm25_stats_from_index(spark, path, terms)
    a = sorted(bm25_topk(corpus, q, k=10).collect())
    b = sorted(bm25_topk(corpus, q, k=10, stats=pre).collect())
    assert a == b and a


def test_bm25_stats_for_wrong_query_raises(corpus, spark, tmp_path):
    """ADVICE r11: a stats frame built for a DIFFERENT query with the
    SAME number of terms passes the column-shape check but would bind
    df_i positionally to the wrong terms — the stamped term list must
    reject it. Covers both builders (in-memory and stored-index) and
    the parquet round-trip of the stamp."""
    from seqarray_spark.operators.rank import (
        _query_terms,
        bm25_stats_from_index,
        stats_terms,
        write_bm25_stats,
    )

    wrong = bm25_stats(corpus, _query_terms("hash partitions"))
    with pytest.raises(ValueError, match="different term list"):
        bm25_topk(corpus, "spark join", k=10, stats=wrong)
    # reordered terms are positionally wrong too
    reordered = bm25_stats(corpus, _query_terms("join spark"))
    with pytest.raises(ValueError, match="different term list"):
        bm25_topk(corpus, "spark join", k=10, stats=reordered)
    # the stored-index builder stamps as well
    path = str(tmp_path / "bm25_index")
    write_bm25_stats(corpus, path)
    idx_wrong = bm25_stats_from_index(spark, path, _query_terms("lazy dog"))
    with pytest.raises(ValueError, match="different term list"):
        bm25_topk(corpus, "spark join", k=10, stats=idx_wrong)
    # the stamp survives a parquet round-trip (workload-amortized
    # stats are stored once, served many times)
    good = bm25_stats(corpus, _query_terms("spark join"))
    pq = str(tmp_path / "stats.parquet")
    good.write.parquet(pq)
    reloaded = spark.read.parquet(pq)
    assert stats_terms(reloaded) == ["spark", "join"]
    a = sorted(bm25_topk(corpus, "spark join", k=10).collect())
    b = sorted(bm25_topk(corpus, "spark join", k=10, stats=reloaded).collect())
    assert a == b


def test_rrf_fuse_beats_each_leg_on_planted_corpus(spark):
    """The hybrid payoff case: each leg is led by its own red herring
    (keyword-stuffed doc for BM25, near-duplicate-embedding doc for
    the semantic leg), while the truly relevant docs sit moderately
    high in BOTH legs. Fusion's precision@3 beats each leg's."""
    from seqarray_spark.operators.rank import rrf_fuse

    relevant = {1, 2, 3}
    # leg ranks: doc 100 = keyword spam (BM25 top, semantically
    # absent); doc 200 = embedding twin (semantic top, no keywords)
    bm = spark.createDataFrame(
        [(100, 1), (1, 2), (2, 3), (101, 4), (3, 5), (102, 6)],
        "doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [(200, 1), (2, 2), (3, 3), (201, 4), (1, 5), (202, 6)],
        "doc_id long, rank int",
    )

    def p_at_3(ranked_ids):
        return len(set(ranked_ids[:3]) & relevant) / 3.0

    fused = rrf_fuse([bm, sem], k=6)
    rows = fused.collect()
    got = [r["doc_id"] for r in rows]
    assert p_at_3([100, 1, 2]) == 2 / 3  # bm leg top-3
    assert p_at_3([200, 2, 3]) == 2 / 3  # sem leg top-3
    assert p_at_3(got) == 1.0, got  # fusion: all three relevant on top
    # docs ranked by both legs carry n_legs = 2 and outrank one-leg
    # red herrings despite those having rank 1
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["n_legs"] == 2 and by_id[100]["n_legs"] == 1
    assert got[:3] == [2, 1, 3]
    # rrf values are the exact unit-grid sums
    assert abs(by_id[2]["rrf"] - (1 / 63 + 1 / 62)) < 2e-12
    # deterministic tie-break: equal-rank singles order by doc_id
    assert got.index(100) < got.index(200)


def test_rrf_fuse_validation_and_single_leg(spark):
    import pytest

    from seqarray_spark.operators.rank import rrf_fuse

    with pytest.raises(ValueError, match=">= 1 ranked leg"):
        rrf_fuse([])
    leg = spark.createDataFrame(
        [(5, 1), (7, 2)], "doc_id long, rank int"
    )
    rows = rrf_fuse([leg], k=10).collect()
    assert [r["doc_id"] for r in rows] == [5, 7]
    assert all(r["n_legs"] == 1 for r in rows)
