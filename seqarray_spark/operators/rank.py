"""Corpus ranking and data-mixture weighting for training-data pipelines:
BM25 keyword search and DSIR-style hashed-n-gram importance weights.

Both are extensions beyond the reference's surface (the LLM-pipeline
mandate): the operations a 100 TB curation run needs between dedup and
packing — find documents matching a probe query (contamination audit,
targeted inspection) and weight documents toward a target domain
(importance resampling a la DSIR, Xie et al. 2023, arXiv:2302.03169).

Scale contracts:

- ``bm25_topk`` is TWO corpus scans and zero joins/shuffles: one
  full-scan reduce for the collection statistics (N, avgdl, per-term
  document frequency — a 1-row result broadcast back), then one scoring
  projection + TakeOrderedAndProject. Per-term tf is
  ``size(filter(tokens, x -> x = term))`` — a Column expression inside
  whole-stage codegen, no explode (the naive inverted-index build
  explodes the corpus |tokens|x for a q-term query that only ever needs
  q counters per doc). At 100 TB the stats pass is amortizable across a
  query workload: pass precomputed ``stats=`` and it is ONE scan.
- ``dsir_logratios`` fits a bounded hashed-feature table (B <= 65536
  buckets, two conditional counts per bucket) in one explode+groupBy
  pass, then scores with a broadcast join + per-doc partial-agg sum.
  The fit output is O(B) regardless of corpus size; at 100 TB you fit
  on a sample (the paper does) and the score pass stays
  explode -> broadcast hash join -> partial agg, no wide shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seqarray_spark.operators.text import TOKEN_RE, spread, tokens


def _eq_term(term: str):
    """Single-arg lambda factory for F.filter. NOT `lambda x, t=t: ...`:
    PySpark reads a two-parameter lambda as the (element, index) form
    and binds the second param to the array INDEX column, silently
    overriding the default — the comparison would become x == index."""
    return lambda x: x == F.lit(term)


def _query_terms(query: str) -> list[str]:
    """Tokenize a probe query EXACTLY like the corpus tokenizer
    (lowercase + the shared TOKEN_RE), unique terms in first-seen order
    (BM25 sums over the query's distinct terms)."""
    seen: dict[str, None] = {}
    for t in re.findall(TOKEN_RE, query.lower()):
        seen.setdefault(t, None)
    return list(seen)


def _stamp_terms(stats: DataFrame, terms: list[str]) -> DataFrame:
    """Stamp the source query's term list onto a stats frame as schema
    metadata on a sentinel column (ADVICE r11): df_i columns bind
    POSITIONALLY, so bm25_topk must be able to verify the stats were
    built for ITS terms — column-name shape alone lets a same-length
    stats frame for a different query score silently wrong. Schema
    metadata is driver-side (zero jobs to read) and Spark persists it
    through parquet round-trips."""
    return stats.select(
        "*",
        F.lit(1).alias("_bm25_terms", metadata={"terms": list(terms)}),
    )


def stats_terms(stats: DataFrame) -> list[str] | None:
    """The term list a stats frame was built for (None if unstamped)."""
    try:
        meta = stats.schema["_bm25_terms"].metadata
    except KeyError:
        return None
    got = meta.get("terms")
    return [str(t) for t in got] if got is not None else None


def bm25_stats(docs: DataFrame, terms: list[str], text_col: str = "text") -> DataFrame:
    """One-row collection statistics for BM25: doc count, total token
    length (-> avgdl), and per-term document frequency. One full-scan
    reduce; the result is a single row suitable for ``F.broadcast``.
    The term list rides the schema (see _stamp_terms) so bm25_topk can
    reject a stats frame built for a different query."""
    docs = spread(docs)  # tokenizing the whole corpus on one core otherwise
    toks = tokens(text_col)
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size(toks).cast("long")).cast("double").alias("total_len"),
    ]
    for i, t in enumerate(terms):
        aggs.append(
            F.sum(F.array_contains(toks, t).cast("long")).cast("double").alias(f"df_{i}")
        )
    return _stamp_terms(docs.agg(*aggs), terms)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Okapi BM25 top-k over a documents table, Lucene's non-negative
    idf variant: score(d) = sum_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
    * (tf_t*(k1+1)) / (tf_t + k1*(1 - b + b*|d|/avgdl)).

    Returns (id, n_tokens, bm25) for the k best-scoring docs,
    deterministic order (bm25 DESC, id ASC); zero-score docs (no query
    term present — the +1 idf keeps every matching doc positive) are
    dropped rather than padding the tail with arbitrary rows.

    The scoring expression is pure Column math over the token array —
    tf via ``filter(tokens, x -> x = t)`` — so the hot pass is one
    codegen'd projection riding the scan, and the only other job is the
    1-row stats reduce (or none, when ``stats=`` is supplied from
    ``bm25_stats`` — the workload-amortized path)."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("BM25 query has no tokens under TOKEN_RE")
    if stats is None:
        stats = bm25_stats(docs, terms, text_col)
    else:
        # df_i columns bind POSITIONALLY to _query_terms(query): a stats
        # frame built for a DIFFERENT query (even one with the same
        # number of terms — the r11 advice case the column-shape check
        # missed) would score silently wrong, so the stamped term list
        # must match exactly — stats= callers must build via
        # bm25_stats(docs, _query_terms(query)) /
        # bm25_stats_from_index(index, query's terms)
        want = {"n_docs", "total_len", "_bm25_terms"} | {
            f"df_{i}" for i in range(len(terms))
        }
        have = set(stats.columns)
        if have != want:
            raise ValueError(
                "stats= frame does not match _query_terms(query): "
                f"expected exactly columns {sorted(want)}, got "
                f"{sorted(have)} — build it from the SAME query string "
                "via bm25_stats/bm25_stats_from_index. NOTE: stats "
                "frames persisted before the term stamp (_bm25_terms) "
                "was introduced must be rebuilt ONCE — an unstamped "
                "frame cannot prove which query its df_i columns bind "
                "to, which is exactly the silent-wrong-scoring case "
                "this check exists to prevent."
            )
        stamped = stats_terms(stats)
        if stamped != terms:
            raise ValueError(
                "stats= frame was built for a different term list: "
                f"stamped {stamped}, query needs {terms} — df_i columns "
                "bind positionally, so this would score silently wrong. "
                "Rebuild via bm25_stats/bm25_stats_from_index from the "
                "SAME query string."
            )
    docs = spread(docs)  # the scoring projection re-tokenizes every doc
    toks = tokens(text_col)
    scored = docs.select(id_col, toks.alias("_t")).crossJoin(F.broadcast(stats))
    dl = F.size("_t").cast("double")
    avgdl = F.col("total_len") / F.col("n_docs")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * (dl / avgdl)
    )
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.size(F.filter(F.col("_t"), _eq_term(t))).cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        score = score + idf * ((tf * F.lit(float(k1) + 1.0)) / (tf + norm))
    return (
        scored.select(
            F.col(id_col),
            F.size("_t").alias("n_tokens"),
            F.round(score, int(round_to)).alias("bm25"),
        )
        .where(F.col("bm25") > 0.0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(int(k))
    )


def bm25_topk_sql(
    query: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> str:
    """DuckDB oracle twin of ``bm25_topk`` — the same tokenizer, stats,
    and scoring expression spelled in ANSI-ish SQL (list lambdas for
    tf), so the engine/oracle comparison pins the full float pipeline."""
    terms = _query_terms(query)
    tok_re = TOKEN_RE.replace("'", "''")
    dfs = ", ".join(
        "SUM(CASE WHEN list_contains(t, '%s') THEN 1 ELSE 0 END)::DOUBLE AS df_%d"
        % (t.replace("'", "''"), i)
        for i, t in enumerate(terms)
    )
    score_terms = []
    for i, t in enumerate(terms):
        tq = t.replace("'", "''")
        tf = f"len(list_filter(t, x -> x = '{tq}'))::DOUBLE"
        idf = f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        norm = f"({k1!r} * ((1.0 - {b!r}) + {b!r} * ((len(t)::DOUBLE) / (total_len / n_docs))))"
        score_terms.append(f"{idf} * (({tf} * {float(k1) + 1.0!r}) / ({tf} + {norm}))")
    score = " + ".join(score_terms)
    return f"""
        WITH toks AS (
          SELECT {id_col}, regexp_extract_all(lower({text_col}), '{tok_re}') AS t
          FROM {table}
        ), stats AS (
          SELECT COUNT(*)::DOUBLE AS n_docs, SUM(len(t))::DOUBLE AS total_len, {dfs}
          FROM toks
        )
        SELECT {id_col}, len(t) AS n_tokens, round(0.0 + {score}, {int(round_to)}) AS bm25
        FROM toks CROSS JOIN stats
        WHERE round(0.0 + {score}, {int(round_to)}) > 0.0
        ORDER BY bm25 DESC, {id_col}
        LIMIT {int(k)}
    """


def _bigrams(toks):
    """Word-bigram features ('tok_i tok_i+1') as a Column expression.
    Guarded for < 2 tokens: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0], not empty, so the unguarded transform would fabricate
    features from 1-token docs. The token array is bind1-bound so the
    tokenizer runs once per row, not once per bigram."""
    from seqarray_spark.operators.text import bind1

    def _bg(t):
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind1(toks, _bg)


def dsir_logratios(
    docs: DataFrame,
    target_pred,
    n_buckets_hex: int = 4,
    alpha: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance log-ratios (Xie et al. 2023): hash each
    doc's word bigrams into 16^n_buckets_hex buckets (the first
    n_buckets_hex chars of md5 — the cross-engine hash), fit smoothed
    unigram bucket distributions for the TARGET slice (rows where
    ``target_pred`` holds) and the RAW corpus, and score every doc by
    sum over its feature occurrences of
    ln((tgt_b + a)/(T + a*B)) - ln((raw_b + a)/(R + a*B)).

    High log-ratio = looks like the target domain; importance
    resampling keeps docs with probability proportional to
    exp(logratio) (the caller's sampling policy — this operator is the
    weight computation, kept SQL-expressible for the oracle).

    Output: (id, n_feats, dsir_logratio) for every doc with >= 1 bigram
    (sub-2-token docs have no features and are excluded, matching the
    paper's n-gram model domain).

    Plan: fit = one explode + groupBy on a key space capped at B
    (<= 65536) -> bounded table; totals fold in via a second tiny agg
    over that table; score = explode + BROADCAST join on bucket +
    groupBy(id) partial-agg sum. No wide shuffle touches the corpus
    beyond the id-keyed partial agg; at 100 TB, fit on a sample and
    reuse (the fit table is O(B) and reusable across batches)."""
    n_b = 16 ** int(n_buckets_hex)
    docs = spread(docs)  # two tokenize+explode passes ride this scan
    toks = tokens(text_col)
    feats = docs.select(
        F.col(id_col),
        F.explode(_bigrams(toks)).alias("_f"),
        F.when(target_pred, F.lit(1)).otherwise(F.lit(0)).alias("_is_tgt"),
    ).select(
        id_col, F.substring(F.md5("_f"), 1, int(n_buckets_hex)).alias("_b"), "_is_tgt"
    )
    # persist the fit table: it is bounded (<= B = 16^n_buckets_hex
    # rows) but its lineage is a full tokenize+explode pass over the
    # corpus, and BOTH `totals` and `w` below read it — unpersisted,
    # Spark re-ran the whole corpus pass once per consumer (three
    # single-task tokenize passes measured at sf0.1; guide §5: cache
    # exactly the reused-and-expensive frame). Released with the
    # result via release_on_gc.
    fit = feats.groupBy("_b").agg(
        F.sum("_is_tgt").cast("double").alias("tgt_cnt"),
        F.count(F.lit(1)).cast("double").alias("raw_cnt"),
    ).persist()
    totals = fit.agg(
        F.sum("tgt_cnt").alias("T"), F.sum("raw_cnt").alias("R")
    )
    a = float(alpha)
    # Per-bucket weight quantized to integer micro-nats BEFORE the
    # per-doc sum: summing raw doubles is partition-order-dependent on
    # Spark but sequential in DuckDB, so the oracle hash would ride a
    # last-ulp coin flip. BIGINT sums are exact and order-free; the
    # final /1e6 is one deterministic double op. (round_to retained in
    # the signature for the quantization scale: units = 10^round_to.)
    scale = float(10 ** int(round_to))
    w = fit.crossJoin(F.broadcast(totals)).select(
        "_b",
        F.round(
            (
                F.log((F.col("tgt_cnt") + F.lit(a)) / (F.col("T") + F.lit(a * n_b)))
                - F.log((F.col("raw_cnt") + F.lit(a)) / (F.col("R") + F.lit(a * n_b)))
            )
            * F.lit(scale)
        )
        .cast("bigint")
        .alias("_w_units"),
    )
    from seqarray_spark.plans.lifecycle import release_on_gc

    out = (
        feats.join(F.broadcast(w), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            (F.sum("_w_units").cast("double") / F.lit(scale)).alias(
                "dsir_logratio"
            ),
        )
    )
    return release_on_gc(fit, out)


def dsir_logratios_sql(
    target_where: str,
    n_buckets_hex: int = 4,
    alpha: float = 0.01,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> str:
    """DuckDB oracle twin of ``dsir_logratios``. ``target_where`` is a
    SQL boolean over the table's columns (e.g. "source = 'src18'")."""
    n_b = 16 ** int(n_buckets_hex)
    tok_re = TOKEN_RE.replace("'", "''")
    a = float(alpha)
    return f"""
        WITH toks AS (
          SELECT {id_col}, regexp_extract_all(lower({text_col}), '{tok_re}') AS t,
                 CASE WHEN {target_where} THEN 1 ELSE 0 END AS is_tgt
          FROM {table}
        ), feats AS (
          SELECT {id_col}, substring(md5(array_to_string(t[i:i+1], ' ')), 1, {int(n_buckets_hex)}) AS b,
                 is_tgt
          FROM (SELECT {id_col}, t, is_tgt, UNNEST(generate_series(1, len(t)-1)) AS i
                FROM toks WHERE len(t) >= 2) z
        ), fit AS (
          SELECT b, SUM(is_tgt)::DOUBLE AS tgt_cnt, COUNT(*)::DOUBLE AS raw_cnt
          FROM feats GROUP BY b
        ), tot AS (
          SELECT SUM(tgt_cnt) AS T, SUM(raw_cnt) AS R FROM fit
        ), w AS (
          SELECT b, CAST(round((ln((tgt_cnt + {a!r}) / (T + {a * n_b!r}))
                   - ln((raw_cnt + {a!r}) / (R + {a * n_b!r}))) * {float(10 ** int(round_to))!r}) AS BIGINT) AS w_units
          FROM fit CROSS JOIN tot
        )
        SELECT f.{id_col}, COUNT(*) AS n_feats,
               CAST(SUM(w.w_units) AS DOUBLE) / {float(10 ** int(round_to))!r} AS dsir_logratio
        FROM feats f JOIN w ON f.b = w.b
        GROUP BY f.{id_col}
    """


def write_bm25_stats(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the BM25 collection statistics as a stored index —
    the serve-path twin of the dedup corpus indexes: a per-term
    document-frequency table plus a 1-row totals file. With it, ANY
    query runs in ONE corpus scan (the scoring projection): the
    per-query stats reduce becomes k lookups against the stored table
    (predicate-pushdown `term IN (...)` on a term-sorted parquet, so
    row groups prune). Terms the corpus never saw simply miss — df 0.

    Layout: `{path}/terms` (term string, df long; sorted by term) and
    `{path}/totals` (n_docs, total_len)."""
    toks = tokens(text_col)
    per_doc = docs.select(F.col(id_col), toks.alias("_t"))
    (
        per_doc.select(F.explode(F.array_distinct("_t")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/terms")
    )
    (
        per_doc.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.sum(F.size("_t").cast("long")).cast("double").alias("total_len"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/totals")
    )


def bm25_stats_from_index(spark, path: str, terms: list[str]) -> DataFrame:
    """Rebuild the 1-row stats frame bm25_topk expects from a stored
    write_bm25_stats index: a bounded k-row lookup (IN-filter pushed to
    the terms parquet) + the totals row — no corpus scan."""
    hits = {
        r["term"]: float(r["df"])
        for r in spark.read.parquet(f"{path}/terms")
        .where(F.col("term").isin(list(terms)))
        .collect()
    }
    tot = spark.read.parquet(f"{path}/totals").collect()[0]
    row = {"n_docs": float(tot["n_docs"]), "total_len": float(tot["total_len"])}
    for i, t in enumerate(terms):
        row[f"df_{i}"] = hits.get(t, 0.0)
    cols = ", ".join(f"{c} double" for c in row)
    return _stamp_terms(
        spark.createDataFrame([tuple(row.values())], cols), terms
    )


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 20,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    unit_scale: int = 12,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval
    legs — the hybrid keyword+semantic serving shape: each leg is a
    ranked frame (id_col, rank with rank 1-based; extra columns
    ignored), fused by

        rrf(d) = sum_legs 1 / (k_rrf + rank_leg(d))

    with k_rrf = 60 (the published default). Per-leg contributions are
    quantized to the half-up 1e-unit_scale integer grid, so the fused
    score is an exact BIGINT sum — aggregation-order-free across any
    number of legs — and the top-k order (units DESC, id ASC) is fully
    deterministic; a doc absent from a leg simply contributes nothing
    (the standard RRF treatment). n_legs reports how many legs ranked
    each survivor.

    Scale shape: legs are top-N frames (bounded), so the union +
    id-keyed agg is tiny regardless of corpus size — all the heavy
    lifting happened inside the legs. Output (id, n_legs, rrf),
    rrf on the unit grid."""
    if not legs:
        raise ValueError("rrf_fuse needs >= 1 ranked leg")
    scale = float(10 ** int(unit_scale))
    u = (
        F.round(
            F.lit(scale)
            / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))
        )
        .cast("bigint")
        .alias("_u")
    )
    parts = [df.select(F.col(id_col), u) for df in legs]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    return (
        allr.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_legs"),
            F.sum("_u").alias("_su"),
        )
        .orderBy(F.col("_su").desc(), F.col(id_col))
        .limit(int(k))
        .select(
            id_col,
            "n_legs",
            (F.col("_su").cast("double") / F.lit(scale)).alias("rrf"),
        )
    )
