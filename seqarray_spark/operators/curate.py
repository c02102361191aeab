"""Corpus-curation operators for training-data pipelines: sequence
packing into token-budget batches and deterministic stratified sampling.

These extend the engine's LLM-pipeline surface (dedup / similarity /
text analysis / multimodal) with the two remaining curation steps a
100 TB corpus runs before training: shaping documents into fixed-budget
training sequences, and drawing reproducible per-stratum samples.

Scale design: both operators are pure Column/window expressions — no
UDFs, no driver-side state. Packing windows are PARTITIONED BY SHARD
(never one global window, which would funnel the corpus through a
single partition); sampling uses a deterministic hash order so the same
fraction of every stratum is kept on any cluster size, any partitioning,
and re-runs are reproducible bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seqarray_spark.operators.text import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 16,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document to a training batch of ~`budget` tokens:
    documents are sharded by id hash, ordered deterministically within
    each shard, and cut greedily by running token count — a document
    joins the batch its predecessors' cumulative count falls in
    (floor(run_before / budget)). Documents are never split, so a batch
    can exceed the budget by (at most) its last member's length, and
    batch ids within a shard may have GAPS after an over-budget member
    (ids are budget-multiples consumed, not a dense counter). Output
    adds (shard, batch_id, n_tokens).

    The window is per-shard, so parallelism = `shards` regardless of
    corpus size and no global sort exists; shards pack independently,
    which is exactly how a distributed loader consumes them. Raise
    `shards` to taste — packing quality only needs each shard to hold
    many batches' worth of documents.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from seqarray_spark.operators.text import spread

    # token_count runs BEFORE the per-shard window exchange; widen the
    # scan so a narrow parquet doesn't tokenize on one core
    docs = spread(docs)
    toks = token_count(F.col(text_col))
    if shard_col is None:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int")
    else:
        # caller-supplied shard column (e.g. a modulus for cross-engine
        # reproducibility, or a source-file id for locality)
        shard = F.col(shard_col).cast("int")
    t = docs.withColumns({"n_tokens": toks, "shard": shard})
    w = Window.partitionBy("shard").orderBy(id_col)
    # batch = how many FULL budgets the preceding docs of the shard
    # consumed: a doc starts a new batch when its predecessor's running
    # total crossed the next budget multiple
    run_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return t.withColumn(
        "batch_id", F.floor(run_before / F.lit(budget)).cast("long")
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into token-window CHUNKS of `size` tokens
    with `overlap` tokens shared between neighbours (stride = size −
    overlap) — the standard training-prep / retrieval-index step
    between cleaning and packing: pack_sequences never splits a
    document, so over-long documents need chunking FIRST to fit a
    sequence budget, and retrieval corpora index chunks, not whole
    documents.

    Output (doc_id, chunk_ord, chunk_text, n_tokens): chunk_ord is
    0-based; chunk k covers tokens [k·stride, k·stride + size); every
    token lands in at least one chunk; the LAST chunk may be shorter
    but always reaches the document's end; a document with no tokens
    yields no rows. Tokens are the engine's lowercased word tokens
    (text.tokens — the same unit token_count/pack budgets count), and
    chunk_text rejoins them with single spaces, so chunking is
    deterministic and exactly replayable by a SQL oracle.

    Scale shape: ONE zero-shuffle projection — tokenize, explode a
    bounded per-row chunk-ordinal sequence, slice. No window, no join,
    no driver work; output rows ≈ corpus tokens / stride regardless of
    document skew (a 10^6-token doc fans out to 10^6/stride rows on
    its own partition, never through a groupBy)."""
    if size <= 0:
        raise ValueError("size must be positive")
    if not (0 <= overlap < size):
        raise ValueError("need 0 <= overlap < size (stride must be > 0)")
    from seqarray_spark.operators.text import spread, tokens

    # widen the scan so a narrow parquet doesn't tokenize on one core
    # (the same guard every tokenize-heavy op in this module applies)
    docs = spread(docs)
    stride = size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .otherwise(
            F.floor(
                (F.greatest(n - size, F.lit(0)) + stride - 1) / stride
            ).cast("int")
            + 1
        )
    )
    return (
        docs.select(
            F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc")
        )
        .where(F.col("__nc") > 0)
        .select(
            id_col,
            "__toks",
            F.explode(
                F.sequence(F.lit(0), F.col("__nc") - 1)
            ).alias("chunk_ord"),
        )
        .select(
            id_col,
            "chunk_ord",
            F.slice(
                "__toks", F.col("chunk_ord") * stride + 1, size
            ).alias("__ct"),
        )
        .select(
            id_col,
            "chunk_ord",
            F.array_join("__ct", " ").alias("chunk_text"),
            F.size("__ct").cast("int").alias("n_tokens"),
        )
    )


def sample_stratified(
    docs: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sample: keep ceil(fraction * |stratum|)
    rows of EVERY stratum, chosen by ascending md5(seed:id) — an
    order-free, partitioning-free, engine-portable coin. Unlike
    DataFrame.sample, per-stratum counts are exact (never off by
    binomial noise) and re-runs/engines agree row-for-row, which is what
    a reproducible corpus release needs."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    coin = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(coin, F.col(id_col))
    n = F.count(F.lit(1)).over(Window.partitionBy(strata_col))
    keep = F.row_number().over(w) <= F.ceil(n * F.lit(float(fraction)))
    return (
        docs.withColumn("__keep", keep)
        .where(F.col("__keep"))
        .drop("__keep")
    )


def domain_mix(
    docs: DataFrame,
    domain_col: str,
    budget_fraction: float = 0.3,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-reweighted domain mixture sampling — the standard
    training-mixture recipe (sample domain s with probability ∝ n_s^α,
    α=0.5): rare sources are upweighted relative to their raw share, so
    a dominant crawl domain cannot swamp the mixture.

    Determinism across engines and re-runs is engineered in: weights use
    the INTEGER sqrt of the domain count (FLOOR(SQRT(n_s)) — sqrt is
    IEEE-correctly-rounded in every engine, and all downstream products
    stay under 2^53), the per-domain target is
    LEAST(n_s, GREATEST(1, FLOOR(budget * isqrt_s / Σ isqrt))), and the
    kept rows are the target_s smallest md5(seed:id) coins — the same
    portable coin as sample_stratified. Every domain keeps ≥1 doc.

    Scale: the per-domain count is a tiny aggregate (|domains| rows)
    broadcast back; the only data-sized op is one window ranked by the
    coin within each domain. A single dominant domain makes that window
    partition large but never wider than the domain itself — for
    pathological single-domain corpora pre-split the domain or sample it
    with a plain hash threshold first.
    """
    if not (0.0 < budget_fraction <= 1.0):
        raise ValueError("budget_fraction must be in (0, 1]")
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # the unpartitioned window runs over the POST-AGGREGATION frame —
    # |domains| rows, not |docs| — so the single-partition funnel is tiny
    w_all = Window.partitionBy()
    targets = (
        counts.withColumn("__w", F.floor(F.sqrt(F.col("__n"))).cast("long"))
        .withColumn("__N", F.sum("__n").over(w_all))
        .withColumn("__tot_w", F.sum("__w").over(w_all))
        .withColumn(
            "__budget", F.floor(F.col("__N") * F.lit(float(budget_fraction))).cast("long")
        )
        .withColumn(
            "__target",
            F.least(
                F.col("__n"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.floor(F.col("__budget") * F.col("__w") / F.col("__tot_w")).cast(
                        "long"
                    ),
                ),
            ),
        )
        .select(domain_col, "__target")
    )
    coin = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(coin, F.col(id_col))
    return (
        docs.join(F.broadcast(targets), domain_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__target"))
        .drop("__rn", "__target")
    )


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with a PROBE set (eval/benchmark texts) — the standard
    n-gram-collision contamination test run before training. Returns
    (doc_id, n_matched_ngrams, n_probes) for contaminated docs only.

    Scale shape: the probe set is the small side by construction
    (benchmarks are MBs, the corpus is TBs), so its distinct shingles
    BROADCAST and the corpus side is one explode + broadcast-hash-join +
    one aggregation — the 100 TB table never shuffles for the join."""
    from seqarray_spark.operators.text import spread, word_shingles

    # widen a narrow scan before the CPU-heavy shingle pass — without
    # this a small parquet pins the whole corpus tokenization to one core
    docs = spread(docs)
    probe_sh = (
        probes.select(
            F.col(probe_id_col).alias("__pid"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), n))
            ).alias("__s"),
        )
        .distinct()
    )
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("__s"),
    )
    return (
        doc_sh.join(F.broadcast(probe_sh), "__s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched_ngrams"),
            F.countDistinct("__pid").alias("n_probes"),
        )
    )


# PII patterns, engine-portable: the Java-regex ∩ RE2 subset (character
# classes + quantifiers + alternation, no lookarounds/backrefs), so the
# exact same pattern strings run in Spark (Java regex) and any RE2
# engine (DuckDB, Go, C++) with identical matches.
PII_PATTERNS = {
    # user@host.tld — conservative: dot-atom local part, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # +1-555-123-4567 / (555) 123-4567 / 555.123.4567; optional country
    # code and parenthesized area code, bounded grouping so arbitrary
    # digit runs aren't eaten
    "phone": r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ]{1,2}[0-9]{3}[-. ]?[0-9]{4}",
    # dotted-quad IPv4 (over-matches 999.x octets on purpose — redaction
    # prefers recall; a version-bounded octet regex triples the pattern)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    # 13-19 digit runs with optional single separators — card-shaped
    "credit_card": r"[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{1,7}",
    # US SSN nnn-nn-nnnn (separator REQUIRED — a bare 9-digit run is
    # indistinguishable from ids/zip+4s and would mass-redact)
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    token: str = "[{kind}]",
) -> DataFrame:
    """Redact PII spans (emails, phones, IPv4s, card-shaped numbers,
    SSNs) from a text column — the standard scrub a corpus runs before
    training or release. Replaces `text_col` in place and appends
    `pii_found` (count of redacted spans, for filtering docs that are
    mostly PII).

    Pure Column regexp pipeline — whole-stage codegen, no UDFs, no
    shuffle: at 100 TB this runs at scan speed like the other text
    operators. Patterns apply in `kinds` order on the progressively
    redacted text, so overlapping matches resolve deterministically
    (e.g. in 'support@192.168.0.1.net' the email pattern consumes the
    whole address — including the embedded dotted quad — because
    'email' precedes 'ipv4').
    """
    from seqarray_spark.operators.text import spread

    kinds = list(PII_PATTERNS) if kinds is None else kinds
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds: {unknown}")
    docs = spread(docs)  # five regex passes — don't run them on one core
    scrubbed = F.col(text_col)
    found = F.lit(0)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        found = found + F.size(
            F.regexp_extract_all(scrubbed, F.lit(pat), 0)
        )
        scrubbed = F.regexp_replace(
            scrubbed, pat, token.format(kind=kind.upper())
        )
    return docs.withColumns(
        {text_col: scrubbed, "pii_found": found.cast("int")}
    )
