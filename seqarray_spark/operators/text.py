"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

These extend the reference's surface (BASELINE.json north star): every
operator is a pure Column expression pipeline — no UDFs — so a 100 TB
documents table runs them inside whole-stage codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"[a-z0-9']+"

# tiny deterministic stopword inventories for n-gram-free language ID
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "des", "que"],
    "es": ["el", "la", "los", "las", "es", "no", "un", "una", "que", "por"],
}


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to the cluster's parallelism before a
    CPU-heavy text projection (tokenize/shingle/hash). A small parquet
    arrives as one split, which would pin the whole pass to a single
    core; a corpus already wider than the core count passes through
    untouched, so this adds no shuffle at scale.

    For file-backed frames the width estimate uses source-file metadata
    only (inputFiles + driver-side stat, bounded to < parallelism
    files); it repartitions only when the scan is PROVABLY narrow —
    a file whose size can't be stat'd locally (remote scheme, escaped
    path) makes the width unknown and the frame passes through, so a
    wide s3/hdfs corpus is never forced down to defaultParallelism.
    Non-file sources (JDBC, coalesced/checkpointed frames) fall back to
    the partition count — the one case that still pays the
    rdd-lineage-conversion cost, since no metadata can answer it."""
    import os
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = None
    if files is None or (files == [] and df.isStreaming):
        return df
    if not files:
        # non-file source: partition count is the only width signal
        return df.repartition(want) if df.rdd.getNumPartitions() < want else df
    if len(files) >= want:
        return df
    # few files: estimate scan splits from sizes vs maxPartitionBytes
    # (accepts Spark's byte-suffix forms: 134217728, 128m, 1g, 64kb)
    mpb_conf = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    ).lower().strip()
    try:
        s = mpb_conf.rstrip("b")
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(s[-1:], 1)
        mpb = int(s.rstrip("kmg") or "0") * mult or (128 << 20)
    except ValueError:
        mpb = 128 << 20
    splits = 0
    for p in files:
        u = urlparse(p)
        if u.scheme not in ("file", ""):
            return df  # remote store: width unknowable from the driver
        try:
            size = os.path.getsize(unquote(u.path) if u.scheme else p)
        except OSError:
            return df  # can't prove the scan is narrow — don't shuffle
        splits += max(1, -(-size // mpb))
    if splits < want:
        return df.repartition(want)
    return df


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: str | Column) -> Column:
    """Lowercased word tokens (whitespace+punct splitting via regex)."""
    return F.regexp_extract_all(F.lower(_col(text)), F.lit(TOKEN_RE), 0)


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text)).cast("int")


def bind1(col: Column, f) -> Column:
    """Evaluate `col` ONCE per row and hand it to `f` as a bound
    higher-order-function lambda variable.

    Catalyst's subexpression elimination does not reach inside lambda
    bodies, so an expression like transform(seq, i -> slice(TOKS, i, n))
    re-evaluates TOKS — the full regexp tokenization — PER ELEMENT: on
    the sf0.1 documents table that made every shingle/window builder
    ~4-5x slower (measured 3.4s -> 0.7-1.0s for a 5-gram explode).
    Wrapping the value as the element of a 1-element transform turns it
    into a NamedLambdaVariable, which nested lambdas read as a plain
    variable. Works inside arbitrary expressions — no extra projection
    step at call sites."""
    return F.transform(F.array(col), f)[0]


def word_shingles(text: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles — the unit of near-dup detection."""

    def _sh(toks):
        return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )

    return bind1(tokens(text), _sh)


def quality_features(docs: DataFrame, text_col: str = "text",
                     prefix: int = 8192) -> DataFrame:
    """Heuristic quality metrics (length, word stats, punctuation/digit
    ratios, stopword ratio, repetition) — the standard pre-training
    corpus filters.

    All per-character metrics are computed over the first `prefix`
    characters so per-document cost is O(1) regardless of document
    length (a 100 MB outlier document costs the same as a tweet);
    n_chars_q still reports the FULL length. Quality heuristics are
    statistical — a bounded sample is the semantics, not a shortcut."""
    docs = spread(docs)
    t = F.substring(F.col(text_col), 1, prefix)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    uniq = F.size(F.array_distinct(toks))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return docs.withColumns(
        {
            "n_chars_q": F.length(F.col(text_col)).cast("int"),
            "n_tokens": n_tok.cast("int"),
            "mean_word_len": F.when(
                n_tok > 0,
                (
                    F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
                    / n_tok.cast("double")
                ),
            ),
            "digit_ratio": F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
                / n_chars.cast("double"),
            ),
            "punct_ratio": F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
                / n_chars.cast("double"),
            ),
            "stopword_ratio": F.when(
                n_tok > 0, n_stop.cast("double") / n_tok.cast("double")
            ),
            "unique_ratio": F.when(
                n_tok > 0, uniq.cast("double") / n_tok.cast("double")
            ),
        }
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: rewards mid-length docs with diverse
    vocabulary and low digit/punct noise. All exact integer/ratio math so
    scores are reproducible across engines."""
    feats = quality_features(docs, text_col)
    score = (
        F.when(F.col("n_tokens") >= 20, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("unique_ratio") >= 0.3, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("digit_ratio") <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return feats.withColumn("quality_score", score)


def lang_guess(docs: DataFrame, text_col: str = "text",
               prefix: int = 8192) -> DataFrame:
    """Stopword-inventory language ID (n-gram-heuristic family): count
    stopword hits per language, take the argmax; CJK scripts detected by
    Unicode block — kana -> 'ja' (checked first, since Japanese text
    mixes kana with Han), Hangul syllables -> 'ko', Han-only -> 'zh'.
    Deterministic tie-break by language code order.

    Cost is bounded two ways: everything is computed over the first
    `prefix` characters (language is a document-level property — a
    bounded sample IS the semantics, and per-doc cost stays O(1) at any
    corpus shape), and script detection uses rlike EXISTENCE tests,
    which short-circuit on the first matching character instead of
    rebuilding the string per script."""
    docs = spread(docs)
    t = F.substring(F.col(text_col), 1, prefix)
    toks = tokens(t)
    hits = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    # kana LETTERS only (hiragana U+3041-3096, katakana U+30A1-30F6):
    # the katakana block's middle dot / prolonged mark (U+30FB/U+30FC)
    # appear in Chinese transliterations and must not flip zh -> ja
    kana = t.rlike("[ぁ-ゖァ-ヶ]")
    hangul = t.rlike("[가-힣]")
    han = t.rlike("[一-鿿]")
    best = F.greatest(*[hits[lang] for lang in sorted(STOPWORDS)])
    guess = (
        F.when(kana, F.lit("ja"))
        .when(hangul, F.lit("ko"))
        .when(han, F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
    )
    for lang in sorted(STOPWORDS):  # alphabetical tie-break
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return docs.withColumn("lang_guess", guess)


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 8, n: int = 3) -> DataFrame:
    """Document fingerprint: md5 over the k smallest shingle hashes
    (min-k sketch — the order-free analogue of winnowing/rolling hashes).
    Documents sharing most shingles collide with high probability."""
    docs = spread(docs)
    sh = word_shingles(text_col, n)
    hashes = F.sort_array(F.transform(F.array_distinct(sh), lambda s: F.md5(s)))
    mink = F.slice(hashes, 1, k)
    return docs.withColumn("fingerprint", F.md5(F.concat_ws(",", mink)))


# GPT-2-style pre-tokenizer approximation, engine-portable (plain RE2 ∩
# Java regex — alternation + character classes, no lookarounds):
# contractions, space-prefixed letter runs, digit runs, punct runs,
# residual whitespace. Counts track BPE pre-token counts closely enough
# for budgeting (each pre-token maps to >=1 BPE token).
BPE_ISH_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9\\t\\n\\r]+|[ \\t\\n\\r]+"
)


def token_count_bpe(text: str | Column) -> Column:
    """BPE-ish pre-token count (the budgeting proxy an LLM pipeline
    uses before a real tokenizer is in the loop)."""
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(BPE_ISH_RE), 0)
    ).cast("int")


def token_count_ws(text: str | Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("int")


def lm_score(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", prefix: int = 8192) -> DataFrame:
    """Unigram language-model quality score (the CCNet-style corpus
    filter): score each document by the mean negative log-probability of
    its tokens under the CORPUS'S OWN unigram distribution. Documents
    full of rare/garbage tokens score high (worse); formulaic boilerplate
    scores low. Appends `lm_nll DOUBLE` (NULL for token-less docs).

    Plan shape: one explode + one groupBy builds the vocab frequency
    table, which BROADCASTS back onto the token stream (vocab is
    sublinear in corpus size), then one groupBy per doc — two
    corpus-scale shuffles total, no UDFs. Tokens come from the first
    `prefix` chars like the other statistical text metrics (bounded
    per-doc cost). At extreme vocab (100 TB of multilingual web text),
    cap the table to top-K tokens + an OOV floor before broadcasting;
    the full-vocab default matches the exact oracle.
    """
    docs = spread(docs)
    t = F.substring(F.col(text_col), 1, prefix)
    toks = docs.select(F.col(id_col).alias("__id"), F.explode(tokens(t)).alias("__t"))
    freq = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    total = freq.agg(F.sum("__c").alias("__n"))
    scored = (
        toks.join(F.broadcast(freq), "__t")
        .crossJoin(F.broadcast(total))
        .groupBy("__id")
        .agg(
            F.avg(
                -F.log(F.col("__c").cast("double") / F.col("__n").cast("double"))
            ).alias("lm_nll")
        )
    )
    return docs.join(scored, docs[id_col] == scored["__id"], "left").drop("__id")


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       prefix: int = 8192) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public
    recipe): per document, the duplicate fraction of word 2-grams and
    3-grams (1 - distinct/total) and the fraction of prefix characters
    covered by the single most frequent 2-gram. Highly repetitive docs
    (boilerplate, keyword stuffing, degenerate generations) light up all
    three.

    Plan shape: pure Column expressions, ZERO shuffles — the mode
    2-gram is found by sorting each doc's shingle array and folding a
    (prev, run, best, best_gram) struct accumulator over it (runs of a
    sorted array ARE the counts), so the whole thing rides the scan.
    Ties break to the lexicographically larger gram, matching the
    oracle's ORDER BY cnt DESC, gram DESC. Metrics are computed over the
    first `prefix` chars like every statistical text metric here (O(1)
    per doc); NULL where a doc has too few tokens to form a gram.
    """
    docs = spread(docs)
    t = F.substring(F.col(text_col), 1, prefix)

    # Spark does not subexpression-eliminate lambda-bearing expressions
    # — every REFERENCE to a fold re-runs it, and every metric written
    # independently re-tokenizes the prefix. Two counters fix both:
    # (1) the mode fold also counts elements and runs (runs of a sorted
    #     array ARE the distinct count), and its `finish` lambda turns
    #     the accumulator straight into the two 2-gram metrics, so
    #     tokenize+sort+fold happens once;
    # (2) the one-element explode below is a Generate barrier, so
    #     CollapseProject cannot inline the metrics struct back into
    #     the three output columns (which would triple-evaluate it).
    sh2 = F.array_sort(word_shingles(t, 2))
    n_chars = F.length(t)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best"), F.lit("").alias("bg"),
        F.lit(0).alias("nd"), F.lit(0).alias("n"),
    )

    def step(acc, x):
        # the first element always opens a run (prev='' never equals a
        # gram: grams are non-empty)
        fresh = x != acc["prev"]
        run = F.when(fresh, F.lit(1)).otherwise(acc["run"] + 1)
        better = (run > acc["best"]) | ((run == acc["best"]) & (x > acc["bg"]))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bg"]).alias("bg"),
            (acc["nd"] + fresh.cast("int")).alias("nd"),
            (acc["n"] + 1).alias("n"),
        )

    def finish(acc):
        n2 = acc["n"]
        return F.struct(
            F.when(
                n2 > 0,
                F.lit(1.0) - acc["nd"].cast("double") / n2.cast("double"),
            ).alias("d2"),
            F.when(
                (n2 > 0) & (n_chars > 0),
                (acc["best"] * F.length(acc["bg"])).cast("double")
                / n_chars.cast("double"),
            ).alias("topf"),
        )

    sh3 = word_shingles(t, 3)
    n3 = F.size(sh3)
    metrics = F.struct(
        F.aggregate(sh2, zero, step, finish).alias("g2"),
        F.when(
            n3 > 0,
            F.lit(1.0) - F.size(F.array_distinct(sh3)).cast("double")
            / n3.cast("double"),
        ).alias("d3"),
    )
    return (
        docs.select("*", F.explode(F.array(metrics)).alias("__m"))
        .withColumns(
            {
                "dup_2gram_frac": F.col("__m.g2.d2"),
                "dup_3gram_frac": F.col("__m.d3"),
                "top_2gram_char_frac": F.col("__m.g2.topf"),
            }
        )
        .drop("__m")
    )


def boilerplate_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Cross-document boilerplate detection: the fraction of a doc's
    distinct word `shingle_n`-grams that are HOT — appearing in at
    least `min_df` documents (shared headers/footers/disclaimers, the
    spans corpus-curation pipelines strip before training). Per doc:
    (n_shingles, n_hot, boilerplate_frac = n_hot/n_shingles, NULL for
    docs shorter than shingle_n tokens). Complements
    repetition_signals, which is WITHIN-doc (a doc repeating itself);
    this is ACROSS docs (many docs repeating each other).

    Plan shape: one explode of distinct shingles, document frequency
    via a count window over the shingle (ONE shuffle — the same trick
    as ngram_jaccard_pairs' prefix build), one groupBy(doc) for the
    per-doc tallies, and an id-keyed left join back to docs for the
    zero-shingle rows. No all-pairs anything: cost is O(total
    shingles), shuffle keys are the shingles themselves (near-uniform;
    the hot ones by definition have heavy groups, but a group is just
    a count — partial aggregation absorbs the skew... the window path
    sorts within shingle partitions, equivalent work)."""
    from pyspark.sql.window import Window

    docs = spread(docs)
    sh = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(word_shingles(text_col, shingle_n))
        ).alias("__s"),
    )
    w = Window.partitionBy("__s")
    agg = (
        sh.withColumn("__df", F.count(F.lit(1)).over(w))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("__df") >= int(min_df)).cast("long")
            ).alias("n_hot"),
        )
    )
    return (
        docs.join(agg, docs[id_col] == agg["__id"], "left")
        .select(
            *docs.columns,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hot", F.lit(0)).alias("n_hot"),
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_hot").cast("double") / F.col("n_shingles"),
            ).alias("boilerplate_frac"),
        )
    )
