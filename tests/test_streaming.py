"""Structured Streaming surface: streaming VCF ingest, windowed rollups,
sessionization (extension beyond the batch-only reference)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from seqarray_spark.streaming import ingest as S

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "toy.vcf")


def test_stream_vcf_ingest(spark, tmp_path):
    from seqarray_spark.sources.vcf import parse_vcf_header, read_vcf

    header = parse_vcf_header(FIXTURE)
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    shutil.copy(FIXTURE, f"{in_dir}/part1.vcf")

    variants, calls = S.stream_vcf(spark, in_dir, header)
    assert variants.isStreaming and calls.isStreaming

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for q in S.write_stream_dataset(variants, calls, out, ck):
        q.awaitTermination()

    got_v = spark.read.parquet(f"{out}/variants.parquet")
    got_c = spark.read.parquet(f"{out}/calls.parquet")
    batch = read_vcf(spark, FIXTURE, assign_ids="hash")
    assert got_v.count() == batch.variants.count()
    assert got_c.count() == batch._base_calls.count()
    # hash ids line up between the batch and streaming parses
    a = {r["variant_id"] for r in got_v.collect()}
    b = {r["variant_id"] for r in batch.variants.collect()}
    assert a == b


def test_windowed_event_counts(spark, sf_dir):
    ev = S.stream_events(spark, sf_dir)
    agg = S.windowed_event_counts(ev, window="1 hour")
    out = S.run_stream_to_memory(agg, "win_counts", mode="complete")
    rows = out.collect()
    assert len(rows) > 0
    # streaming result == batch result over the same data
    from seqarray_spark.sources.testdata import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sum(r["n"] for r in rows) == batch.agg(F.sum("n")).first()[0]


def test_stream_events_ts_pinned_to_utc(spark, sf_dir):
    """NTZ event times are pinned to UTC regardless of the session
    timezone — a bare cast would shift every watermark/window by the
    zone offset. Compare pure epoch seconds (instant identity) computed
    inside Spark, so no tz-dependent datetime rendering is involved."""
    from seqarray_spark.sources.testdata import load_table

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    # expected: min NTZ wall-clock interpreted as UTC, floored to the hour
    lo_epoch = (
        load_table(spark, sf_dir, "events")
        .select(F.min(F.unix_timestamp(
            F.from_utc_timestamp(F.col("ts").cast("timestamp"), tz0)
        )).alias("e"))
        .first()["e"]
    )
    expected = (lo_epoch // 3600) * 3600
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = S.stream_events(spark, sf_dir)
        agg = S.windowed_event_counts(ev, window="1 hour")
        epochs = agg.select(
            F.unix_timestamp(F.col("window_start")).alias("epoch")
        )
        rows = S.run_stream_to_memory(epochs, "tz_counts", mode="complete").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert rows and min(r["epoch"] for r in rows) == expected


def test_dedup_stream(spark, sf_dir, tmp_path):
    """A re-delivered file (at-least-once source) dedups to exactly the
    distinct event ids, with state bounded by the watermark."""
    import os
    import shutil

    src = f"{sf_dir}/events.parquet"
    n_distinct = spark.read.parquet(src).select("event_id").distinct().count()
    in_dir = str(tmp_path / "redelivered")
    os.makedirs(in_dir)
    if os.path.isfile(src):
        shutil.copy(src, f"{in_dir}/a.parquet")
        shutil.copy(src, f"{in_dir}/b.parquet")
    else:  # directory-shaped parquet: link it twice
        for name in ("a", "b"):
            os.symlink(os.path.abspath(src), f"{in_dir}/{name}")
    schema = spark.read.parquet(src).schema
    ev = spark.readStream.schema(schema).parquet(in_dir)
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    out = S.dedup_stream(ev, keys=("event_id",))
    rows = S.run_stream_to_memory(out, "dedup_events", mode="append").collect()
    assert len(rows) == n_distinct


def test_running_user_stats_stateful(spark, sf_dir):
    """applyInPandasWithState custom operator: final state equals the
    batch aggregate."""
    ev = S.stream_events(spark, sf_dir)
    stats = S.running_user_stats(ev)
    out = S.run_stream_to_memory(stats, "user_stats", mode="update")
    # update mode may emit several rows per user across batches; the last
    # (max) value per user is the final state
    rows = out.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    got = {r["user_id"]: r["n"] for r in rows}
    from seqarray_spark.sources.testdata import load_table

    batch = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


def test_sessionize(spark, sf_dir):
    ev = S.stream_events(spark, sf_dir)
    sess = S.sessionize_events(ev, gap="30 minutes")
    out = S.run_stream_to_memory(sess, "sessions", mode="complete")
    rows = out.limit(5).collect()
    assert rows and all(r["n_events"] >= 1 for r in rows)


def test_ingest_dedup_stream_cross_batch(spark, tmp_path):
    """foreachBatch corpus ingest: exact dedup against the WHOLE corpus
    ever ingested (disk-index state, not a watermark horizon) —
    cross-batch dups drop with corpus-first precedence, batch-internal
    dups keep the min id, and the final corpus equals a batch
    exact_dedup over the concatenated batches under monotone ids."""
    import json

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    # batch files processed one per micro-batch (maxFilesPerTrigger=1;
    # lexicographic file order pins which batch is 'first')
    b1 = [(1, "alpha"), (2, "beta"), (3, "alpha")]       # 3 dups 1
    b2 = [(10, "beta"), (11, "gamma"), (12, "gamma")]    # 10 dups 2, 12 dups 11
    for name, rows in (("a.json", b1), ("b.json", b2)):
        with open(in_dir / name, "w") as fh:
            for i, t in rows:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    corpus_dir = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    spark.sql("DROP TABLE IF EXISTS ingest_idx_test")
    try:
        q = S.ingest_dedup_stream(
            stream, corpus_dir, "ingest_idx_test",
            checkpoint_dir=ck, n_buckets=4,
        )
        q.awaitTermination()
        got = {(r["doc_id"], r["text"])
               for r in spark.read.parquet(corpus_dir).collect()}
        assert got == {(1, "alpha"), (2, "beta"), (11, "gamma")}
        idx = {r["content_md5"]: r["corpus_id"]
               for r in spark.table("ingest_idx_test").collect()}
        assert set(idx.values()) == {1, 2, 11}
        # equivalence with a batch re-run (monotone ids across batches)
        from seqarray_spark.operators.dedup import exact_dedup

        full = spark.createDataFrame(b1 + b2, "doc_id long, text string")
        want = {(r["doc_id"], r["text"]) for r in exact_dedup(full).collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ingest_idx_test")


def test_ingest_neardup_stream_cross_batch(spark, tmp_path):
    """foreachBatch NEAR-dup corpus ingest over the stored band index:
    cross-batch near-dups drop with corpus-first precedence,
    batch-internal near-dups keep the min id, distinct-vocab docs all
    survive, and the band index holds exactly the kept docs' keys."""
    import json

    # 26-word bases with one APPENDED word: jaccard 0.96, verified to
    # collide in >=1 of the 4 LSH bands with these exact md5-derived
    # signatures (LSH collision at s<1 is probabilistic over texts but
    # deterministic per text — shorter/less-similar variants measured
    # here can miss, e.g. 14-word s=0.85 pairs)
    base1 = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu")
    near1a = base1 + " aaa"
    near1b = base1 + " bbb"
    other = ("red orange yellow green blue indigo violet cyan magenta "
             "teal maroon olive navy silver gold bronze copper pearl "
             "ruby amber jade coral ivory onyx slate plum")
    base2 = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen "
             "eighteen nineteen twenty twentyone twentytwo twentythree "
             "twentyfour twentyfive twentysix")
    near2 = base2 + " ccc"

    b1 = [(1, base1), (2, near1a), (3, other)]      # 2 near-dups 1
    b2 = [(10, near1b), (11, base2), (12, near2)]   # 10 ~ corpus 1; 12 ~ 11
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    for name, rows in (("a.json", b1), ("b.json", b2)):
        with open(in_dir / name, "w") as fh:
            for i, t in rows:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    corpus_dir = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    spark.sql("DROP TABLE IF EXISTS neardup_idx_test")
    try:
        q = S.ingest_neardup_stream(
            stream, corpus_dir, "neardup_idx_test",
            checkpoint_dir=ck, n_buckets=4,
        )
        q.awaitTermination()
        got = {(r["doc_id"], r["text"])
               for r in spark.read.parquet(corpus_dir).collect()}
        assert got == {(1, base1), (3, other), (11, base2)}
        # index covers exactly the kept docs (4 band keys each)
        idx = spark.table("neardup_idx_test")
        assert {r["__cid"] for r in idx.select("__cid").collect()} == {1, 3, 11}
        assert idx.count() == 3 * 4
    finally:
        spark.sql("DROP TABLE IF EXISTS neardup_idx_test")


def test_ingest_dedup_stream_with_compaction(spark, tmp_path):
    """compact_every=K inside the ingest loop: identical corpus result,
    and the index lands at ONE file per bucket (the layout whose stored
    sort Spark trusts — plan-asserted in test_plans) instead of one per
    batch."""
    import glob
    import json

    b1 = [(1, "alpha"), (2, "beta"), (3, "alpha")]
    b2 = [(10, "beta"), (11, "gamma"), (12, "gamma")]
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    for name, rows in (("a.json", b1), ("b.json", b2)):
        with open(in_dir / name, "w") as fh:
            for i, t in rows:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    corpus_dir = str(tmp_path / "corpus")
    spark.sql("DROP TABLE IF EXISTS ingest_idx_compact")
    try:
        q = S.ingest_dedup_stream(
            stream, corpus_dir, "ingest_idx_compact",
            checkpoint_dir=str(tmp_path / "ck"), n_buckets=4,
            compact_every=1,
        )
        q.awaitTermination()
        got = {r["doc_id"]
               for r in spark.read.parquet(corpus_dir).collect()}
        assert got == {1, 2, 11}
        loc = [
            r["data_type"]
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED ingest_idx_compact"
            ).collect()
            if r["col_name"] == "Location"
        ][0].replace("file:", "")
        files = glob.glob(f"{loc}/part-*")
        # one file per non-empty bucket, never one per batch per bucket
        buckets = {f.rsplit("_", 1)[1].split(".")[0] for f in files}
        assert len(files) == len(buckets), files
    finally:
        spark.sql("DROP TABLE IF EXISTS ingest_idx_compact")
        spark.sql("DROP TABLE IF EXISTS ingest_idx_compact__compacting")


def test_ingest_semantic_stream_cross_batch(spark, tmp_path):
    """foreachBatch SEMANTIC corpus ingest over the stored cell index
    (the embedding sibling of the near-dup loop): cross-batch semantic
    dups drop with corpus-first precedence, batch-internal dups keep
    the min id, distinct-direction vectors all survive, and the index
    holds exactly the kept vectors' keys (bands keys each)."""
    import json

    dim = 8
    ax = lambda i, eps=0.0: [  # noqa: E731
        (1.0 if d == i else 0.0) + (eps if d == (i + 1) % dim else 0.0)
        for d in range(dim)
    ]
    # cells: 2 fixed orthogonal centroids
    cents = [(0, ax(0)), (1, ax(4))]
    b1 = [(1, ax(0)), (2, ax(0, 0.01)), (3, ax(4))]      # 2 ~ 1 in cell 0
    b2 = [(10, ax(0, 0.02)), (11, ax(4, 0.5)), (12, ax(4, 0.502))]
    # 10 ~ corpus 1 (cell 0); 12 ~ 11 (batch-internal, cell 1)
    in_dir = tmp_path / "emb_in"
    in_dir.mkdir()
    for name, rows in (("a.json", b1), ("b.json", b2)):
        with open(in_dir / name, "w") as fh:
            for i, v in rows:
                fh.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    corpus_dir = str(tmp_path / "emb_corpus")
    spark.sql("DROP TABLE IF EXISTS sem_idx_test")
    try:
        q = S.ingest_semantic_stream(
            stream, corpus_dir, "sem_idx_test", cents,
            checkpoint_dir=str(tmp_path / "ck"), tau=0.9, n_buckets=4,
        )
        q.awaitTermination()
        got = {r["vec_id"]
               for r in spark.read.parquet(corpus_dir).collect()}
        assert got == {1, 3, 11}
        idx = spark.table("sem_idx_test")
        assert {r["__cid"] for r in idx.select("__cid").collect()} == {1, 3, 11}
        assert idx.count() == 3 * 8  # default bands=8 keys per vector
    finally:
        spark.sql("DROP TABLE IF EXISTS sem_idx_test")


def test_ingest_pq_codes_stream_appends_equal_rebuild(spark, tmp_path):
    """ANN-index ingest loop: two micro-batches of vectors append their
    (residual) PQ codes under the cells-partitioned layout; the
    resulting index must row-for-row equal a one-shot
    write_pq_codes_index rebuild over the union, and ivf_pq_topk over
    the appended index must equal the encode-on-the-fly path — i.e.
    the stream keeps the production index fresh with NO rebuild."""
    import json

    import numpy as np

    from seqarray_spark.operators import similarity as SIM

    rng = np.random.RandomState(3)
    dim, m = 16, 4
    vecs = {i: [float(x) for x in rng.randn(dim)] for i in range(40)}
    cents = [vecs[0], vecs[1], vecs[2]]
    # residual codebook from vectors 3..6 (engine-rule cells)
    cb_rows = []
    emb_all = spark.createDataFrame(
        sorted(vecs.items()), "vec_id long, embedding array<float>"
    )
    cells = {r["vec_id"]: r["c"] for r in emb_all.select(
        "vec_id", SIM.cell_assign_expr(cents).alias("c")).collect()}
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in emb_all.collect()}  # float32-rounded values
    for code, vid in enumerate(range(3, 7)):
        res = [a - b for a, b in zip(stored[vid], cents[cells[vid]])]
        for j in range(m):
            cb_rows.append((j, code, res[j * 4:(j + 1) * 4]))
    cbk = spark.createDataFrame(
        cb_rows, "sub_ord int, code int, cvec array<double>"
    )

    in_dir = tmp_path / "pq_in"
    in_dir.mkdir()
    for name, ids in (("a.json", range(0, 20)), ("b.json", range(20, 40))):
        with open(in_dir / name, "w") as fh:
            for i in ids:
                fh.write(json.dumps(
                    {"vec_id": i, "embedding": vecs[i]}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    idx_dir = str(tmp_path / "pq_idx_stream")
    q = S.ingest_pq_codes_stream(
        stream, idx_dir, cents, cbk, m=m, residual=True,
        checkpoint_dir=str(tmp_path / "ck_pq"),
    )
    q.awaitTermination()

    rebuilt_dir = str(tmp_path / "pq_idx_rebuild")
    SIM.write_pq_codes_index(
        emb_all, cents, cbk, m=m, path=rebuilt_dir, residual=True
    )
    key = lambda r: (r["vec_id"], list(r["codes"]), r["dist"],  # noqa: E731
                     r["ivf_cell"])
    got = sorted(map(key, spark.read.parquet(idx_dir).collect()))
    want = sorted(map(key, spark.read.parquet(rebuilt_dir).collect()))
    assert got == want and len(got) == 40

    qv = vecs[5]
    via_stream_idx = [(r["vec_id"], r["adc_dist"]) for r in SIM.ivf_pq_topk(
        None, qv, cents, cbk, m=m, k=10, nprobe=2,
        codes=spark.read.parquet(idx_dir), residual=True).collect()]
    via_emb = [(r["vec_id"], r["adc_dist"]) for r in SIM.ivf_pq_topk(
        emb_all, qv, cents, cbk, m=m, k=10, nprobe=2,
        residual=True).collect()]
    assert via_stream_idx == via_emb and len(via_emb) == 10


def test_compact_pq_codes_index_one_file_per_cell(spark, tmp_path):
    """compact_every on the ANN-index loop: streamed appends leave one
    file per touched cell per batch; compaction rewrites to exactly
    ONE file per cell with identical rows, and the query path is
    unchanged."""
    import glob
    import json

    import numpy as np

    from seqarray_spark.operators import similarity as SIM

    rng = np.random.RandomState(4)
    dim, m = 16, 4
    vecs = {i: [float(x) for x in rng.randn(dim)] for i in range(30)}
    cents = [vecs[0], vecs[1]]
    cb_rows = [(j, c, [float(x) for x in rng.randn(4)])
               for j in range(m) for c in range(4)]
    cbk = spark.createDataFrame(
        cb_rows, "sub_ord int, code int, cvec array<double>"
    )
    in_dir = tmp_path / "pqc_in"
    in_dir.mkdir()
    for name, ids in (("a.json", range(0, 15)), ("b.json", range(15, 30))):
        with open(in_dir / name, "w") as fh:
            for i in ids:
                fh.write(json.dumps(
                    {"vec_id": i, "embedding": vecs[i]}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    idx = str(tmp_path / "pqc_idx")
    q = S.ingest_pq_codes_stream(
        stream, idx, cents, cbk, m=m, residual=True, assign="fast",
        checkpoint_dir=str(tmp_path / "ck_pqc"), compact_every=2,
    )
    q.awaitTermination()
    per_cell = {
        d: len(glob.glob(f"{idx}/{d}/*.parquet"))
        for d in __import__("os").listdir(idx) if d.startswith("ivf_cell=")
    }
    assert per_cell and all(n == 1 for n in per_cell.values()), per_cell
    rows = spark.read.parquet(idx).collect()
    assert len(rows) == 30 and {r["vec_id"] for r in rows} == set(range(30))


def test_recover_pq_codes_index_heals_interrupted_swap(spark, tmp_path):
    """A crash between compact_pq_codes_index's two renames leaves no
    live index dir; without recovery a restarted stream's replayed
    append would recreate it holding only that batch and the next
    compaction would delete the stranded pre-crash copy — silent loss
    of the whole index (r10 review). recover_pq_codes_index (run by
    compact and by ingest_pq_codes_stream before every append) must
    restore every crash state."""
    from seqarray_spark.operators import similarity as SIM

    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [(i, [i % 4, (i + 1) % 4], i % 2) for i in range(12)],
        "vec_id long, codes array<int>, ivf_cell int",
    ).write.partitionBy("ivf_cell").parquet(idx)
    want = set(range(12))

    def ids():
        return {r["vec_id"] for r in spark.read.parquet(idx).collect()}

    # live index: recovery is a no-op
    SIM.recover_pq_codes_index(idx)
    assert ids() == want

    # crash after rename(path, old), before rename(stage, path),
    # stage never written (pre-fix compact had no such state, but the
    # old-copy restore also covers a stage lost to manual cleanup)
    os.rename(idx, idx + "__old")
    SIM.recover_pq_codes_index(idx)
    assert ids() == want

    # crash exactly between the two renames: complete staged copy
    # (_SUCCESS present) AND the '__old' original — the compacted
    # stage wins
    spark.read.parquet(idx).repartition("ivf_cell").write.partitionBy(
        "ivf_cell"
    ).parquet(idx + "__compacting")
    os.rename(idx, idx + "__old")
    SIM.recover_pq_codes_index(idx)
    assert ids() == want
    shutil.rmtree(idx + "__old", ignore_errors=True)

    # compact itself heals first: simulate the crash state again and
    # run the full compaction — rows survive, one file per cell
    import glob

    os.rename(idx, idx + "__old")
    SIM.compact_pq_codes_index(spark, idx)
    assert ids() == want
    per_cell = [
        len(glob.glob(f"{idx}/{d}/*.parquet"))
        for d in os.listdir(idx)
        if d.startswith("ivf_cell=")
    ]
    assert per_cell and all(n == 1 for n in per_cell)


def test_recover_bucketed_index_heals_interrupted_swap(spark, tmp_path):
    """compact_bucketed_index swaps via DROP TABLE + RENAME; a crash
    between them leaves only the staged table, and a restarted ingest
    loop's tableExists() would re-bootstrap the index from the replayed
    batch (r10 review). recover_bucketed_index renames the complete
    stage back into place; it is a no-op when the table exists."""
    from seqarray_spark.operators.dedup import (
        compact_bucketed_index,
        recover_bucketed_index,
    )

    tbl = "t_recover_idx"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}__compacting")
    (
        spark.createDataFrame(
            [(f"h{i}", i) for i in range(10)], "content_md5 string, n int"
        )
        .write.bucketBy(4, "content_md5")
        .sortBy("content_md5")
        .saveAsTable(tbl)
    )
    try:
        recover_bucketed_index(spark, tbl)  # live table: no-op
        assert spark.table(tbl).count() == 10
        # simulate the crash window: stage complete, table dropped
        spark.sql(f"ALTER TABLE {tbl} RENAME TO {tbl}__compacting")
        recover_bucketed_index(spark, tbl)
        assert spark.table(tbl).count() == 10
        # compact itself heals the same state first
        spark.sql(f"ALTER TABLE {tbl} RENAME TO {tbl}__compacting")
        compact_bucketed_index(spark, tbl)
        assert spark.table(tbl).count() == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__compacting")


def test_ingest_pq_codes_stream_drift_log(spark, tmp_path):
    """probe_sample=K (r11): every micro-batch appends one drift record
    to <index>_drift.jsonl — the K lowest-id batch vectors' ADC-vs-exact
    top-1 agreement against the rest of the batch under the PINNED
    codebooks. Identity codebooks built FROM the data keep agreement
    high here; the planted-drift decay is tools/pq_drift_stress.py."""
    import json

    import numpy as np

    rng = np.random.RandomState(7)
    dim, m = 16, 4
    vecs = {i: [float(x) for x in rng.randn(dim)] for i in range(40)}
    cents = [vecs[0], vecs[1]]
    cb_rows = [
        (j, c, vecs[2 + c][j * 4:(j + 1) * 4]) for j in range(m) for c in range(4)
    ]
    cbk = spark.createDataFrame(
        cb_rows, "sub_ord int, code int, cvec array<double>"
    )
    in_dir = tmp_path / "pqd_in"
    in_dir.mkdir()
    for name, ids in (("a.json", range(0, 20)), ("b.json", range(20, 40))):
        with open(in_dir / name, "w") as fh:
            for i in ids:
                fh.write(json.dumps({"vec_id": i, "embedding": vecs[i]}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    idx = str(tmp_path / "pqd_idx")
    q = S.ingest_pq_codes_stream(
        stream, idx, cents, cbk, m=m,
        checkpoint_dir=str(tmp_path / "ck_pqd"), probe_sample=4,
    )
    q.awaitTermination()
    with open(idx + "_drift.jsonl") as fh:
        recs = [json.loads(line) for line in fh]
    assert len(recs) == 2
    assert sorted(r["batch_id"] for r in recs) == [0, 1]
    for r in recs:
        assert r["n_probes"] == 4
        assert 0.0 <= r["mean_top1_agreement"] <= 1.0


def test_retrain_pq_codes_index_rebuilds_under_new_model(spark, tmp_path):
    """retrain_pq_codes_index (r11): the remediation once drift is
    detected — the stored index is atomically replaced by a re-encode
    under NEW codebooks, row-for-row equal to a fresh
    write_pq_codes_index, with no staging/backup dirs left behind."""
    import os

    import numpy as np

    from seqarray_spark.operators import similarity as SIM

    rng = np.random.RandomState(11)
    dim, m = 16, 4
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(dim)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in emb.collect()}
    cents = [stored[0], stored[1]]

    def _cbk(seed):
        r2 = np.random.RandomState(seed)
        return spark.createDataFrame(
            [(j, c, [float(x) for x in r2.randn(4)])
             for j in range(m) for c in range(4)],
            "sub_ord int, code int, cvec array<double>",
        )

    idx = str(tmp_path / "rt_idx")
    SIM.write_pq_codes_index(emb, cents, _cbk(1), m, idx)
    old_rows = sorted(
        (r["vec_id"], list(r["codes"]))
        for r in spark.read.parquet(idx).collect()
    )
    SIM.retrain_pq_codes_index(spark, idx, emb, cents, _cbk(2), m)
    got = sorted(
        (r["vec_id"], list(r["codes"]), r["dist"], r["ivf_cell"])
        for r in spark.read.parquet(idx).collect()
    )
    fresh = str(tmp_path / "rt_fresh")
    SIM.write_pq_codes_index(emb, cents, _cbk(2), m, fresh)
    want = sorted(
        (r["vec_id"], list(r["codes"]), r["dist"], r["ivf_cell"])
        for r in spark.read.parquet(fresh).collect()
    )
    assert got == want and len(got) == 30
    assert sorted((v, c) for v, c, _, _ in got) != old_rows  # model changed
    assert not os.path.exists(idx + "__compacting")
    assert not os.path.exists(idx + "__old")


def test_append_drift_record_idempotent_under_replay(tmp_path):
    """ADVICE r11: the _drift.jsonl append inside foreachBatch must be
    idempotent — a failed/retried micro-batch re-enters with the SAME
    batch_id and must not duplicate its record."""
    import json

    from seqarray_spark.streaming.ingest import _append_drift_record

    log = str(tmp_path / "idx_drift.jsonl")
    r0 = {"batch_id": 0, "n_probes": 4, "mean_top1_agreement": 1.0}
    r1 = {"batch_id": 1, "n_probes": 4, "mean_top1_agreement": 0.75}
    assert _append_drift_record(log, r0) is True
    assert _append_drift_record(log, r0) is False  # replay of batch 0
    assert _append_drift_record(log, r1) is True
    assert _append_drift_record(log, dict(r1)) is False  # replay of 1
    with open(log) as fh:
        recs = [json.loads(line) for line in fh]
    assert [r["batch_id"] for r in recs] == [0, 1]
    # torn tail line (crash mid-write) falls back to appending — and
    # the retried record must land on its OWN line, not merge onto the
    # fragment (ADVICE r12: a merged line loses the record and breaks
    # the next replay's dedupe)
    with open(log, "a") as fh:
        fh.write('{"batch_id": 2, "n_pro')
    assert _append_drift_record(
        log, {"batch_id": 2, "n_probes": 4, "mean_top1_agreement": 0.5}
    ) is True
    good = []
    with open(log) as fh:
        for line in fh:
            try:
                good.append(json.loads(line))
            except ValueError:
                pass
    assert [r["batch_id"] for r in good] == [0, 1, 2]
    assert good[-1]["mean_top1_agreement"] == 0.5
    # ...and the replay of the recovered batch still dedupes
    assert _append_drift_record(
        log, {"batch_id": 2, "n_probes": 4, "mean_top1_agreement": 0.5}
    ) is False
    # torn tail where the json is COMPLETE but the newline is missing:
    # the replay repairs the terminator without duplicating
    with open(log, "a") as fh:
        fh.write('{"batch_id": 3, "n_probes": 4}')
    assert _append_drift_record(log, {"batch_id": 3, "n_probes": 4}) is False
    assert _append_drift_record(log, {"batch_id": 4, "n_probes": 4}) is True
    tail_ids = []
    with open(log) as fh:
        for line in fh:
            try:
                tail_ids.append(json.loads(line)["batch_id"])
            except ValueError:
                pass  # the torn fragment line
    assert tail_ids[-2:] == [3, 4]


def test_append_drift_record_oversized_line(tmp_path):
    """ADVICE r12: a drift line longer than the 4096-byte tail window
    must still dedupe — the window grows backward until it holds the
    whole final line instead of front-truncating it (which made the
    parse fail and appended a duplicate on every replay)."""
    import json

    from seqarray_spark.streaming.ingest import _append_drift_record

    log = str(tmp_path / "idx_drift.jsonl")
    big = {"batch_id": 7, "probe_sample": ["v%06d" % i for i in range(900)]}
    assert len(json.dumps(big)) > 4096
    assert _append_drift_record(log, big) is True
    assert _append_drift_record(log, dict(big)) is False  # replay
    # oversized line as the FIRST and ONLY line (window >= size path)
    with open(log) as fh:
        recs = [json.loads(line) for line in fh]
    assert [r["batch_id"] for r in recs] == [7]
    # and with a small line after it, a replay of the small one dedupes
    assert _append_drift_record(log, {"batch_id": 8, "n_probes": 1}) is True
    assert _append_drift_record(log, {"batch_id": 8, "n_probes": 1}) is False
    with open(log) as fh:
        recs = [json.loads(line) for line in fh]
    assert [r["batch_id"] for r in recs] == [7, 8]
