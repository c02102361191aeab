"""Property-based check (hypothesis): for arbitrary small call tables the
engine's aggregates equal a pure-Python fold — the generalized form of the
reference's randomized-subset oracle."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

allele = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
call = st.tuples(
    st.integers(min_value=1, max_value=5),  # variant_id
    st.integers(min_value=0, max_value=3),  # sample idx
    st.lists(allele, min_size=1, max_size=3),  # alleles (ragged ploidy)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(call, min_size=1, max_size=25, unique_by=lambda c: (c[0], c[1])))
def test_af_matches_python_fold(spark, calls):
    from seqarray_spark.operators.aggregates import af_ac_missing

    df = spark.createDataFrame(
        [(v, f"s{s}", a) for v, s, a in calls],
        "variant_id int, sample_id string, alleles array<int>",
    )
    got = {r["variant_id"]: r for r in af_ac_missing(df).collect()}

    expected = {}
    for v, s, a in calls:
        e = expected.setdefault(
            v, {"ref": 0, "nonmiss": 0, "miss_slots": 0, "slots": 0,
                "full": 0, "n": 0}
        )
        known = [x for x in a if x is not None]
        e["ref"] += sum(1 for x in known if x == 0)
        e["nonmiss"] += len(known)
        e["miss_slots"] += len(a) - len(known)
        e["slots"] += len(a)
        e["full"] += 1 if len(known) == len(a) else 0
        e["n"] += 1

    assert set(got) == set(expected)
    for v, e in expected.items():
        r = got[v]
        # reference NA conventions: ac is NA when every slot is missing
        if e["nonmiss"]:
            assert r["ac"] == e["ref"]
            assert r["af"] == pytest.approx(e["ref"] / e["nonmiss"])
        else:
            assert r["ac"] is None and r["af"] is None
        assert r["an"] == e["nonmiss"]
        # slot-level missing rate (reference FC_Missing_*)
        assert r["missing_rate"] == pytest.approx(e["miss_slots"] / e["slots"])
        assert r["ns"] == e["full"]


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_image_codec_roundtrip_property(w, h, seed):
    """BMP and PPM encode->decode is pixel-exact for arbitrary dims —
    exercises every row-padding residue (stride = 4-byte-aligned) and
    the bottom-up/BGR conventions."""
    import numpy as np

    from seqarray_spark.operators import multimodal as MM

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    assert (MM.decode_image(MM.encode_bmp(img)) == img).all()
    assert (MM.decode_image(MM.encode_ppm(img)) == img).all()


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_lz4_block_roundtrip_property(data):
    """Any byte string round-trips through the pure-Python LZ4 block
    codec exactly (sources/lz4_block; public LZ4 block format)."""
    from seqarray_spark.sources.lz4_block import (compress_block,
                                                  decompress_block)

    assert decompress_block(compress_block(data), len(data)) == data


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-3.0, max_value=3.0,
                                       allow_nan=False)),
        min_size=1, max_size=50,
    ),
    st.sampled_from(["packedreal8", "packedreal16", "packedreal16u",
                     "packedreal24", "packedreal24u", "packedreal32",
                     "packedreal32u"]),
)
def test_packedreal_quantization_property(vals, kind):
    """encode -> decode is the width's quantization for every packedreal
    class: |x_hat - clip(x)| <= scale/2, None <-> NaN (writer _PR_SPEC
    and reader decode_values agree per width/signedness)."""
    import math

    import numpy as np

    from seqarray_spark.sources.gds import GdsNode, decode_values
    from seqarray_spark.sources.gds_write import _PR_SPEC, _encode_values

    scale, _na, lo, hi, _dt = _PR_SPEC[kind]
    raw = _encode_values(kind, [math.nan if v is None else v for v in vals])
    node = GdsNode(name="x", path="/x", stream_id=0, flags=0,
                   kind=kind, dims=(len(vals),))
    got = decode_values(node, raw)
    for v, g in zip(vals, got):
        if v is None:
            assert np.isnan(g)
        else:
            clipped = min(max(v, lo * scale), hi * scale)
            assert abs(g - clipped) <= scale / 2 + 1e-12, (kind, v, g)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(call, min_size=1, max_size=20, unique_by=lambda c: (c[0], c[1])))
def test_allele_freq_at_matches_python_fold(spark, calls):
    """Named-allele AF (FC_AF_Allele semantics) vs a pure-Python fold:
    the target allele's index is looked up per variant, freq = count of
    that index over non-missing slots, NULL when absent or all-missing."""
    from pyspark.sql import functions as F

    from seqarray_spark.operators.aggregates import allele_freq_at

    df = spark.createDataFrame(
        [(v, f"s{s}", a) for v, s, a in calls],
        "variant_id int, sample_id string, alleles array<int>",
    )
    # variants: allele list cycles so the target 'G' lands at a different
    # index (or not at all) per variant: v%4==0 -> ref, 1 -> alt1,
    # 2 -> alt2, 3 -> absent
    vids = sorted({v for v, _, _ in calls})
    ref_alt = {
        0: ("G", ["A", "C"]),
        1: ("A", ["G", "C"]),
        2: ("A", ["C", "G"]),
        3: ("A", ["C", "T"]),
    }
    variants = spark.createDataFrame(
        [(v, *ref_alt[v % 4]) for v in vids],
        "variant_id int, ref string, alt array<string>",
    )
    got = {r["variant_id"]: r["af"] for r in allele_freq_at(df, variants, "G").collect()}

    for v in vids:
        idx = {0: 0, 1: 1, 2: 2, 3: -1}[v % 4]
        slots = [x for vv, _, a in calls if vv == v for x in a]
        known = [x for x in slots if x is not None]
        if idx < 0 or not known:
            assert got[v] is None, (v, got[v])
        else:
            assert got[v] == pytest.approx(
                sum(1 for x in known if x == idx) / len(known)
            ), v


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.text(min_size=0, max_size=300))
def test_pii_scrub_idempotent(spark, text):
    """Scrubbing is idempotent: redaction tokens never re-match any PII
    pattern, so a second pass finds nothing and changes nothing."""
    from pyspark.sql import Row

    from seqarray_spark.operators.curate import pii_scrub

    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    once = pii_scrub(df).select("doc_id", "text")
    twice = pii_scrub(once).collect()[0]
    assert twice["pii_found"] == 0
    assert twice["text"] == once.collect()[0]["text"]


chrom_name = st.sampled_from(["1", "2", "10", "X", "MT"])
window = st.tuples(
    chrom_name,
    st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
    st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(window, min_size=1, max_size=6))
def test_filter_chrom_vectorized_equals_scalar_union(spark, windows):
    """Property: a vectorized seqSetFilterChrom call selects exactly the
    UNION of the per-entry scalar calls (the reference's per-chromosome
    CRangeSet semantics, src/SeqArray.cpp:808-815) — for any mix of
    chromosomes, repeated entries, and open (None) bounds."""
    from seqarray_spark.dataset import SeqDataset

    rows = [
        (i, c, p)
        for i, (c, p) in enumerate(
            (c, p) for c in ["1", "2", "10", "X", "MT"] for p in (50, 150, 300, 450)
        )
    ]
    v = spark.createDataFrame(rows, "variant_id long, chromosome string, position int")

    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(
        [w[0] for w in windows],
        from_bp=[w[1] for w in windows],
        to_bp=[w[2] for w in windows],
    )
    got = {r["variant_id"] for r in ds.variants.select("variant_id").collect()}

    want = set()
    for c, lo, hi in windows:
        d2 = SeqDataset(v, None, None)
        d2.set_filter_chrom([c], from_bp=lo, to_bp=hi)
        want |= {r["variant_id"] for r in d2.variants.select("variant_id").collect()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),          # doc_id
            st.integers(min_value=0, max_value=7),           # content class
        ),
        min_size=1, max_size=30, unique_by=lambda d: d[0],
    )
)
def test_incremental_exact_equals_full_rerun_monotone(spark, docs):
    """Property: for ANY corpus/batch split where batch ids are all
    larger than corpus ids (monotone ingest), incremental exact dedup
    over the stored index == full exact_dedup over the union restricted
    to the batch."""
    from seqarray_spark.operators.dedup import (exact_dedup,
                                                incremental_exact_dedup)
    from pyspark.sql import functions as F

    rows = [(i, f"text class {c}") for i, c in docs]
    mid = max(i for i, _ in rows) // 2
    corpus_rows = [r for r in rows if r[0] <= mid]
    batch_rows = [r for r in rows if r[0] > mid]
    if not corpus_rows or not batch_rows:
        return
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    # corpus index holds KEPT corpus docs' hashes (post-dedup, as the
    # production loop maintains it) — hash set identical either way
    idx = corpus.select(F.md5("text").alias("content_md5"))
    inc = {r["doc_id"]
           for r in incremental_exact_dedup(batch, idx).collect()}
    full = {r["doc_id"]
            for r in exact_dedup(corpus.unionByName(batch)).collect()
            if r["doc_id"] > mid}
    assert inc == full


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),  # variant_id
            st.sampled_from(["1", "2", "3", "X"]),    # chromosome
        ),
        min_size=1, max_size=60, unique_by=lambda r: r[0],
    ),
    st.integers(min_value=1, max_value=9),            # partition count
)
def test_chrom_rle_distributed_equals_driver(spark, rows, n_parts):
    """Property: the distributed per-partition fold + boundary merge
    and the bounded driver fast path produce identical RLE for ANY
    (variant_id, chromosome) set and ANY partition count."""
    from seqarray_spark.dataset import chrom_rle

    v = spark.createDataFrame(rows, "variant_id long, chromosome string")
    dist = [
        (r["run_id"], r["chromosome"], r["run_length"])
        for r in chrom_rle(v, num_partitions=n_parts,
                           driver_threshold=0).collect()
    ]
    fast = [
        (r["run_id"], r["chromosome"], r["run_length"])
        for r in chrom_rle(v).collect()
    ]
    assert dist == fast
    assert sum(x[2] for x in dist) == len(rows)
