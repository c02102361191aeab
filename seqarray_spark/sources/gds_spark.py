"""Distributed GDS -> SeqDataset reader (the migration path for existing
SeqArray users; reference entry point seqOpen, R/Methods.R:12-98).

Plan shape: the driver opens the container once (metadata + the small
index nodes: genotype/@data plane counts, format @data row counts, info
@X element counts) and cuts the variant axis into blocks, precomputing
every per-block offset. Spark tasks then each decode ONE block via
mapInPandas: fixed-width nodes are read by byte range (only the xz
frames overlapping the range are decompressed — true random access), so
a 1000-executor cluster reads one huge .gds concurrently with no
driver-side data movement. Variable-length nodes (strings, LEB128 ints)
lack a byte index in the container, so the driver's index pass walks
each VL stream ONCE and records the byte offset of every block boundary
in blocks_df; tasks then seek directly to their block (O(N) total work
instead of the O(N^2/B) of per-task rewalks from byte 0). For repeated
analytical access convert once to parquet with SeqDataset.export — GDS
is the interchange format, parquet the analytical layout.

Genotype decode (reference: src/Index.h:154-200 ragged genotype layout):
genotype/data is a bit2 matrix [sum(@data), n_samples, ploidy] packed
contiguously LSB-first; variant i owns @data[i] stacked bit planes;
allele value = sum_k(plane_k << 2k); the all-ones value per plane count
is the missing code (0xFF raw missing, src/Index.h:56).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seqarray_spark.sources.gds import (GdsFile, GdsNode, _ELEM_SIZE, _varint,
                                        decode_values)


def _read_index(f: GdsFile, path: str, default=None):
    try:
        node = f.node(path)
    except KeyError:
        return default
    if not node.dims or node.dims[0] == 0:
        return default
    return np.asarray(f.read_array(path))


def _bit_rows(f: GdsFile, node: GdsNode, row_start: int, row_end: int, vals_per_row: int):
    """Rows [row_start, row_end) of a contiguously packed bit1/bit2
    matrix, via byte-range read + leading-value trim."""
    bits = 1 if node.kind == "bit1" else 2
    per = 8 // bits
    v0 = row_start * vals_per_row
    v1 = row_end * vals_per_row
    b0, b1 = v0 // per, (v1 + per - 1) // per
    vals = decode_values(node, f.read_node_bytes(node, b0, b1))
    off = v0 - b0 * per
    return vals[off:off + (v1 - v0)]


def _bit_rows_sel(
    f: GdsFile,
    node: GdsNode,
    row_start: int,
    row_end: int,
    vals_per_row: int,
    ent: np.ndarray,
):
    """Selected entries of rows [row_start, row_end) of a packed
    bit1/bit2 matrix, decoded COLUMN-PRUNED: only the len(ent)
    selected per-row entries are unpacked, so decode work scales with
    the selection, not the row width — the Spark analogue of the
    reference's transposed read-by-sample path (src/ReadBySample.cpp:
    98-160), which re-reads the matrix sample-major for the same
    reason. Bytes still stream at row granularity (the compression
    frames force that anyway); what is pruned is the unpack/expansion
    to one int per 2-bit code, the dominant in-memory cost on wide
    containers. Returns shape (n_rows, len(ent))."""
    bits = 1 if node.kind == "bit1" else 2
    per = 8 // bits
    mask = (1 << bits) - 1
    v0 = row_start * vals_per_row
    v1 = row_end * vals_per_row
    b0, b1 = v0 // per, (v1 + per - 1) // per
    raw = np.frombuffer(f.read_node_bytes(node, b0, b1), dtype=np.uint8)
    idx = (
        np.arange(row_start, row_end, dtype=np.int64)[:, None] * vals_per_row
        + np.asarray(ent, dtype=np.int64)[None, :]
    )
    return (raw[(idx // per) - b0] >> ((idx % per) * bits).astype(np.uint8)) & mask


# (file_path, file_size, node_path, bounds_digest) -> offsets. Bounds
# arrays are tiny (n_blocks+1); the cache makes repeated from_gds calls
# on the same container free. Bounded to keep long-lived drivers small.
_VL_BOUNDS_CACHE: dict[tuple, np.ndarray] = {}
_VL_BOUNDS_CACHE_MAX = 256


def _vl_byte_bounds(f: GdsFile, node: GdsNode, elem_bounds) -> np.ndarray:
    """Byte offset of each element boundary (sorted ascending) in a VL
    node's uncompressed stream — ONE linear pass, streamed frame-by-frame
    (at most one decompressed frame held at a time, so planning memory is
    O(frame), not O(node)). Results are cached per (file, node, bounds)."""
    import os

    bounds = np.asarray(elem_bounds, dtype=np.int64)
    try:
        stt = os.stat(f.path)
        fkey = (stt.st_size, stt.st_mtime_ns)
    except OSError:
        fkey = (-1, -1)
    key = (f.path, fkey, node.path, bounds.tobytes())
    hit = _VL_BOUNDS_CACHE.get(key)
    if hit is not None:
        return hit
    if node.kind == "vlint":
        # LEB128: an element ends at every byte with the high bit clear
        parts, base = [], 0
        for chunk in f.iter_node_chunks(node):
            a = np.frombuffer(chunk, dtype=np.uint8)
            parts.append(np.flatnonzero(a < 0x80).astype(np.int64) + base)
            base += len(a)
        ends = np.concatenate(parts) if parts else np.empty(0, np.int64)
        starts = np.concatenate([[0], ends + 1])
        out = starts[np.minimum(bounds, len(starts) - 1)]
    else:  # vlstr: sequential [varint len][payload] walk with carry
        out = np.empty(len(bounds), dtype=np.int64)
        nb = len(bounds)
        bi = 0
        while bi < nb and bounds[bi] <= 0:
            out[bi] = 0
            bi += 1
        e = 0         # elements fully consumed
        abs_o = 0     # absolute offset of current buffer start
        carry = b""
        for chunk in f.iter_node_chunks(node):
            if bi >= nb:
                break
            buf = carry + bytes(chunk)
            o, n = 0, len(buf)
            while bi < nb:
                p, v, shift, fin = o, 0, 0, False
                while p < n:
                    c = buf[p]
                    p += 1
                    v |= (c & 0x7F) << shift
                    shift += 7
                    if not (c & 0x80):
                        fin = True
                        break
                if not fin or p + v > n:
                    break  # element spans into the next frame
                o = p + v
                e += 1
                while bi < nb and bounds[bi] == e:
                    out[bi] = abs_o + o
                    bi += 1
            carry = buf[o:]
            abs_o += o
        out[bi:] = abs_o + len(carry)
    if len(_VL_BOUNDS_CACHE) >= _VL_BOUNDS_CACHE_MAX:
        _VL_BOUNDS_CACHE.clear()
    _VL_BOUNDS_CACHE[key] = out
    return out


def _vl_slice(f: GdsFile, node: GdsNode, elem_start: int, elem_end: int,
              bref=None):
    """Elements [elem_start, elem_end) of a variable-length node (vlstr /
    vlint).

    With `bref` = (byte_start, byte_end, elem_at_byte_start) from the
    driver's VL byte index, reads only that byte range and decodes in
    place — true random access. Without it, falls back to walking varints
    from the stream start (no string materialization before the block)."""
    if bref is not None:
        b0, b1, e0 = int(bref[0]), int(bref[1]), int(bref[2])
        raw = f.read_node_bytes(node, b0, b1)
        vals = decode_values(node, raw, n_values=elem_end - e0)
        return vals[elem_start - e0:]
    raw = f.read_node_bytes(node)
    o = 0
    if node.kind == "vlstr":
        for _ in range(elem_start):
            ln, o = _varint(raw, o)
            o += ln
        out = []
        for _ in range(elem_end - elem_start):
            ln, o = _varint(raw, o)
            out.append(raw[o:o + ln].decode("utf-8", "replace"))
            o += ln
        return out
    # vlint: zigzag LEB128
    for _ in range(elem_start):
        while raw[o] & 0x80:
            o += 1
        o += 1
    out = np.empty(elem_end - elem_start, dtype=np.int64)
    for i in range(len(out)):
        v = shift = 0
        while True:
            c = raw[o]
            o += 1
            v |= (c & 0x7F) << shift
            shift += 7
            if not (c & 0x80):
                break
        out[i] = (v >> 1) ^ -(v & 1)
    return out


def _node_slice(f: GdsFile, node: GdsNode, start: int, end: int, vl=None):
    """Elements [start, end) of a 1-D node, random access where the
    storage allows it. `vl` is the per-block VL byte index
    ({path: (byte0, byte1, elem0)}) built by the driver."""
    if node.kind in ("vlstr", "vlint"):
        return _vl_slice(f, node, start, end, (vl or {}).get(node.path))
    if node.kind in ("bit1", "bit2"):
        return _bit_rows(f, node, start, end, 1)
    es = _ELEM_SIZE[node.kind]
    return decode_values(node, f.read_node_bytes(node, start * es, end * es))


def _info_nodes(f: GdsFile):
    try:
        folder = f.node("annotation/info")
    except KeyError:
        return []
    return [c for c in folder.children if not c.is_folder and not c.name.startswith("@")]


def _format_nodes(f: GdsFile):
    try:
        folder = f.node("annotation/format")
    except KeyError:
        return []
    return [c for c in folder.children if c.is_folder and c.child("data") is not None]


def _spark_type(kind: str, is_array: bool) -> str:
    if kind.startswith("packedreal"):
        base = "double"
    else:
        base = {
            "int32": "int", "int16": "int", "uint8": "int", "vlint": "long",
            "float32": "double", "float64": "double",
            "vlstr": "string", "bit1": "boolean", "bit2": "int",
        }[kind]
    return f"array<{base}>" if is_array else base


def from_gds(
    spark: SparkSession,
    path: str,
    block_variants: int | None = None,
    info_fields: list[str] | None = None,
    format_fields: list[str] | None = None,
    chromosomes: list[str] | None = None,
    bp_range: tuple[int | None, int | None] | None = None,
    samples: list[str] | None = None,
):
    """Open a SeqArray .gds container as a SeqDataset.

    The file must be reachable from every executor (shared FS / NFS /
    fuse mount — the same contract the reference's parallel readers have,
    R/Utilities.R:1008-1124).

    Codec contract (random access): LZMA_ra (XZ_RA) nodes and ZIP_ra
    nodes written by this engine block-decode with frame-level random
    access — a task touches only the frames overlapping its block.
    ZIP-coded nodes whose frame index does not validate (e.g. layouts
    from other gdsfmt builds) fall back to whole-stream decompression
    per task (sources/gds.py _parse_zip_ra) — O(N^2/B) at scale; convert
    such files once via to_gds(coder='LZMA_ra') before distributed use.

    `chromosomes`: prune the CONTAINER SCAN to the named chromosomes —
    the Spark analogue of the reference's per-chromosome run-list index
    (src/Index.cpp:382+, what makes seqSetFilterChrom O(selection) on a
    GDS file). A chromosome-column-only pre-scan (one tiny kernel pass
    over just that node's bytes) yields the per-chromosome row runs;
    decode blocks not overlapping a selected run are DROPPED from the
    plan, so genotype/INFO/FORMAT planes of other chromosomes are never
    read. Partial boundary blocks decode and are trimmed by an exact
    chromosome filter (variants) + broadcast semi-join (calls). Without
    this, set_filter_chrom on a whole-genome container pays a full-file
    decode before the filter.

    `bp_range=(from_bp, to_bp)` (either bound None = open) additionally
    prunes by POSITION: the same pre-scan also collects per-block
    position min/max per chromosome run — block-level zone-map stats,
    the parquet row-group min/max analogue — and blocks whose stats
    cannot intersect the window are dropped too. Stats-based, so
    correct even for position-unsorted files (a non-intersecting
    min/max proves absence; an intersecting one merely decodes and is
    trimmed exactly). With a sorted whole-genome container this makes a
    gene-region read O(window), the Spark analogue of
    seqSetFilterChrom(from.bp, to.bp) riding the reference's index.
    Combines with `chromosomes`; the window applies to every selected
    chromosome (the reference's vectored per-chrom windows remain
    available post-read via set_filter_chrom).

    `samples`: prune the SAMPLE axis at the scan — the reference's
    seqSetFilter(sample.id=) pushed into the decode kernels. Genotype
    bit planes still decode whole rows (the packing is per full sample
    row), but per-cell list building, FORMAT expansion, and the Arrow
    transfer — the dominant calls-side costs — run at |selection|: a
    1k-of-500k-sample biobank read ships 0.2% of the cells. Unknown
    ids raise (the reference's match() stops on NA too).
    """
    from seqarray_spark.dataset import SeqDataset

    f = GdsFile(path)
    n_var = int(f.node("variant.id").dims[0])
    sample_ids = list(f.read_array("sample.id"))
    n_samp = len(sample_ids)

    if block_variants is None:
        # auto-size so even a small file decodes with full parallelism:
        # enough blocks to feed every core, but never under 256 variants
        # per block (per-block VL-index/Arrow overhead would dominate)
        # and never over the 8192 a large file wants for frame locality
        ncores = spark.sparkContext.defaultParallelism
        block_variants = max(256, min(8192, -(-n_var // max(ncores, 1))))

    s_sel = None
    if samples is not None:
        pos = {sid: i for i, sid in enumerate(sample_ids)}
        missing = [sid for sid in samples if sid not in pos]
        if missing:
            raise ValueError(f"unknown sample ids: {missing[:5]}")
        # stored order, like the reference's sample selection
        want = set(samples)
        s_sel = np.array(
            [i for i, sid in enumerate(sample_ids) if sid in want],
            dtype=np.int64,
        )

    # --- driver-side linear pass over the small index nodes ------------
    geno = f.node("genotype/data") if _has(f, "genotype/data") else None
    ploidy = int(geno.dims[2]) if geno is not None and len(geno.dims) > 2 else 2
    planes = _read_index(f, "genotype/@data")
    if planes is None and geno is not None:
        planes = np.ones(n_var, dtype=np.int64)
    plane_off = np.concatenate([[0], np.cumsum(planes)]) if planes is not None else None

    info_sel = _info_nodes(f)
    if info_fields is not None:
        info_sel = [n for n in info_sel if n.name in info_fields]
    info_meta = []
    for node in info_sel:
        counts = _read_index(f, f"annotation/info/@{node.name}")
        eoff = np.concatenate([[0], np.cumsum(counts)]) if counts is not None else None
        info_meta.append((node.name, node.kind, eoff))

    fmt_sel = _format_nodes(f)
    if format_fields is not None:
        fmt_sel = [n for n in fmt_sel if n.name in format_fields]
    fmt_meta = []
    for folder in fmt_sel:
        counts = _read_index(f, f"annotation/format/{folder.name}/@data")
        roff = (
            np.concatenate([[0], np.cumsum(counts)])
            if counts is not None
            else np.arange(n_var + 1)
        )
        # FORMAT Number drives the column shape: '0'/'1' -> scalar,
        # anything else (A/G/R/.) -> array across the variant's rows
        is_arr = folder.attrs.get("Number", "1") not in ("0", "1")
        fmt_meta.append((folder.name, folder.child("data").kind, roff, is_arr))

    # mixed-ploidy overflow entries (reference genotype/extra mechanism,
    # src/ConvVCF2GDS.cpp:1775-1797): the (sample.index, variant.index,
    # length) triplets are sorted by variant, so each block gets an entry
    # range + a value offset into the extra stream
    gext = _extra_meta(f, "genotype/extra.index")
    pext = _extra_meta(f, "phase/extra.index")

    def _ext_cols(ext, s, e):
        if ext is None:
            return 0, 0, 0
        vi0, cum = ext
        e0, e1 = np.searchsorted(vi0, [s, e])
        return int(e0), int(e1), int(cum[e0])

    # --- VL byte index: one driver pass per variable-length node, so
    # tasks seek straight to their block instead of re-walking varints
    # from byte 0 (O(N) total instead of O(N^2/B) for vlstr columns
    # like chromosome/allele)
    # ship the parsed container (fragment table + node tree, a few KB) to
    # executors once — tasks neither re-read nor re-parse the file; data
    # pages fault in via mmap per worker process
    bc = spark.sparkContext.broadcast(f)

    bstarts = np.arange(0, max(n_var, 1), block_variants, dtype=np.int64)
    vaxis = np.append(bstarts, n_var)
    vlpaths, vl_elem, vl_bytes = _build_vl_index(
        f, vaxis, info_meta, fmt_meta, len(sample_ids), spark=spark, bc=bc
    )

    blocks = []
    for b, s in enumerate(bstarts):
        s = int(s)
        e = min(s + block_variants, n_var)
        blocks.append(
            (
                s,
                e,
                int(plane_off[s]) if plane_off is not None else 0,
                int(plane_off[e]) if plane_off is not None else 0,
                [int(eoff[s]) if eoff is not None else -1 for _, _, eoff in info_meta],
                [int(eoff[e]) if eoff is not None else -1 for _, _, eoff in info_meta],
                [int(roff[s]) for _, _, roff, _ in fmt_meta],
                [int(roff[e]) for _, _, roff, _ in fmt_meta],
                *_ext_cols(gext, s, e),
                *_ext_cols(pext, s, e),
                [int(vl_bytes[p][b]) for p in vlpaths],
                [int(vl_bytes[p][b + 1]) for p in vlpaths],
                [int(vl_elem[p][b]) for p in vlpaths],
            )
        )
    bschema = (
        "start long, end long, p0 long, p1 long, "
        "i0 array<long>, i1 array<long>, f0 array<long>, f1 array<long>, "
        "g0 long, g1 long, go long, q0 long, q1 long, qo long, "
        "vb0 array<long>, vb1 array<long>, ve0 array<long>"
    )
    ncores = spark.sparkContext.defaultParallelism

    bp_lo, bp_hi = bp_range if bp_range is not None else (None, None)
    if chromosomes is not None or bp_range is not None:
        # scan-prune like the reference's per-chromosome run-list index
        # (src/Index.cpp:382+): a chromosome(+position)-only kernel pass
        # (touches just those nodes' bytes) yields per-block runs with
        # zone-map position stats; blocks not overlapping a selected
        # run never enter the decode plan
        chrom_set = (
            {str(c) for c in chromosomes} if chromosomes is not None else None
        )
        stats = _gds_chrom_pos_stats(
            spark, bc, blocks, bschema, vlpaths, ncores,
            with_pos=bp_range is not None,
        )
        sel = [
            (r["rs"], r["re"])
            for r in stats
            if (chrom_set is None or r["chrom"] in chrom_set)
            and (bp_lo is None or r["pmax"] >= bp_lo)
            and (bp_hi is None or r["pmin"] <= bp_hi)
        ]
        # boundary blocks trim INSIDE the kernels via per-block selected
        # index ranges (sel0/sel1): unselected rows never cross the
        # Arrow boundary, and — chromosome runs being exact — the calls
        # side needs no id semi-join at all unless bp_range set
        # stats-approximate ranges
        blocks = [
            blk + ([max(s0, blk[0]) for s0, e0 in sel
                    if blk[0] < e0 and blk[1] > s0],
                   [min(e0, blk[1]) for s0, e0 in sel
                    if blk[0] < e0 and blk[1] > s0])
            for blk in blocks
            if any(blk[0] < e0 and blk[1] > s0 for s0, e0 in sel)
        ]
    else:
        blocks = [blk + ([], []) for blk in blocks]
    bschema += ", sel0 array<long>, sel1 array<long>"

    blocks_df = spark.createDataFrame(blocks, bschema).repartition(
        min(max(len(blocks), 1), ncores * 4)
    )

    filter_levels = (
        f.node("annotation/filter").attrs.get("R.levels")
        if _has(f, "annotation/filter")
        else None
    )

    # --- variants ------------------------------------------------------
    info_schema = ", ".join(
        f"`{name}`: {_spark_type(kind, eoff is not None)}"
        for name, kind, eoff in info_meta
    )
    del n_samp  # block kernels derive it from sample_ids
    fmt_names = [n for n, _, _, _ in fmt_meta]
    v_schema = (
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string"
        + (f", info struct<{info_schema}>" if info_meta else "")
        + (", fmt_present array<string>" if fmt_names else "")
    )
    imeta = [(n, k, e is not None) for n, k, e in info_meta]

    def variants_kernel(batches):
        g = bc.value
        for pdf in batches:
            for _, row in pdf.iterrows():
                s, e = int(row["start"]), int(row["end"])
                vl = _row_vl(row, vlpaths)
                out = _variants_block(g, s, e, row, imeta, filter_levels, vl,
                                      fmt_names)
                yield out

    variants = blocks_df.mapInPandas(variants_kernel, schema=v_schema)

    # --- calls ---------------------------------------------------------
    # dosage-only files (e.g. Imputed_dosages.gds) have no genotype node
    # but carry FORMAT fields — the calls grid still exists
    calls = None
    if geno is not None or fmt_meta:
        c_schema = (
            "variant_id long, sample_id string, alleles array<smallint>, "
            "phased array<boolean>"
            + "".join(
                f", `{name}` {_spark_type(kind, is_arr)}"
                for name, kind, _, is_arr in fmt_meta
            )
        )
        fmeta = [(n, k, a) for n, k, _, a in fmt_meta]
        sids = list(sample_ids)

        def calls_kernel(batches):
            g = bc.value
            for pdf in batches:
                for _, row in pdf.iterrows():
                    yield _calls_block(g, row, sids, ploidy, fmeta,
                                       _row_vl(row, vlpaths), s_sel)

        calls = blocks_df.mapInPandas(calls_kernel, schema=c_schema)

    # --- samples -------------------------------------------------------
    # sample_ordinal = 1-based node order (the reference's sample order)
    keep_ord = None if s_sel is None else {int(i) + 1 for i in s_sel}
    samples = spark.createDataFrame(
        [(s, k + 1) for k, s in enumerate(sample_ids)
         if keep_ord is None or k + 1 in keep_ord],
        "sample_id string, sample_ordinal int",
    )
    if _has(f, "sample.annotation"):
        for child in f.node("sample.annotation").children:
            if child.is_folder or child.kind is None:
                continue
            vals = f.read_array(child.path)
            aux = spark.createDataFrame(
                [(s, _py(v)) for s, v in zip(sample_ids, vals)],
                f"sample_id string, `{child.name}` {_spark_type(child.kind, False)}",
            )
            samples = samples.join(aux, "sample_id", "left")

    if chromosomes is not None or bp_range is not None:
        # the kernels already trimmed to the selected index ranges —
        # EXACT for chromosome runs, zone-map-approximate for bp_range.
        # So the Column re-filter below is a correctness backstop that
        # only does real work for bp_range boundary runs, and the calls
        # side needs an id semi-join ONLY when bp_range is set (for
        # chromosomes-only selections it would join against rows the
        # kernels already made exact — a pure broadcast of a
        # Python-evaluated relation for nothing)
        cond = F.lit(True)
        if chromosomes is not None:
            cond = cond & F.col("chromosome").isin(
                [str(c) for c in chromosomes]
            )
        if bp_lo is not None:
            cond = cond & (F.col("position") >= int(bp_lo))
        if bp_hi is not None:
            cond = cond & (F.col("position") <= int(bp_hi))
        variants = variants.filter(cond)
        if calls is not None and bp_range is not None:
            from seqarray_spark.plans.hints import maybe_broadcast

            calls = calls.join(
                maybe_broadcast(variants.select("variant_id")),
                "variant_id", "left_semi",
            )

    return SeqDataset(variants, calls, samples, ploidy=ploidy,
                      meta=_description_meta(f))


def _gds_chrom_pos_stats(spark, bc, blocks, bschema, vlpaths, ncores,
                         with_pos: bool = False):
    """Per-block chromosome runs of a container, optionally with the
    position min/max of each run: per-block numpy RLE in executor
    kernels (each task reads ONLY its slice of the chromosome — and,
    with_pos, position — node) collected to the driver. Rows are
    (chrom, rs, re[, pmin, pmax]) sorted by rs; each row lies entirely
    inside one decode block, so they double as block-level zone-map
    stats (the parquet row-group min/max analogue) for position-window
    pruning. Run count ≈ #chromosomes + #block boundaries — tiny."""
    bdf = spark.createDataFrame(blocks, bschema).repartition(
        min(max(len(blocks), 1), ncores * 4)
    )

    def kernel(batches):
        g = bc.value
        for pdf in batches:
            for _, row in pdf.iterrows():
                s, e = int(row["start"]), int(row["end"])
                vl = _row_vl(row, vlpaths)
                ch = np.asarray(
                    _node_slice(g, g.node("chromosome"), s, e, vl),
                    dtype=object,
                )
                starts = np.flatnonzero(
                    np.concatenate(([True], ch[1:] != ch[:-1]))
                )
                lens = np.diff(np.append(starts, len(ch)))
                out = {
                    "chrom": [str(ch[i]) for i in starts],
                    "rs": (s + starts).astype(np.int64),
                    "re": (s + starts + lens).astype(np.int64),
                }
                if with_pos:
                    pos = np.asarray(
                        _node_slice(g, g.node("position"), s, e, vl),
                        dtype=np.int64,
                    )
                    out["pmin"] = np.minimum.reduceat(pos, starts)
                    out["pmax"] = np.maximum.reduceat(pos, starts)
                yield pd.DataFrame(out)

    schema = "chrom string, rs long, re long" + (
        ", pmin long, pmax long" if with_pos else ""
    )
    return sorted(
        bdf.mapInPandas(kernel, schema).collect(), key=lambda r: r["rs"]
    )


def _gds_chrom_runs(spark, bc, blocks, bschema, vlpaths, ncores):
    """Global (chromosome, start_idx, end_idx) runs of a container's
    chromosome column: the per-block runs of _gds_chrom_pos_stats plus
    a driver merge of block-boundary continuations. The distributed
    sibling of the reference's CIndex chrom run lists
    (src/Index.cpp:382+) and of dataset.chrom_rle's boundary merge."""
    rows = _gds_chrom_pos_stats(spark, bc, blocks, bschema, vlpaths, ncores)
    merged: list[list] = []
    for r in rows:
        if merged and merged[-1][0] == r["chrom"] and merged[-1][2] == r["rs"]:
            merged[-1][2] = r["re"]
        else:
            merged.append([r["chrom"], r["rs"], r["re"]])
    return [(c, int(s), int(e)) for c, s, e in merged]


def _description_meta(f: GdsFile) -> dict:
    """description/* nodes -> SeqDataset.meta (inverse of the writer's
    emission; reference layout R/ConvVCF2GDS.R:928-957: reference node,
    vcf.alt / vcf.contig / vcf.header data.frame folders, vcf.fileformat
    folder attribute)."""
    meta: dict = {}
    has_desc = _has(f, "description")
    ff = f.node("description").attrs.get("vcf.fileformat") if has_desc else None
    if ff:
        meta["fileformat"] = ff
    if _has(f, "description/reference"):
        node = f.node("description/reference")
        if node.kind == "vlstr" and node.dims and node.dims[0]:
            vals = f.read_array("description/reference")
            if vals and vals[0]:
                meta["reference"] = vals[0]

    def _df(path: str):
        folder = f.node(path)
        cols = {}
        n = 0
        for c in folder.children:
            if c.is_folder or c.kind != "vlstr":
                continue
            cols[c.name] = list(f.read_array(c.path))
            n = max(n, len(cols[c.name]))
        return [
            {k: v[i] for k, v in cols.items() if i < len(v) and v[i]}
            for i in range(n)
        ]

    if _has(f, "description/vcf.alt"):
        meta["alts"] = _df("description/vcf.alt")
    if _has(f, "description/vcf.contig"):
        meta["contigs"] = _df("description/vcf.contig")
    if _has(f, "description/vcf.header"):
        meta["header_pairs"] = [
            (r.get("id", ""), r.get("value", ""))
            for r in _df("description/vcf.header")
        ]

    # declared INFO/FORMAT/FILTER catalogs from node attrs (the
    # reference pins Number/Type/Description per annotation node,
    # R/ConvVCF2GDS.R:1245-1260, and FILTER levels+Descriptions on the
    # filter factor, :1417-1424) — feeds the header() accessor and
    # declaration-faithful VCF re-export
    def _decl(node) -> dict | None:
        a = node.attrs
        if "Number" not in a and "Type" not in a:
            return None
        return {"ID": node.name, "Number": str(a.get("Number", ".")),
                "Type": str(a.get("Type", "")),
                "Description": str(a.get("Description", "") or "")}

    info_meta = [d for c in _info_nodes(f) if (d := _decl(c)) is not None]
    if info_meta:
        meta["info_meta"] = info_meta
    fmt_meta = [d for c in _format_nodes(f) if (d := _decl(c)) is not None]
    if fmt_meta:
        meta["format_meta"] = fmt_meta
    if _has(f, "annotation/filter"):
        fa = f.node("annotation/filter").attrs
        levels = fa.get("R.levels") or []
        if isinstance(levels, str):
            levels = [levels]
        descs = fa.get("Description") or []
        if isinstance(descs, str):
            descs = [descs]
        if levels:
            meta["filter_meta"] = [
                {"ID": lv, "Description": descs[i] if i < len(descs) else ""}
                for i, lv in enumerate(levels)
            ]
    return meta


# VL nodes whose uncompressed stream exceeds this are walked on
# executors (one Spark task per node) instead of the driver — planning
# a 100 TB container must not serialize multi-GB walks through one core
_VL_DRIVER_MAX_BYTES = 64 << 20


def _build_vl_index(f: GdsFile, vaxis: np.ndarray, info_meta, fmt_meta,
                    n_samp: int, spark=None, bc=None):
    """(vlpaths, vl_elem, vl_bytes) for every variable-length node a block
    kernel will slice. Keys are the nodes' CANONICAL paths (leading
    slash, exactly `f.node(p).path`) — the kernels look the per-block
    index up via `node.path`, so any key drift silently disables the
    random-access path and degrades every task to a from-zero varint
    walk (O(N^2/B) at scale).

    Small nodes are walked on the driver (streamed frame-by-frame and
    cached); nodes above _VL_DRIVER_MAX_BYTES are walked in parallel on
    executors via the broadcast container handle, returning only the
    O(n_blocks) boundary offsets."""
    vl_elem: dict[str, np.ndarray] = {}

    def _register_vl(p: str, elem_bounds) -> None:
        if _has(f, p) and f.node(p).kind in ("vlstr", "vlint"):
            vl_elem[f.node(p).path] = np.asarray(elem_bounds, dtype=np.int64)

    for p in ("variant.id", "chromosome", "allele", "annotation/id",
              "annotation/qual", "annotation/filter", "genotype/@data"):
        _register_vl(p, vaxis)
    for name, _, eoff in info_meta:
        _register_vl(f"annotation/info/@{name}", vaxis)
        _register_vl(f"annotation/info/{name}",
                     eoff[vaxis] if eoff is not None else vaxis)
    for name, _, roff, _ in fmt_meta:
        _register_vl(f"annotation/format/{name}/@data", vaxis)
        _register_vl(f"annotation/format/{name}/data", roff[vaxis] * n_samp)
    vlpaths = sorted(vl_elem)
    vl_bytes: dict[str, np.ndarray] = {}
    big = [
        p for p in vlpaths
        if f.node_stream_size(f.node(p)) > _VL_DRIVER_MAX_BYTES
    ]
    if big and spark is not None and bc is not None:
        items = [(p, vl_elem[p].tolist()) for p in big]

        def _walk(item):
            p, elems = item
            g = bc.value
            return p, _vl_byte_bounds(g, g.node(p), elems).tolist()

        for p, offs in (
            spark.sparkContext.parallelize(items, len(items)).map(_walk).collect()
        ):
            vl_bytes[p] = np.asarray(offs, dtype=np.int64)
    for p in vlpaths:
        if p not in vl_bytes:
            vl_bytes[p] = _vl_byte_bounds(f, f.node(p), vl_elem[p])
    return vlpaths, vl_elem, vl_bytes


def _row_vl(row, vlpaths):
    """Per-block VL byte index {path: (byte0, byte1, elem0)} from a
    blocks_df row."""
    if not vlpaths:
        return None
    return {
        p: (row["vb0"][i], row["vb1"][i], row["ve0"][i])
        for i, p in enumerate(vlpaths)
    }


def _has(f: GdsFile, path: str) -> bool:
    try:
        f.node(path)
        return True
    except KeyError:
        return False


def _extra_meta(f: GdsFile, idx_path: str):
    """(variant_index_0based, value_cum_offsets) for an extra.index node,
    or None when absent/empty. Driver memory is O(n_overflow_calls) —
    overflow entries exist only for mixed-ploidy calls."""
    if not _has(f, idx_path):
        return None
    node = f.node(idx_path)
    if not node.dims or node.dims[0] == 0:
        return None
    trip = np.asarray(f.read_array(idx_path)).reshape(-1, 3)
    vi0 = trip[:, 1].astype(np.int64) - 1
    lens = trip[:, 2].astype(np.int64)
    return vi0, np.concatenate([[0], np.cumsum(lens)])


def _py(v):
    """numpy -> python, translating the container's NA conventions
    (INT32_MIN for missing ints, NaN for missing floats — reference
    NA coding) to NULL."""
    if isinstance(v, (np.integer,)):
        i = int(v)
        return None if i == -(2 ** 31) else i
    if isinstance(v, (np.floating,)):
        f = float(v)
        return None if np.isnan(f) else f
    return v


def _block_sel_mask(row, s: int, e: int):
    """Per-variant keep mask for a block from its selected index ranges
    (sel0/sel1, global variant-index space), or None when the block is
    untrimmed (no pruning, or the block lies entirely inside one
    selected run). Trimming here — before the Arrow boundary — is what
    lets a pruned read skip the calls-side id semi-join entirely for
    chromosome selections (runs are exact chromosome spans)."""
    if "sel0" not in row.index:
        return None
    s0, e0 = row["sel0"], row["sel1"]
    if s0 is None or len(s0) == 0:
        return None
    if len(s0) == 1 and s0[0] <= s and e0[0] >= e:
        return None
    mask = np.zeros(e - s, dtype=bool)
    for a, b in zip(s0, e0):
        mask[max(int(a) - s, 0):max(int(b) - s, 0)] = True
    return mask


def _variants_block(g, s, e, row, imeta, filter_levels, vl=None,
                    fmt_names=None):
    vid = np.asarray(_node_slice(g, g.node("variant.id"), s, e, vl), dtype=np.int64)
    chrom = _node_slice(g, g.node("chromosome"), s, e, vl)
    pos = np.asarray(_node_slice(g, g.node("position"), s, e, vl))
    allele = _node_slice(g, g.node("allele"), s, e, vl)
    ref = [a.split(",", 1)[0] for a in allele]
    alt = [a.split(",")[1:] for a in allele]
    ann_id = (
        _node_slice(g, g.node("annotation/id"), s, e, vl)
        if _has(g, "annotation/id")
        else [None] * (e - s)
    )
    qual = (
        np.asarray(_node_slice(g, g.node("annotation/qual"), s, e, vl), dtype=np.float64)
        if _has(g, "annotation/qual")
        else np.full(e - s, np.nan)
    )
    if _has(g, "annotation/filter"):
        fvals = np.asarray(_node_slice(g, g.node("annotation/filter"), s, e, vl))
        if filter_levels:
            filt = [
                filter_levels[v - 1] if 1 <= v <= len(filter_levels) else None
                for v in fvals
            ]
        else:
            # factor code < 1 is the unset level (writer emits 0 for a
            # NULL filter when no levels exist)
            filt = [str(v) if v >= 1 else None for v in fvals]
    else:
        filt = [None] * (e - s)
    out = {
        "variant_id": vid,
        "chromosome": chrom,
        "position": pos,
        "id": [x if x else None for x in ann_id],
        "ref": ref,
        "alt": alt,
        "qual": [None if np.isnan(q) else float(q) for q in qual],
        "filter": filt,
    }
    if imeta:
        info_cols = {}
        for k, (name, kind, is_var) in enumerate(imeta):
            node = g.node(f"annotation/info/{name}")
            if is_var:
                e0, e1 = int(row["i0"][k]), int(row["i1"][k])
                flat = _node_slice(g, node, e0, e1, vl)
                counts = np.asarray(
                    _node_slice(g, g.node(f"annotation/info/@{name}"), s, e, vl)
                )
                vals, off = [], 0
                for c in counts:
                    vals.append([_py(x) for x in flat[off:off + int(c)]])
                    off += int(c)
                info_cols[name] = vals
            elif kind == "bit1":
                info_cols[name] = [bool(x) for x in _node_slice(g, node, s, e, vl)]
            elif kind == "vlstr":
                # the container stores missing strings as "" (reference
                # NA convention); surface as NULL for VCF parity
                info_cols[name] = [x or None for x in _node_slice(g, node, s, e, vl)]
            else:
                info_cols[name] = [_py(x) for x in _node_slice(g, node, s, e, vl)]
        out["info"] = [
            {name: info_cols[name][i] for name, _, _ in imeta} for i in range(e - s)
        ]
    if fmt_names:
        # per-variant FORMAT presence from the stored @data row counts —
        # the reference's own model: 0 rows = field absent at the
        # variant, omitted from FORMAT on re-export (ExportInfoFormat's
        # Rf_isNull skip, src/ConvGDS2VCF.cpp:546-554); no @data index
        # node means one row per variant (always present)
        pres: list[list[str]] = [[] for _ in range(e - s)]
        for name in fmt_names:
            idx_path = f"annotation/format/{name}/@data"
            if _has(g, idx_path):
                cnts = np.asarray(
                    _node_slice(g, g.node(idx_path), s, e, vl), dtype=np.int64
                )
                hit = np.flatnonzero(cnts > 0)
            else:
                hit = range(e - s)
            for i in hit:
                pres[int(i)].append(name)
        out["fmt_present"] = pres
    pdf = pd.DataFrame(out)
    mask = _block_sel_mask(row, s, e)
    return pdf if mask is None else pdf[mask]


def _mask_to_obj(a: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Numpy values -> object array with `mask` positions set to None
    (C-speed NA translation; replaces per-element Python conditionals)."""
    out = a.astype(object)
    out[mask] = None
    return out


def _calls_block(g, row, sample_ids, ploidy, fmeta, vl=None, s_sel=None):
    """s_sel: optional np array of selected 0-based sample ordinals —
    the sample-axis prune (reference seqSetFilter(sample.id=) pushed
    into the scan): bit planes decode whole rows (packing is per full
    sample row), but the per-cell Python list building, FORMAT
    expansion, and Arrow transfer all run at |selection|, the dominant
    costs of the calls side."""
    s, e = int(row["start"]), int(row["end"])
    p0, p1 = int(row["p0"]), int(row["p1"])
    n_all = len(sample_ids)
    if s_sel is None:
        sub_ids = sample_ids
        n_samp = n_all
        remap = None
    else:
        sub_ids = [sample_ids[i] for i in s_sel]
        n_samp = len(sub_ids)
        remap = np.full(n_all, -1, dtype=np.int64)
        remap[s_sel] = np.arange(n_samp)
    nv = e - s
    has_geno = _has(g, "genotype/data") and g.node("genotype/data").dims[0] > 0
    # column-pruned bit-plane decode pays when the selection is a
    # minority of the row; near-full selections keep the bulk unpack
    # (contiguous shifts beat an equally-sized gather)
    prune_bits = s_sel is not None and 2 * len(s_sel) <= n_all
    if has_geno:
        geno_node = g.node("genotype/data")
        counts = np.asarray(_node_slice(g, g.node("genotype/@data"), s, e, vl),
                            dtype=np.int64) \
            if _has(g, "genotype/@data") else np.ones(nv, dtype=np.int64)
        # assemble per-variant allele codes from stacked bit2 planes:
        # whole-block shift + grouped bitwise-or (reduceat over plane
        # rows), no per-variant Python loop
        npl = p1 - p0
        if prune_bits:
            # decode ONLY the selected samples' 2-bit codes (the
            # reference's transposed ~data read, src/ReadBySample.cpp:
            # 98-160): plane width becomes |selection|*ploidy and every
            # step below scales with the selection
            ent = (
                np.asarray(s_sel, dtype=np.int64)[:, None] * ploidy
                + np.arange(ploidy, dtype=np.int64)
            ).ravel()
            P = _bit_rows_sel(
                g, geno_node, p0, p1, n_all * ploidy, ent
            ).astype(np.int64)
            width = n_samp * ploidy
        else:
            planes = np.asarray(
                _bit_rows(g, geno_node, p0, p1, n_all * ploidy), dtype=np.int64
            )
            P = planes.reshape(npl, n_all * ploidy)
            width = n_all * ploidy
        if npl == nv and counts.max(initial=1) == 1:
            acc = P
        elif (counts >= 1).all():
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            k_of = np.arange(npl) - np.repeat(starts, counts)
            acc = np.bitwise_or.reduceat(P << (2 * k_of)[:, None], starts, axis=0)
        else:  # degenerate zero-plane variants: per-variant fallback
            acc = np.zeros((nv, width), dtype=np.int64)
            off = 0
            for i, c in enumerate(counts):
                for k in range(int(c)):
                    acc[i] |= P[off + k] << (2 * k)
                off += int(c)
        if int(counts.max(initial=1)) >= 8:
            # >= 8 bit2 planes would mean allele codes >= 2^15 — beyond
            # the array<smallint> schema; fail loudly instead of letting
            # the int16 cast below wrap silently
            raise ValueError(
                f"variant block [{s},{e}) has {int(counts.max())} genotype "
                "bit planes; allele codes exceed the int16 call schema"
            )
        alleles = acc.reshape(nv, width // ploidy, ploidy)
        if s_sel is not None and not prune_bits:
            alleles = alleles[:, s_sel, :]
        is_missing = alleles == ((1 << (2 * counts)) - 1)[:, None, None]
    phase_vals = None
    if has_geno and _has(g, "phase/data") and g.node("phase/data").dims[0] > 0:
        if ploidy <= 1:
            phase_vals = None
        elif prune_bits:
            ent_ph = (
                np.asarray(s_sel, dtype=np.int64)[:, None] * (ploidy - 1)
                + np.arange(ploidy - 1, dtype=np.int64)
            ).ravel()
            phase_vals = _bit_rows_sel(
                g, g.node("phase/data"), s, e, n_all * (ploidy - 1), ent_ph
            ).astype(bool).reshape(nv, n_samp, ploidy - 1)
        else:
            phase_vals = np.asarray(
                _bit_rows(g, g.node("phase/data"), s, e, n_all * (ploidy - 1)),
                dtype=bool,
            ).reshape(nv, n_all, ploidy - 1)
            if s_sel is not None:
                phase_vals = phase_vals[:, s_sel, :]

    vid = np.asarray(_node_slice(g, g.node("variant.id"), s, e, vl), dtype=np.int64)
    if has_geno:
        alleles_col = _mask_to_obj(
            alleles.astype(np.int16), np.asarray(is_missing)
        ).reshape(nv * n_samp, ploidy).tolist()
    else:
        alleles_col = [None] * (nv * n_samp)
    if phase_vals is not None:
        phased_col = phase_vals.reshape(nv * n_samp, max(ploidy - 1, 0)).tolist()
    else:
        phased_col = [[]] * (nv * n_samp)
    out = {
        "variant_id": np.repeat(vid, n_samp),
        "sample_id": np.tile(np.asarray(sub_ids, dtype=object), nv),
        "alleles": alleles_col,
        "phased": phased_col,
    }
    # splice mixed-ploidy overflow (reference genotype/extra + phase/extra,
    # src/ConvVCF2GDS.cpp:1775-1797): append each entry's values to the
    # owning call's list
    if has_geno and int(row["g1"]) > int(row["g0"]):
        _apply_extra(
            g, "genotype", row["g0"], row["g1"], row["go"], s, n_samp,
            out["alleles"], lambda x: None if x < 0 else int(x), remap,
        )
    if phase_vals is not None and int(row["q1"]) > int(row["q0"]):
        _apply_extra(
            g, "phase", row["q0"], row["q1"], row["qo"], s, n_samp,
            out["phased"], lambda x: bool(x), remap,
        )
    for k, (name, kind, is_arr) in enumerate(fmeta):
        node = g.node(f"annotation/format/{name}/data")
        r0, r1 = int(row["f0"][k]), int(row["f1"][k])
        flat = _node_slice_2d(g, node, r0, r1, n_all, vl)
        rcounts = np.asarray(
            _node_slice(g, g.node(f"annotation/format/{name}/@data"), s, e, vl),
            dtype=np.int64,
        ) if _has(g, f"annotation/format/{name}/@data") else np.ones(nv, dtype=np.int64)
        out[name] = _format_col(flat, rcounts, nv, n_all, is_arr, s_sel)
    pdf = pd.DataFrame(out)
    mask = _block_sel_mask(row, s, e)
    # per-variant mask expands across the block's sample axis; applied
    # AFTER _apply_extra (overflow entries index by in-block call slot)
    return pdf if mask is None else pdf[np.repeat(mask, n_samp)]


def _na_mask(a: np.ndarray) -> np.ndarray:
    """Container NA convention per dtype: NaN for floats, INT32_MIN for
    ints (reference NA coding)."""
    if a.dtype.kind == "f":
        return np.isnan(a)
    if a.dtype.kind in "iu":
        return a == -(2 ** 31)
    return np.zeros(a.shape, dtype=bool)


def _format_col(flat, rcounts, nv, n_all, is_arr, s_sel=None):
    """One FORMAT field column for a block: rows of n_all stored values
    grouped per variant by rcounts, optionally subset to the s_sel
    sample ordinals. Uniform row counts take the vectorized reshape
    path; ragged falls back to the per-variant loop."""
    n_samp = n_all if s_sel is None else len(s_sel)
    uniform = nv > 0 and rcounts.min(initial=1) == rcounts.max(initial=1)
    if uniform and not isinstance(flat, list):
        c = int(rcounts[0]) if len(rcounts) else 1
        a = np.asarray(flat)[: nv * c * n_all]
        obj = _mask_to_obj(a, _na_mask(a))
        if is_arr:
            # (nv, c, n_all) -> per-call [v_r0..v_rc] lists
            cube = obj.reshape(nv, c, n_all)
            if s_sel is not None:
                cube = cube[:, :, s_sel]
            return cube.transpose(0, 2, 1).reshape(nv * n_samp, c).tolist()
        if c == 1:
            if s_sel is not None:
                return list(obj.reshape(nv, n_all)[:, s_sel].reshape(-1))
            return list(obj)
    cols = range(n_all) if s_sel is None else s_sel
    vals, off = [], 0
    for i, c in enumerate(rcounts):
        c = int(c)
        if is_arr:
            # variant's c rows -> per-sample value lists
            vals.extend(
                [_py(flat[(off + r) * n_all + j]) for r in range(c)]
                for j in cols
            )
        elif c < 1:
            vals.extend([None] * n_samp)
        else:
            vals.extend(_py(flat[off * n_all + j]) for j in cols)
        off += c
    return vals


def _apply_extra(g, folder, e0, e1, off0, s, n_samp, lists, conv,
                 remap=None):
    """Append overflow values from <folder>/extra to the per-call lists
    for extra.index entries [e0, e1). `remap` (sample-pruned reads)
    maps stored 0-based sample ordinals to selected positions, -1 =
    sample not selected (the entry's values are skipped but the value
    cursor still advances — offsets are absolute in the stream)."""
    e0, e1, off0 = int(e0), int(e1), int(off0)
    trip = np.asarray(
        _node_slice_2d(g, g.node(f"{folder}/extra.index"), e0, e1, 3)
    ).reshape(-1, 3)
    total = int(trip[:, 2].sum())
    vals = np.asarray(
        _node_slice(g, g.node(f"{folder}/extra"), off0, off0 + total)
    )
    off = 0
    for sidx, vidx, ln in trip:
        li = int(vidx) - 1 - s
        j = int(sidx) - 1
        ln = int(ln)
        if remap is not None:
            j = int(remap[j])
            if j < 0:
                off += ln
                continue
        k = li * n_samp + j
        lists[k] = list(lists[k]) + [conv(x) for x in vals[off:off + ln]]
        off += ln


def _node_slice_2d(g, node, r0, r1, n_cols, vl=None):
    """Rows [r0, r1) of a 2-D (rows x n_cols) node, flattened."""
    if node.kind in ("vlstr", "vlint"):
        return _vl_slice(g, node, r0 * n_cols, r1 * n_cols,
                         (vl or {}).get(node.path))
    if node.kind in ("bit1", "bit2"):
        return _bit_rows(g, node, r0, r1, n_cols)
    return _node_slice(g, node, r0 * n_cols, r1 * n_cols)
