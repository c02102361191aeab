"""Tabix (.tbi) index writer — htslib-free.

The reference ships index-ready bgzf output via Rsamtools
(R/Conversion.R:118-132: bgzip + indexTabix); this module completes the
same story on top of the pure-Python BGZF writer (sources/bgzf.py): the
VCF exporter compresses parts executor-side while recording each line's
BGZF *virtual offset* ((compressed_block_start << 16) | offset_in_block),
and the driver merges the per-part bin/linear fragments into a single
spec-compliant `.tbi` (SAM/tabix spec §"Tabix index"; htslib tbx.c is
the behavioral model: VCF preset format=2, seq col 1, begin col 2,
end col 0 with end inferred as pos + len(REF), meta '#').

Index layout is the UCSC binning scheme: 5 levels of bins over a 512 Mb
range plus a 16 kb-window linear index per reference sequence. The whole
index payload is itself BGZF-compressed.
"""

from __future__ import annotations

import struct

from seqarray_spark.sources.bgzf import BgzfWriter

WINDOW = 1 << 14  # 16 kb linear-index window

# tbx.c preset constants (TBX_VCF)
_FMT_VCF = 2


def reg2bin(beg: int, end: int) -> int:
    """UCSC bin for a 0-based half-open interval (SAM spec reg2bin)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def write_tbi(
    path: str,
    names: list[str],
    bins_per_ref: list[dict[int, list[tuple[int, int]]]],
    linear_per_ref: list[list[int]],
) -> None:
    """Serialize a VCF-preset tabix index.

    names: reference sequence names in file order.
    bins_per_ref[i]: {bin_id: [(virtual_begin, virtual_end), ...]}.
    linear_per_ref[i]: 16 kb-window -> smallest virtual offset (forward-
    filled; leading windows with no data may be 0 = file start).
    """
    out = bytearray()
    out += b"TBI\x01"
    out += struct.pack("<i", len(names))
    nm = b"".join(n.encode("utf-8") + b"\x00" for n in names)
    out += struct.pack(
        "<6i", _FMT_VCF, 1, 2, 0, ord("#"), 0
    )  # format, col_seq, col_beg, col_end, meta, skip
    out += struct.pack("<i", len(nm)) + nm
    for bins, lin in zip(bins_per_ref, linear_per_ref):
        out += struct.pack("<i", len(bins))
        for b in sorted(bins):
            chunks = bins[b]
            out += struct.pack("<Ii", b, len(chunks))
            for v0, v1 in chunks:
                out += struct.pack("<QQ", v0, v1)
        out += struct.pack("<i", len(lin))
        for v in lin:
            out += struct.pack("<Q", v)
    with BgzfWriter(path) as w:
        w.write(bytes(out))


def read_tbi(path: str):
    """Struct-level .tbi parser (for tests / verification): returns
    (names, bins_per_ref, linear_per_ref)."""
    import gzip

    raw = gzip.open(path, "rb").read()
    assert raw[:4] == b"TBI\x01", "not a tabix index"
    (n_ref,) = struct.unpack_from("<i", raw, 4)
    fmt, c_seq, c_beg, c_end, meta, skip = struct.unpack_from("<6i", raw, 8)
    (l_nm,) = struct.unpack_from("<i", raw, 32)
    names = raw[36:36 + l_nm].split(b"\x00")[:-1]
    names = [n.decode("utf-8") for n in names]
    o = 36 + l_nm
    bins_per_ref, linear_per_ref = [], []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", raw, o)
        o += 4
        bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", raw, o)
            o += 8
            ch = []
            for _ in range(n_chunk):
                v0, v1 = struct.unpack_from("<QQ", raw, o)
                o += 16
                ch.append((v0, v1))
            bins[b] = ch
        (n_intv,) = struct.unpack_from("<i", raw, o)
        o += 4
        lin = list(struct.unpack_from(f"<{n_intv}Q", raw, o))
        o += 8 * n_intv
        bins_per_ref.append(bins)
        linear_per_ref.append(lin)
    return names, bins_per_ref, linear_per_ref
