"""GDS (CoreArray) container reader — pure Python/numpy, no gdsfmt.

The reference's entire entry point is a `.gds` file (seqOpen,
/root/reference/R/Methods.R:12-98; node layout R/AllClasses.R:20-24,
src/Index.h:154-200). This module reads that container directly so
existing SeqArray users can load their files without R installed.

The CoreArray format was reverse-engineered from the reference's own
fixtures (inst/extdata/CEU_Exon.gds, 1KG_phase1_release_v3_chr22.gds,
Imputed_dosages.gds) and validated against the matching CEU_Exon.vcf.gz
(the equivalence the reference itself tests in
inst/unitTests/test_asVCF.R:70-186). Layout, as observed:

  file   := "COREARRAYx0A" u16 version u32 root_id fragment*
  frag   := [u48 size|HEAD_BIT][u48 next_frag_pos][u32 stream_id] data
            (size includes this 16-byte head; fragments tile the file)
  stream := fragments with the same id, head fragment first, chained by
            `next`
  dir    := folder streams hold child entries:
            [u48 len][10B fixed][u32 child_id][5B][u32 flags][5B]
            [varint name_len][name]   flags: 0x02 folder, 0x10 hidden
  node   := array streams hold:
            [u48 used][u48 used][u16][2B] [class signature]
            {0x15 <id4> [len coder]}            (absent if uncompressed)
            {0x02 0xc9... [u64 total][u64 comp]} (absent if uncompressed)
            0x07 <id4> [u16 ndim] 0x02 <id3> [u8 nbytes][u32 dims...]
            0x09 <id4> [u32 data_stream_id]
            {0x13 <id4> [TdsAny param]}*        (packedreal offset/scale)
            0x08 <id5> [u32 n_attrs] 0x01 <id7> [u48 nbytes] attrs
  attrs  := ([varint name_len][name][1B type]
             type 0x0e/0x11: [varint len][bytes]
             type 0x21: [u32 n][element*])*
  data   := raw bytes, or "XZ_RA" random-access container:
            [u48 size]["XZ_RA" 0x10][u8 bsize_log2][0xff][u32 nframes]
            then per frame: v16 entry [u24 comp][u16 rem][u8 units]
                            v17 entry [u24 comp][u16 rem][u16 units]
            comp includes the entry; each frame is an xz stream covering
            units*(1<<bsize_log2)+rem uncompressed bytes (0 = whole node)

Class signatures are opaque per-class byte strings; the table below maps
every signature appearing in SeqArray files (calibrated on the fixtures,
each verified value-for-value against the VCF ground truth).

Scale design: metadata (node tree, dims, frame index) is tiny and parsed
on the driver; bulk decode happens in Spark tasks via mapInPandas over
variant block ranges (sources/gds_spark.py). A task reads only the xz
frames overlapping its block — random access by construction, so a
1000-executor cluster reads one 100 TB .gds concurrently with no
driver-side data movement.
"""

from __future__ import annotations

import lzma
import mmap
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

_PREFIX = b"COREARRAYx0A"
_HEAD_BIT = 1 << 47
_XZ_MAGIC = b"\xfd7zXZ\x00"

# anchors inside node object streams (property-id byte patterns; constant
# across all fixture files and gdsfmt versions observed)
_CODER_TAG = bytes.fromhex("15c4466d10")
_SIZES_TAG = bytes.fromhex("02c9466d50e051250410")
_NDIM_TAG = bytes.fromhex("07c4e3641f")
_DIM_TAG = bytes.fromhex("02c34361")
_DSTREAM_TAG = bytes.fromhex("09c4c37c0c")
_NATTR_TAG = bytes.fromhex("0807f37d9d937d")
_ATTR_TAG = bytes.fromhex("0108f37ddd45791f")
_PARAM_TAG = 0x13

# class signature -> storage kind. A signature is the CoreArray class
# NAME 7-bit-packed into a little-endian bitstream (7 bits per ASCII
# char, bytes filled LSB-first) — verified by decoding every signature
# observed in the fixtures back to its class name (dInt32, dStr8,
# dBit2, dVL_Int, dPackedReal8U, ...), so unobserved classes can be
# generated with _pack7 below.
_CLASS_SIGS = {
    bytes.fromhex("e4295d8e03"): "vlstr",        # dStr8 (VL UTF-8)
    bytes.fromhex("e4a49b3e9301"): "int32",      # dInt32
    bytes.fromhex("e4a49b1eb301"): "int16",      # dInt16
    bytes.fromhex("e46ad24dc701"): "uint8",      # dUInt8
    bytes.fromhex("64619a2e03"): "bit2",         # dBit2
    bytes.fromhex("64619a1e03"): "bit1",         # dBit1
    bytes.fromhex("6423fb1da6cf64"): "float32",  # dFloat32
    bytes.fromhex("6423fb1da6db68"): "float64",  # dFloat64
    bytes.fromhex("642bf39b74d301"): "vlint",    # dVL_Int (zigzag LEB128)
    # packed fixed-point reals (offset/scale params; reference stores
    # imputation dosage as packedreal16, R/ConvVCF2GDS.R:578-583)
    bytes.fromhex("646878bc2e93a5e5301b5705"): "packedreal8",     # dPackedReal8U
    bytes.fromhex("646878bc2e93a5e5303b6603"): "packedreal16",    # dPackedReal16
    bytes.fromhex("646878bc2e93a5e5303b66ab02"): "packedreal16u",  # dPackedReal16U
}

# class-default quantization scales (explicit node param wins; the
# 8/16-bit values are gdsfmt's documented defaults — the reference's
# imputation mode sets 0.0001 explicitly, R/ConvVCF2GDS.R:580 — and the
# 24/32-bit values extend the same decade-per-byte progression)
_PR_DEFAULT_SCALE = {
    "packedreal8": 0.01, "packedreal8u": 0.01,
    "packedreal16": 0.0001, "packedreal16u": 0.0001,
    "packedreal24": 0.00001, "packedreal24u": 0.00001,
    "packedreal32": 0.000001, "packedreal32u": 0.000001,
}


def _pack7(name: str) -> bytes:
    """CoreArray class-name signature: 7-bit chars, LSB-first bitstream."""
    bits = []
    for ch in name:
        c = ord(ch)
        bits += [(c >> i) & 1 for i in range(7)]
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(bits[8 * j + i] << i for i in range(8)) for j in range(len(bits) // 8)
    )


# the remaining gdsfmt packedreal widths: signatures generated with
# _pack7 from the class names (the same 7-bit packing every observed
# signature decodes back through), completing the family both ways
_CLASS_SIGS.update({
    _pack7("dPackedReal24"): "packedreal24",
    _pack7("dPackedReal24U"): "packedreal24u",
    _pack7("dPackedReal32"): "packedreal32",
    _pack7("dPackedReal32U"): "packedreal32u",
})


_ELEM_SIZE = {
    "int32": 4, "int16": 2, "uint8": 1, "float32": 4, "float64": 8,
    "packedreal8": 1, "packedreal16": 2, "packedreal16u": 2,
    "packedreal24": 3, "packedreal24u": 3,
    "packedreal32": 4, "packedreal32u": 4,
}


def _u48(b: bytes, o: int) -> int:
    return int.from_bytes(b[o:o + 6], "little")


def _varint(b: bytes, o: int):
    """7-bit little-endian varint (used for string lengths)."""
    v = shift = 0
    while True:
        c = b[o]
        o += 1
        v |= (c & 0x7F) << shift
        shift += 7
        if not (c & 0x80):
            return v, o


def _decompress_frame(codec: str, data: bytes, un: int | None = None) -> bytes:
    """One _RA frame -> its uncompressed bytes ("xz" = standalone xz
    stream, "zip" = standalone zlib stream, "lz4" = one LZ4 block whose
    decoded size `un` comes from the frame entry). Module-level so tests
    can spy on per-frame decompression counts."""
    if codec == "zip":
        return zlib.decompressobj().decompress(data)
    if codec == "lz4":
        from seqarray_spark.sources.lz4_block import decompress_block

        return decompress_block(data, un if un is not None else 0)
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
    return dec.decompress(data)


def _find_in_view(d, pat: bytes, start: int) -> int:
    """bytes.find over a memoryview, searching in bounded chunks so the
    view is never materialized whole (rare recovery path)."""
    step = 1 << 20
    n = len(d)
    o = start
    while o < n:
        chunk = bytes(d[o:o + step + len(pat)])
        i = chunk.find(pat)
        if i >= 0:
            return o + i
        o += step
    return -1


@dataclass
class GdsNode:
    name: str
    path: str
    stream_id: int
    flags: int
    parent: "GdsNode | None" = None
    children: "list[GdsNode]" = field(default_factory=list)
    # arrays only
    kind: str | None = None
    sig: bytes | None = None
    coder: str = ""
    total_bytes: int = 0
    ndim: int = 0
    dims: tuple = ()
    data_stream: int | None = None
    attrs: dict = field(default_factory=dict)
    params: dict = field(default_factory=dict)  # packedreal offset/scale

    @property
    def is_folder(self) -> bool:
        return bool(self.flags & 0x02)

    @property
    def is_hidden(self) -> bool:
        return bool(self.flags & 0x10)

    def child(self, name: str) -> "GdsNode | None":
        for c in self.children:
            if c.name == name:
                return c
        return None


class GdsFile:
    """Driver-side GDS container index: fragments, node tree, node
    metadata. Opening mmaps the file and reads only the small object
    streams (KBs), never array data — pages fault in on demand.

    Instances PICKLE as metadata only (fragment table + node tree, a few
    KB): ship one parsed GdsFile to executors via `sc.broadcast` and each
    worker process lazily re-mmaps the path on first data access, so a
    1000-task read parses the container exactly once."""

    def __init__(self, path: str):
        self.path = path
        self._mm = None
        self._fidx: dict[str, tuple] = {}
        data = self._buf()
        if data[:12] != _PREFIX:
            raise ValueError(f"{path}: not a GDS (CoreArray) file")
        self.version = struct.unpack("<H", data[12:14])[0]
        self._frags: dict[int, list[tuple[int, int, int, bool]]] = {}
        o = 0x12
        end = len(data)
        while o + 16 <= end:
            raw = _u48(data, o)
            nxt = _u48(data, o + 6)
            sid = struct.unpack("<I", data[o + 12:o + 16])[0]
            size = raw & (_HEAD_BIT - 1)
            if size < 16:
                raise ValueError(f"{path}: corrupt fragment at {o:#x}")
            self._frags.setdefault(sid, []).append(
                (o + 16, size - 16, nxt, bool(raw & _HEAD_BIT))
            )
            o += size
        if o != end:
            raise ValueError(f"{path}: fragments do not tile the file")
        self.root = GdsNode(name="", path="", stream_id=1, flags=0x02)
        self._load_folder(self.root)

    def _buf(self):
        """The file's bytes as an mmap (lazy page-in; reopened on first
        access after unpickling)."""
        if self._mm is None:
            with open(self.path, "rb") as fh:
                import os

                if os.fstat(fh.fileno()).st_size == 0:
                    raise ValueError(f"{self.path}: not a GDS (CoreArray) file")
                self._mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
        return self._mm

    def __getstate__(self):
        st = self.__dict__.copy()
        st["_mm"] = None
        st["_fidx"] = {}  # holds buffer views; rebuilt per process
        return st

    def __setstate__(self, st):
        self.__dict__.update(st)

    # -- streams -----------------------------------------------------------
    def stream_bytes(self, sid: int) -> bytes:
        data = self._buf()
        frags = self._ordered_frags(sid)
        return b"".join(data[a:a + n] for a, n, _, _ in frags)

    def data_view(self, sid: int):
        """A node data stream as a zero-copy memoryview when it is a
        single fragment (the common case — gdsfmt writes each array's
        data contiguously), else the joined bytes. Slicing the result
        never materializes more than the slice."""
        data = self._buf()
        frags = self._ordered_frags(sid)
        if len(frags) == 1:
            a, n, _, _ = frags[0]
            return memoryview(data)[a:a + n]
        return memoryview(b"".join(data[a:a + n] for a, n, _, _ in frags))

    def _ordered_frags(self, sid: int):
        frags = self._frags.get(sid, [])
        if len(frags) <= 1 or all(f[2] == 0 for f in frags):
            return frags
        # multi-fragment stream: head first, then follow next-pointers
        by_off = {a - 16: f for f in frags for a in (f[0],)}
        head = next(f for f in frags if f[3])
        out, cur = [head], head
        while cur[2]:
            cur = by_off[cur[2]]
            out.append(cur)
        return out

    # -- directory ---------------------------------------------------------
    def _load_folder(self, folder: GdsNode) -> None:
        d = self.stream_bytes(folder.stream_id)
        sig = bytes.fromhex("0902f500")
        i = d.find(sig)
        i = 16 if i < 0 else i - 8  # no entries -> empty folder
        while i < len(d) - 10:
            elen = _u48(d, i)
            if not (20 < elen < 4096):
                break
            ent = d[i:i + elen]
            child_id = struct.unpack("<I", ent[12:16])[0]
            flags = struct.unpack("<I", ent[21:25])[0]
            nlen, no = _varint(ent, 30)
            name = ent[no:no + nlen].decode("utf-8", "replace")
            node = GdsNode(
                name=name,
                path=f"{folder.path}/{name}",
                stream_id=child_id,
                flags=flags,
                parent=folder,
            )
            folder.children.append(node)
            if node.is_folder:
                self._load_folder(node)
            else:
                # third-party .gds files can hold node classes without the
                # coder/ndim anchors (scalar/NULL gdsfmt nodes); leave those
                # listable-but-undecodable instead of aborting the open
                try:
                    self._load_array_meta(node)
                except (ValueError, AssertionError, KeyError, struct.error):
                    node.kind = None
            i += elen
        # folder-level attributes (e.g. FORMAT Number/Type/Description on
        # annotation/format/<name>) follow the entry list
        na = d.find(_NATTR_TAG, i)
        if na >= 0:
            o = na + len(_NATTR_TAG)
            n_attrs = struct.unpack("<I", d[o:o + 4])[0]
            o += 4
            if d[o:o + len(_ATTR_TAG)] == _ATTR_TAG:
                folder.attrs = _parse_attrs(d, o + len(_ATTR_TAG) + 6, n_attrs)

    # -- node object parse -------------------------------------------------
    def _load_array_meta(self, node: GdsNode) -> None:
        d = self.stream_bytes(node.stream_id)
        o = 16  # [u48 used][u48 used][u16 nprops?][2B]
        # class signature runs until the first known property anchor
        coder_at = d.find(_CODER_TAG, o)
        ndim_at = d.find(_NDIM_TAG, o)
        stop = min(x for x in (coder_at, ndim_at) if x >= 0)
        node.sig = d[o + 1:stop]  # skip length byte
        node.kind = _CLASS_SIGS.get(node.sig)
        o = stop
        if o == coder_at:
            o += len(_CODER_TAG)
            clen, o = _varint(d, o)
            node.coder = d[o:o + clen].decode("ascii", "replace")
            o += clen
            if d[o:o + len(_SIZES_TAG)] == _SIZES_TAG:
                o += len(_SIZES_TAG)
                node.total_bytes = struct.unpack("<Q", d[o:o + 8])[0]
                o += 16  # total + compressed
        # two allocator property groups (0x05 ca46 6d50 ... / 0x05 cb46
        # 6d50 ...) sit between sizes and ndim; anchor-search past them
        o = d.find(_NDIM_TAG, o)
        assert o >= 0, (node.path, "ndim tag not found")
        o += len(_NDIM_TAG)
        node.ndim = struct.unpack("<H", d[o:o + 2])[0]
        o += 2
        assert d[o:o + len(_DIM_TAG)] == _DIM_TAG, node.path
        o += len(_DIM_TAG)
        nbytes = d[o]
        o += 1
        per = nbytes // node.ndim if node.ndim else 4
        fmt = {4: "<I", 8: "<Q"}[per]
        node.dims = tuple(
            struct.unpack(fmt, d[o + k * per:o + (k + 1) * per])[0]
            for k in range(node.ndim)
        )
        o += nbytes
        assert d[o:o + len(_DSTREAM_TAG)] == _DSTREAM_TAG, node.path
        o += len(_DSTREAM_TAG)
        node.data_stream = struct.unpack("<I", d[o:o + 4])[0]
        o += 4
        # optional parameter props (packedreal offset/scale, VL index)
        while o < len(d) and d[o] in (_PARAM_TAG, 0x09):
            if d[o] == 0x09 and d[o:o + len(_NATTR_TAG)] != _NATTR_TAG:
                o += 5 + 4  # auxiliary stream ref (e.g. VL-int offset index)
                continue
            if d[o] != _PARAM_TAG:
                break
            pid = d[o + 1:o + 5]
            o += 5
            if d[o] == 0x04:  # TdsAny float64
                val = struct.unpack("<d", d[o + 1:o + 9])[0]
                node.params[pid.hex()] = val
                o += 9
            else:  # unknown TdsAny payload: skip to next known tag
                nxt = [d.find(t, o) for t in (bytes([_PARAM_TAG]), _NATTR_TAG)]
                nxt = [x for x in nxt if x > 0]
                o = min(nxt) if nxt else len(d)
        na = d.find(_NATTR_TAG, o)
        if na >= 0:
            o = na + len(_NATTR_TAG)
            n_attrs = struct.unpack("<I", d[o:o + 4])[0]
            o += 4
            if d[o:o + len(_ATTR_TAG)] == _ATTR_TAG:
                o += len(_ATTR_TAG)
                o += 6  # u48 attr bytes
                node.attrs = _parse_attrs(d, o, n_attrs)
        # packed-real parameters: scale prop id 85e73017 (observed)
        if "85e73017" in node.params:
            node.params["scale"] = node.params["85e73017"]
        # fall back on element size for packed reals / unknown classes
        if node.kind is None and node.ndim and node.total_bytes:
            n = 1
            for x in node.dims:
                n *= x
            if n:
                per = node.total_bytes / n
                node.kind = {1: "packedreal8", 2: "packedreal16"}.get(per)

    # -- data --------------------------------------------------------------
    def _frame_index(self, node: GdsNode):
        """(frames, view, codec) for a node's data stream, cached per
        node. frames is a list of (data_off, uncomp_len, comp_end) per
        compressed frame — comp_end bounds the decompressor's input so a
        range read touches only its frames' bytes — or None for a raw
        stream, or "full" when the whole stream had to be decompressed
        (legacy zlib whole-stream coding). codec is "xz" or "zip"."""
        hit = self._fidx.get(node.path)
        if hit is not None:
            return hit
        d = self.data_view(node.data_stream)
        if not node.coder:
            res = (None, d, "")
            self._fidx[node.path] = res
            return res
        if bytes(d[6:11]) == b"XZ_RA":
            frames = self._parse_ra_entries(d, 11, node)
            res = (frames, d, "xz")
            self._fidx[node.path] = res
            return res
        if bytes(d[6:12]) == b"LZ4_RA":
            # LZ4_RA random-access container (stock seqStorageOption
            # codec family, R/Utilities.R:250-252): same header/entry
            # layout as ZIP_RA, frames are LZ4 blocks (sources/lz4_block)
            frames = self._parse_ra_indexed(d, node, zlib_check=False)
            if frames is None:
                raise ValueError(
                    f"{node.path}: corrupt LZ4_RA frame index"
                )
            res = (frames, d, "lz4")
            self._fidx[node.path] = res
            return res
        if bytes(d[6:12]) == b"ZIP_RA" or node.coder.upper().startswith("ZIP"):
            # ZIP_ra random-access container (same frame-entry family as
            # XZ_RA, zlib streams instead of xz). zlib streams do not
            # carry a searchable magic, so the parse is validated — every
            # chained entry must land on a zlib header and the entry walk
            # must tile the stream; on any mismatch fall back to
            # whole-stream decompression (legacy layout)
            if bytes(d[6:12]) == b"ZIP_RA":
                frames = self._parse_zip_ra(d, node)
                if frames is not None:
                    res = (frames, d, "zip")
                    self._fidx[node.path] = res
                    return res
            head = bytes(d[6:4096])
            z0 = 6 + head.index(b"\x78")
            res = ("full", zlib.decompress(bytes(d[z0:])), "zip")
            self._fidx[node.path] = res
            return res
        raise ValueError(f"{node.path}: unsupported coder {node.coder!r}")

    def _parse_ra_entries(self, d, magic_end: int, node: GdsNode):
        """Entry walk for an XZ_RA stream: [u8 version][u8 bsize_log2]
        [0xff][u32 nframes] then per frame [u24 comp][u16 rem]
        [u8/u16 units][xz stream] (comp includes the entry)."""
        bsize = 1 << d[magic_end + 1]
        nframes = struct.unpack("<I", d[magic_end + 3:magic_end + 7])[0]
        e0 = magic_end + 7
        # first frame follows entry 0 — its magic fixes the entry width
        entry_w = bytes(d[e0:e0 + 22]).find(_XZ_MAGIC)
        frames, o = [], e0
        for k in range(nframes):
            comp = int.from_bytes(d[o:o + 3], "little")
            rem = int.from_bytes(d[o + 3:o + 5], "little")
            units = int.from_bytes(d[o + 5:o + entry_w], "little")
            un = units * bsize + rem
            # xz frames self-delimit; comp chains to the next entry
            nxt = o + comp
            if k + 1 < nframes and bytes(d[nxt + entry_w:nxt + entry_w + 6]) != _XZ_MAGIC:
                # layout drift: recover by scanning for the next frame
                at = _find_in_view(d, _XZ_MAGIC, o + entry_w + 6)
                if at < 0:
                    raise ValueError(
                        f"{node.path}: corrupt XZ_RA frame chain "
                        f"(no next xz stream after frame {k})"
                    )
                nxt = at - entry_w
            frames.append((o + entry_w, un, min(nxt, len(d))))
            o = nxt
        if len(frames) == 1 and frames[0][1] == 0:
            frames[0] = (frames[0][0], node.total_bytes, frames[0][2])
        return frames

    def _parse_zip_ra(self, d, node: GdsNode):
        return self._parse_ra_indexed(d, node, zlib_check=True)

    def _parse_ra_indexed(self, d, node: GdsNode, zlib_check: bool):
        """Validated frame-index parse for a ZIP_RA / LZ4_RA stream
        (6-byte magic + the XZ_RA header/entry layout; zlib frame
        streams carry a checkable 0x78 header byte, LZ4 blocks are
        validated by tiling + total size alone). Returns frames or None
        when the layout does not check out."""
        magic_end = 12
        if d[magic_end + 2] != 0xFF:
            return None
        bsize = 1 << d[magic_end + 1]
        nframes = struct.unpack("<I", d[magic_end + 3:magic_end + 7])[0]
        if nframes > (1 << 28):
            return None
        if nframes == 0:
            return [] if len(d) == magic_end + 7 else None
        for entry_w in (6, 7):  # v16 / v17 entry widths
            frames, o, total_un, ok = [], magic_end + 7, 0, True
            for k in range(nframes):
                if o + entry_w > len(d):
                    ok = False
                    break
                comp = int.from_bytes(d[o:o + 3], "little")
                rem = int.from_bytes(d[o + 3:o + 5], "little")
                units = int.from_bytes(d[o + 5:o + entry_w], "little")
                un = units * bsize + rem
                data0 = o + entry_w
                if comp <= entry_w or data0 >= len(d) or (
                    zlib_check and d[data0] != 0x78
                ):
                    ok = False
                    break
                frames.append((data0, un, min(o + comp, len(d))))
                total_un += un
                o += comp
            if not ok or o != len(d):
                continue
            if node.total_bytes and total_un != node.total_bytes and not (
                nframes == 1 and total_un == 0
            ):
                continue
            if len(frames) == 1 and frames[0][1] == 0:
                frames[0] = (frames[0][0], node.total_bytes, frames[0][2])
            return frames
        return None

    def node_stream_size(self, node: GdsNode) -> int:
        """Uncompressed byte length of a node's data stream — total_bytes
        for coded nodes, the raw stream's u48 size prefix otherwise
        (raw nodes carry total_bytes=0 in their object stream)."""
        if node.total_bytes:
            return node.total_bytes
        if node.data_stream is None:
            return 0
        frames, d, _ = self._frame_index(node)
        if frames is None:
            return _u48(d, 0)
        if frames == "full":
            return len(d)
        return sum(un for _, un, _ in frames)

    def read_node_bytes(self, node: GdsNode, start: int = 0, end: int | None = None) -> bytes:
        """Uncompressed bytes [start, end) of a node's data — decompresses
        only the frames overlapping the range."""
        frames, d, codec = self._frame_index(node)
        if frames == "full":  # pre-decompressed (zlib path)
            return d[start:end]
        if frames is None:
            # raw stream: [u48 content_size][content]
            size = _u48(d, 0)
            if end is None or end > size:
                end = size
            return bytes(d[6 + start:6 + end])
        if end is None:
            end = node.total_bytes
        out, pos = [], 0
        for off, un, cend in frames:
            if pos >= end:
                break
            if pos + un > start:
                raw = _decompress_frame(codec, bytes(d[off:cend]), un)
                out.append(raw[max(0, start - pos):end - pos])
            pos += un
        return b"".join(out)

    def iter_node_chunks(self, node: GdsNode):
        """Yield the node's uncompressed bytes frame-by-frame — streaming
        sequential access holding ONE frame in memory at a time (raw /
        legacy-zlib streams yield a single chunk)."""
        frames, d, codec = self._frame_index(node)
        if frames == "full":
            yield d
            return
        if frames is None:
            size = _u48(d, 0)
            yield bytes(d[6:6 + size])
            return
        for off, un, cend in frames:
            yield _decompress_frame(codec, bytes(d[off:cend]), un)

    # -- typed decode ------------------------------------------------------
    def read_array(self, path: str):
        """Full decode of a node by path (driver-side; use the Spark reader
        for big nodes)."""
        node = self.node(path)
        return decode_values(node, self.read_node_bytes(node))

    def node(self, path: str) -> GdsNode:
        cur = self.root
        for part in path.strip("/").split("/"):
            nxt = cur.child(part)
            if nxt is None:
                raise KeyError(f"no node {path!r} in {self.path}")
            cur = nxt
        return cur

    def ls(self, folder: GdsNode | None = None, prefix: str = "") -> list[str]:
        folder = folder or self.root
        out = []
        for c in folder.children:
            out.append(c.path)
            if c.is_folder:
                out.extend(self.ls(c))
        return out


def _parse_attrs(d: bytes, o: int, n_attrs: int) -> dict:
    """Attribute block: [varint name_len][name][1B type][value]*.

    Types observed: 0x0e / 0x11 = length-prefixed string, 0x21 = array of
    typed elements, 0x00 = NULL marker (e.g. R.invisible). Unknown types
    stop the parse (attrs are advisory — Number/Type/Description/levels)."""
    out: dict = {}
    for _ in range(n_attrs):
        if o >= len(d):
            break
        nlen, o = _varint(d, o)
        name = d[o:o + nlen].decode("utf-8", "replace")
        o += nlen
        if o >= len(d):
            break
        t = d[o]
        o += 1
        if t in (0x0E, 0x11):
            sl, o = _varint(d, o)
            out[name] = d[o:o + sl].decode("utf-8", "replace")
            o += sl
        elif t == 0x21:
            n = struct.unpack("<I", d[o:o + 4])[0]
            o += 4
            vals = []
            for _ in range(n):
                et = d[o]
                o += 1
                if et in (0x0E, 0x11):
                    sl, o = _varint(d, o)
                    vals.append(d[o:o + sl].decode("utf-8", "replace"))
                    o += sl
                else:
                    return out  # unknown element type
            out[name] = vals
        elif t == 0x00:
            out[name] = None
        else:
            break  # unknown scalar type: stop (advisory data only)
    return out


def _n_elements(node: GdsNode) -> int:
    n = 1
    for d in node.dims:
        n *= d
    return n


def decode_values(node: GdsNode, raw: bytes, n_values: int | None = None):
    """Decode uncompressed node bytes into a numpy array (or list of str).

    n_values limits VL decodes (strings / LEB128 ints) when `raw` covers
    only a slice."""
    kind = node.kind
    if kind is None:
        raise ValueError(f"{node.path}: unknown class sig {node.sig!r}")
    if kind == "vlstr":
        out, o = [], 0
        limit = n_values if n_values is not None else _n_elements(node)
        while o < len(raw) and len(out) < limit:
            ln, o = _varint(raw, o)
            out.append(raw[o:o + ln].decode("utf-8", "replace"))
            o += ln
        return out
    if kind == "vlint":
        limit = n_values if n_values is not None else _n_elements(node)
        out, o = np.empty(limit, dtype=np.int64), 0
        for i in range(limit):
            v = shift = 0
            while True:
                c = raw[o]
                o += 1
                v |= (c & 0x7F) << shift
                shift += 7
                if not (c & 0x80):
                    break
            out[i] = (v >> 1) ^ -(v & 1)  # zigzag
        return out
    if kind in ("bit1", "bit2"):
        bits = 1 if kind == "bit1" else 2
        a = np.frombuffer(raw, dtype=np.uint8)
        per = 8 // bits
        mask = (1 << bits) - 1
        vals = np.stack(
            [(a >> (bits * k)) & mask for k in range(per)], axis=1
        ).ravel()
        return vals
    if kind == "int32":
        return np.frombuffer(raw, dtype=np.int32)
    if kind == "int16":
        return np.frombuffer(raw, dtype=np.int16)
    if kind == "uint8":
        return np.frombuffer(raw, dtype=np.uint8)
    if kind == "float32":
        return np.frombuffer(raw, dtype=np.float32)
    if kind == "float64":
        return np.frombuffer(raw, dtype=np.float64)
    if kind.startswith("packedreal"):
        # fixed-point reals at 1/2/3/4-byte widths, signed (NA = most
        # negative code) or unsigned 'u' (NA = max code); class-default
        # scales per _PR_DEFAULT_SCALE, explicit node param wins (the
        # reference's imputation mode sets scale=0.0001,
        # R/ConvVCF2GDS.R:580)
        scale = node.params.get("scale", _PR_DEFAULT_SCALE[kind])
        offset = node.params.get("offset", 0.0)
        if kind in ("packedreal8", "packedreal8u"):
            a = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            na = a == 0xFF
        elif kind == "packedreal16u":
            a = np.frombuffer(raw, dtype=np.uint16).astype(np.int64)
            na = a == 0xFFFF
        elif kind == "packedreal16":
            a = np.frombuffer(raw, dtype=np.int16).astype(np.int64)
            na = a == -0x8000
        elif kind in ("packedreal24", "packedreal24u"):
            b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
            a = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            if kind == "packedreal24":
                a = np.where(a >= 1 << 23, a - (1 << 24), a)
                na = a == -(1 << 23)
            else:
                na = a == (1 << 24) - 1
        elif kind == "packedreal32u":
            a = np.frombuffer(raw, dtype=np.uint32).astype(np.int64)
            na = a == 0xFFFFFFFF
        else:  # packedreal32
            a = np.frombuffer(raw, dtype=np.int32).astype(np.int64)
            na = a == -(1 << 31)
        out = a.astype(np.float64) * scale + offset
        out[na] = np.nan
        return out
    raise ValueError(f"{node.path}: undecodable kind {kind}")


def verify_digests(path: str) -> dict[str, bool]:
    """Recompute every stored per-node ``md5`` digest attribute and
    compare (the check seqSummary(check='full') / seqCheck run R-side,
    reference R/Internal.R:941-1003 + R/Summary.R:928-1020).

    gdsfmt's digest.gdsn(action='add') hashes the node's allocated
    data-stream CONTENT as stored on disk — coder header + frames for a
    compressed node, raw bytes otherwise (established empirically: the
    rule reproduces 46 of the 48 md5 attributes across the reference's
    released CEU/1KG/Imputed fixtures byte-for-byte; the two CEU
    DP data/~data attributes do not match their own current streams —
    plausibly stamped before a later rewrite of those nodes).

    Returns {node_path: matches} for every node carrying an md5 attr;
    one streamed driver pass per node, O(1 MiB) memory."""
    import hashlib

    f = GdsFile(path)
    data = f._buf()
    out: dict[str, bool] = {}
    for p in f.ls():
        try:
            n = f.node(p)
        except KeyError:
            continue
        attrs = getattr(n, "attrs", None) or {}
        if "md5" not in attrs or n.is_folder:
            continue
        h = hashlib.md5()
        first = True
        for a, sz, _, _ in f._ordered_frags(n.data_stream):
            off = 6 if first else 0  # skip the u48 content-size prefix
            first = False
            for o in range(a + off, a + sz, 1 << 20):
                h.update(data[o:min(o + (1 << 20), a + sz)])
        out[p] = h.hexdigest() == attrs["md5"]
    return out
