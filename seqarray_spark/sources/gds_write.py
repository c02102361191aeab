"""GDS (CoreArray) container writer — the inverse of sources/gds.py.

Completes the "GDS read/write" contract (reference: seqVCF2GDS writes
the container, R/ConvVCF2GDS.R:559-1465; node layout R/AllClasses.R:
20-24): a SeqDataset exports to a `.gds` file laid out like the
reference's own fixtures — same node tree (sample.id / variant.id /
position / chromosome / allele / genotype/data+@data / phase/data /
annotation/{id,qual,filter} / annotation/info/* / annotation/format/*/
{data,@data} / sample.annotation/*), same fragment + object-stream byte
format (calibrated against inst/extdata/CEU_Exon.gds), with data
streams stored raw (uncompressed) for random access without codecs.
Round-trip is validated by reading the output back through the
distributed reader (tests/test_gds_write.py).

Scale note: GDS is a single-file interchange format; like the
reference's writer this is a single-node sink (rows stream to the
driver via toLocalIterator in sorted order, so peak memory is one
column, not the dataset). The analytical path at 100 TB remains
parquet (SeqDataset.export); write_gds exists so reference users can
take results back to their R toolchain.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from seqarray_spark.sources.gds import _CLASS_SIGS

_PREFIX = b"COREARRAYx0A"
_HEAD_BIT = 1 << 47

_NDIM_TAG = bytes.fromhex("07c4e3641f")
_DIM_TAG = bytes.fromhex("02c34361")
_DSTREAM_TAG = bytes.fromhex("09c4c37c0c")
_NATTR_TAG = bytes.fromhex("0807f37d9d937d")
_ATTR_TAG = bytes.fromhex("0108f37ddd45791f")

# kind -> class signature (inverse of the reader's table)
_SIG_OF = {v: k for k, v in _CLASS_SIGS.items()}

# directory-entry filler bytes as observed in the fixtures
_ENT_PAD1 = bytes.fromhex("0300")        # entry[6:8]
_ENT_SIG = bytes.fromhex("0902f500")     # entry[8:12]
_ENT_PAD2 = bytes.fromhex("0944743112")  # entry[16:21]
_ENT_PAD3 = bytes.fromhex("1544c66010")  # entry[25:30]


def _varint_enc(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _u48(n: int) -> bytes:
    return int(n).to_bytes(6, "little")


def _encode_attrs(attrs: dict) -> bytes:
    out = bytearray()
    for name, val in attrs.items():
        nb = name.encode("utf-8")
        out += _varint_enc(len(nb)) + nb
        if val is None:
            out.append(0x00)
        elif isinstance(val, (list, tuple)):
            out.append(0x21)
            out += struct.pack("<I", len(val))
            for v in val:
                vb = str(v).encode("utf-8")
                out.append(0x11)
                out += _varint_enc(len(vb)) + vb
        else:
            vb = str(val).encode("utf-8")
            out.append(0x11)
            out += _varint_enc(len(vb)) + vb
    return bytes(out)


def _encode_values(kind: str, values) -> bytes:
    if kind == "vlstr":
        out = bytearray()
        for v in values:
            b = ("" if v is None else str(v)).encode("utf-8")
            out += _varint_enc(len(b)) + b
        return bytes(out)
    if kind in ("bit1", "bit2"):
        bits = 1 if kind == "bit1" else 2
        per = 8 // bits
        arr = np.asarray(values, dtype=np.uint8)
        pad = (-len(arr)) % per
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
        arr = arr.reshape(-1, per)
        shifts = np.arange(per, dtype=np.uint8) * bits
        return np.bitwise_or.reduce(arr << shifts, axis=1).astype(np.uint8).tobytes()
    dt = {
        "int32": "<i4", "int16": "<i2", "uint8": "u1",
        "float32": "<f4", "float64": "<f8",
    }[kind]
    return np.asarray(values).astype(dt).tobytes()


class _Builder:
    """Accumulates streams; emit() lays them out as fragments."""

    def __init__(self):
        self._streams: list[tuple[int, bytes]] = []
        self._next_id = 1

    def new_id(self) -> int:
        sid = self._next_id
        self._next_id += 1
        return sid

    def put(self, sid: int, payload: bytes) -> None:
        self._streams.append((sid, payload))

    def data_stream(self, raw: bytes) -> int:
        """Raw (uncompressed) data stream: [u48 content_size][content]."""
        sid = self.new_id()
        self.put(sid, _u48(len(raw)) + raw)
        return sid

    def array_node(
        self,
        kind: str,
        dims: tuple[int, ...],
        raw: bytes,
        attrs: dict | None = None,
    ) -> int:
        """Array object stream + its raw data stream; returns the object
        stream id (for the parent directory entry)."""
        dsid = self.data_stream(raw)
        sig = _SIG_OF[kind]
        body = bytearray()
        body += bytes([len(sig)]) + sig
        body += _NDIM_TAG + struct.pack("<H", len(dims))
        body += _DIM_TAG + bytes([4 * len(dims)])
        for d in dims:
            body += struct.pack("<I", d)
        body += _DSTREAM_TAG + struct.pack("<I", dsid)
        ab = _encode_attrs(attrs or {})
        body += _NATTR_TAG + struct.pack("<I", len(attrs or {}))
        body += _ATTR_TAG + _u48(len(ab)) + ab
        # [u48 used][u48 used][u16][2B] then the class-sig length byte at
        # offset 16 — matching the reader's fixed o=16 start
        head = _u48(16 + len(body)) * 2 + b"\x00\x00" + b"\x00\x01"
        sid = self.new_id()
        self.put(sid, head + bytes(body))
        return sid

    def folder(self, sid: int, entries: list[tuple[int, str, bool]], attrs: dict | None = None) -> None:
        """Directory stream: entries = [(child_sid, name, is_folder)]."""
        body = bytearray()
        for child_sid, name, is_folder in entries:
            nb = name.encode("utf-8")
            ent = bytearray()
            ent += _ENT_PAD1 + _ENT_SIG
            ent += struct.pack("<I", child_sid)
            ent += _ENT_PAD2
            ent += struct.pack("<I", 0x02 if is_folder else 0x00)
            ent += _ENT_PAD3
            ent += _varint_enc(len(nb)) + nb
            body += _u48(6 + len(ent)) + ent
        if attrs:
            ab = _encode_attrs(attrs)
            body += _NATTR_TAG + struct.pack("<I", len(attrs))
            body += _ATTR_TAG + _u48(len(ab)) + ab
        head = _u48(16 + len(body)) * 2 + struct.pack("<HH", 0, 0)
        self.put(sid, bytes(head) + bytes(body))

    def emit(self, path: str) -> None:
        with open(path, "wb") as fh:
            fh.write(_PREFIX + struct.pack("<H", 0x0100) + struct.pack("<I", 1))
            for sid, payload in self._streams:
                size = 16 + len(payload)
                fh.write(_u48(size | _HEAD_BIT) + _u48(0) + struct.pack("<I", sid))
                fh.write(payload)


def _planes_needed(max_code: int) -> int:
    """Bit2 planes for a variant: valid codes must stay below the
    all-ones missing value (1 << 2c) - 1 (reference: src/Index.h:56)."""
    c = 1
    while max_code >= (1 << (2 * c)) - 1:
        c += 1
    return c


def write_gds(ds, path: str, info_fields: list[str] | None = None,
              format_fields: list[str] | None = None) -> None:
    """SeqDataset -> .gds container (reference writer: seqVCF2GDS,
    R/ConvVCF2GDS.R:559-1465). Read back with SeqDataset.from_gds.

    Floats are stored as float32 (the reference stores VCF Type=Float
    the same way); missing ints as INT32_MIN, missing floats as NaN —
    both the reference's NA conventions."""
    variants = ds.variants.orderBy("variant_id")
    vrows = variants.collect()
    n_var = len(vrows)
    sample_ids = (
        [r[0] for r in ds.samples.select("sample_id").orderBy("sample_id").collect()]
        if ds.samples is not None
        else []
    )
    n_samp = len(sample_ids)
    ploidy = ds.ploidy

    b = _Builder()
    root_id = b.new_id()  # = 1
    entries: list[tuple[int, str, bool]] = []

    # description folder (reference: FileFormat attr on it)
    desc_id = b.new_id()
    b.folder(desc_id, [], attrs={"FileFormat": "SEQ_ARRAY", "FileVersion": "v1.0"})
    entries.append((desc_id, "description", True))

    entries.append(
        (b.array_node("vlstr", (n_samp,), _encode_values("vlstr", sample_ids)),
         "sample.id", False)
    )
    vids = [r["variant_id"] for r in vrows]
    entries.append(
        (b.array_node("int32", (n_var,), _encode_values("int32", vids)),
         "variant.id", False)
    )
    entries.append(
        (b.array_node(
            "int32", (n_var,),
            _encode_values("int32", [r["position"] or 0 for r in vrows])),
         "position", False)
    )
    entries.append(
        (b.array_node(
            "vlstr", (n_var,),
            _encode_values("vlstr", [r["chromosome"] for r in vrows])),
         "chromosome", False)
    )
    allele_strs = [
        ",".join([r["ref"] or ""] + list(r["alt"] or [])) for r in vrows
    ]
    entries.append(
        (b.array_node("vlstr", (n_var,), _encode_values("vlstr", allele_strs)),
         "allele", False)
    )

    # ---- genotype + phase -------------------------------------------------
    calls = ds._base_calls
    if calls is not None and n_samp:
        sidx = {s: i for i, s in enumerate(sample_ids)}
        vidx = {v: i for i, v in enumerate(vids)}
        # dense (variant, sample, slot) grid, missing-filled
        codes = np.full((n_var, n_samp, ploidy), -1, dtype=np.int64)
        phases = np.zeros((n_var, n_samp, max(ploidy - 1, 1)), dtype=np.uint8)
        crows = calls.select("variant_id", "sample_id", "alleles", "phased")
        for r in crows.toLocalIterator():
            i, j = vidx.get(r["variant_id"]), sidx.get(r["sample_id"])
            if i is None or j is None:
                continue
            al = r["alleles"]
            if al is not None:
                for k in range(min(len(al), ploidy)):
                    if al[k] is not None and int(al[k]) > codes[i, j, k]:
                        codes[i, j, k] = int(al[k])
            ph = r["phased"]
            if ph:
                for k in range(min(len(ph), ploidy - 1)):
                    phases[i, j, k] |= bool(ph[k])
        max_code = codes.max(axis=(1, 2))  # -1 where all missing
        planes = np.array(
            [_planes_needed(int(m)) if m >= 0 else 1 for m in max_code],
            dtype=np.int64,
        )
        bit2_vals = []
        for i in range(n_var):
            c = int(planes[i])
            miss = (1 << (2 * c)) - 1
            vcodes = np.where(codes[i] < 0, miss, codes[i])  # (n_samp, ploidy)
            for k in range(c):
                bit2_vals.append(((vcodes >> (2 * k)) & 3).ravel())
        flat = np.concatenate(bit2_vals) if bit2_vals else np.zeros(0, dtype=np.int64)
        geno_data_id = b.array_node(
            "bit2", (int(planes.sum()), n_samp, ploidy),
            _encode_values("bit2", flat),
        )
        geno_idx_id = b.array_node("uint8", (n_var,), _encode_values("uint8", planes))
        geno_folder = b.new_id()
        b.folder(geno_folder, [(geno_data_id, "data", False), (geno_idx_id, "@data", False)])
        entries.append((geno_folder, "genotype", True))

        if ploidy > 1:
            phase_data_id = b.array_node(
                "bit1", (n_var, n_samp, ploidy - 1),
                _encode_values("bit1", phases[:, :, : ploidy - 1].ravel()),
            )
            phase_folder = b.new_id()
            b.folder(phase_folder, [(phase_data_id, "data", False)])
            entries.append((phase_folder, "phase", True))

    # ---- annotation -------------------------------------------------------
    ann_entries: list[tuple[int, str, bool]] = []
    ann_entries.append(
        (b.array_node(
            "vlstr", (n_var,),
            _encode_values("vlstr", [r["id"] or "" for r in vrows])),
         "id", False)
    )
    quals = [r["qual"] for r in vrows]
    ann_entries.append(
        (b.array_node(
            "float32", (n_var,),
            _encode_values("float32", [math.nan if q is None else q for q in quals])),
         "qual", False)
    )
    levels = sorted({r["filter"] for r in vrows if r["filter"] is not None})
    lut = {s: i + 1 for i, s in enumerate(levels)}
    ann_entries.append(
        (b.array_node(
            "int32", (n_var,),
            _encode_values("int32", [lut.get(r["filter"], 0) for r in vrows]),
            attrs={"R.class": "factor", "R.levels": levels}),
         "filter", False)
    )

    # INFO columns from the struct
    info_entries: list[tuple[int, str, bool]] = []
    if "info" in ds.variants.columns:
        ifields = [
            f for f in ds.variants.schema["info"].dataType.fields
            if info_fields is None or f.name in info_fields
        ]
        for fld in ifields:
            vals = [r["info"][fld.name] if r["info"] else None for r in vrows]
            dt = fld.dataType.simpleString()
            if dt.startswith("array"):
                counts = [0 if v is None else len(v) for v in vals]
                flat = [x for v in vals if v is not None for x in v]
                kind = "float32" if "double" in dt or "float" in dt else "int32"
                if "string" in dt:
                    kind = "vlstr"
                afill = "" if kind == "vlstr" else (
                    math.nan if kind == "float32" else -(2 ** 31))
                fl = [afill if x is None else x for x in flat]
                info_entries.append(
                    (b.array_node(kind, (len(flat),), _encode_values(kind, fl)),
                     fld.name, False)
                )
                info_entries.append(
                    (b.array_node("int32", (n_var,), _encode_values("int32", counts)),
                     f"@{fld.name}", False)
                )
            elif dt == "boolean":
                info_entries.append(
                    (b.array_node(
                        "bit1", (n_var,),
                        _encode_values("bit1", [1 if v else 0 for v in vals])),
                     fld.name, False)
                )
            elif dt == "string":
                info_entries.append(
                    (b.array_node("vlstr", (n_var,), _encode_values("vlstr", vals)),
                     fld.name, False)
                )
            else:
                kind = "float32" if dt in ("double", "float") else "int32"
                fill = math.nan if kind == "float32" else -(2 ** 31)
                info_entries.append(
                    (b.array_node(
                        kind, (n_var,),
                        _encode_values(kind, [fill if v is None else v for v in vals])),
                     fld.name, False)
                )
    info_folder = b.new_id()
    b.folder(info_folder, info_entries)
    ann_entries.append((info_folder, "info", True))

    # FORMAT columns from calls (scalar + array, Number from shape)
    fmt_entries: list[tuple[int, str, bool]] = []
    if calls is not None and n_samp:
        fcols = [
            f for f in calls.schema.fields
            if f.name not in ("variant_id", "sample_id", "alleles", "phased", "vcf_errors")
            and (format_fields is None or f.name in format_fields)
        ]
        for fld in fcols:
            dt = fld.dataType.simpleString()
            is_arr = dt.startswith("array")
            grid: dict[tuple[int, int], object] = {}
            for r in calls.select("variant_id", "sample_id", fld.name).toLocalIterator():
                i, j = vidx.get(r["variant_id"]), sidx.get(r["sample_id"])
                if i is None or j is None or r[fld.name] is None:
                    continue
                grid[(i, j)] = r[fld.name]
            if is_arr:
                elem = dt[6:-1]
                kind = (
                    "vlstr" if elem == "string"
                    else "float32" if elem in ("double", "float") else "int32"
                )
                rows_per_var = [
                    max([len(grid.get((i, j), []) or []) for j in range(n_samp)] + [0])
                    for i in range(n_var)
                ]
                fill = "" if kind == "vlstr" else (math.nan if kind == "float32" else -(2 ** 31))
                flat = []
                for i in range(n_var):
                    for rr in range(rows_per_var[i]):
                        for j in range(n_samp):
                            v = grid.get((i, j))
                            flat.append(v[rr] if v is not None and rr < len(v) and v[rr] is not None else fill)
                data_id = b.array_node(
                    kind, (sum(rows_per_var), n_samp), _encode_values(kind, flat)
                )
                idx_id = b.array_node(
                    "int32", (n_var,), _encode_values("int32", rows_per_var)
                )
                number = "."
            else:
                kind = (
                    "vlstr" if dt == "string"
                    else "float32" if dt in ("double", "float") else "int32"
                )
                fill = "" if kind == "vlstr" else (math.nan if kind == "float32" else -(2 ** 31))
                flat = [
                    grid.get((i, j), fill) if grid.get((i, j)) is not None else fill
                    for i in range(n_var)
                    for j in range(n_samp)
                ]
                data_id = b.array_node(kind, (n_var, n_samp), _encode_values(kind, flat))
                idx_id = b.array_node(
                    "int32", (n_var,), _encode_values("int32", [1] * n_var)
                )
                number = "1"
            f_folder = b.new_id()
            b.folder(
                f_folder,
                [(data_id, "data", False), (idx_id, "@data", False)],
                attrs={
                    "Number": number,
                    "Type": "Float" if kind == "float32" else ("String" if kind == "vlstr" else "Integer"),
                    "Description": "",
                },
            )
            fmt_entries.append((f_folder, fld.name, True))
    fmt_folder = b.new_id()
    b.folder(fmt_folder, fmt_entries)
    ann_entries.append((fmt_folder, "format", True))

    ann_folder = b.new_id()
    b.folder(ann_folder, ann_entries)
    entries.append((ann_folder, "annotation", True))

    # sample.annotation extras
    sa_entries: list[tuple[int, str, bool]] = []
    if ds.samples is not None:
        extra = [c for c in ds.samples.columns if c != "sample_id"]
        if extra:
            srows = {r["sample_id"]: r for r in ds.samples.collect()}
            for c in extra:
                dt = dict(ds.samples.dtypes)[c]
                vals = [srows[s][c] for s in sample_ids]
                if dt == "string":
                    sa_entries.append(
                        (b.array_node("vlstr", (n_samp,), _encode_values("vlstr", vals)), c, False)
                    )
                elif dt in ("double", "float"):
                    sa_entries.append(
                        (b.array_node(
                            "float32", (n_samp,),
                            _encode_values("float32", [math.nan if v is None else v for v in vals])), c, False)
                    )
                else:
                    sa_entries.append(
                        (b.array_node(
                            "int32", (n_samp,),
                            _encode_values("int32", [0 if v is None else int(v) for v in vals])), c, False)
                    )
    sa_folder = b.new_id()
    b.folder(sa_folder, sa_entries)
    entries.append((sa_folder, "sample.annotation", True))

    b.folder(root_id, entries)
    b.emit(path)
