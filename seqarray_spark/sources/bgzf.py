"""Pure-Python BGZF (blocked gzip) writer — htslib-free.

The reference exports VCF as BGZF via Rsamtools (seqGDS2VCF use_Rsamtools,
R/Conversion.R:118-132, src/SEQ_bgzip_create); this container has no
htslib either, but BGZF is just a sequence of gzip members whose FEXTRA
field records the compressed block size ('BC', BSIZE), terminated by a
fixed 28-byte empty block. zlib covers everything needed. Output is
readable by htslib/tabix/bcftools AND by plain `gzip -d` / gzip.open
(multi-member gzip), which is the whole point: downstream tabix
consumers can index it.

BGZF blocks are independently decompressable and concatenatable, so
per-partition part files compress independently and a driver-side
stream-concat produces the final single .vcf.bgz.
"""

from __future__ import annotations

import struct
import zlib

# max uncompressed payload per block (htslib uses 0xff00)
_BLOCK_SIZE = 0xFF00

# fixed empty terminator block (htslib EOF marker)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _block(data: bytes, level: int = 6) -> bytes:
    """One BGZF block: gzip member with the 'BC' BSIZE extra field."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25  # header(18) + comp + crc(4) + isize(4), minus 1
    if bsize >= 1 << 16:
        raise ValueError("BGZF block overflow (incompressible payload)")
    header = (
        b"\x1f\x8b\x08\x04"          # magic, deflate, FEXTRA
        + b"\x00\x00\x00\x00"        # mtime
        + b"\x00\xff"                # XFL, OS=unknown
        + struct.pack("<H", 6)        # XLEN
        + b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize)
    )
    return (
        header
        + comp
        + struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF)
        + struct.pack("<I", len(data) & 0xFFFFFFFF)
    )


class BgzfWriter:
    """File-like BGZF sink: buffers to _BLOCK_SIZE, emits one gzip
    member per block, writes the EOF marker on close.

    write_eof=False produces a concatenatable fragment (no terminator):
    executor tasks compress their partitions independently and the
    driver byte-concatenates fragments + one EOF — zero driver-side
    deflate work.

    tell_virtual() returns the BGZF virtual offset of the next byte to
    be written: (compressed_offset_of_current_block << 16) |
    offset_within_uncompressed_block — the coordinate tabix chunks and
    linear-index entries use. Fragments start at a block boundary, so a
    fragment-local virtual offset globalizes by adding
    (fragment_start_byte << 16)."""

    def __init__(self, path: str, level: int = 6, write_eof: bool = True):
        self._fh = open(path, "wb")
        self._buf = bytearray()
        self._level = level
        self._coff = 0
        self._write_eof = write_eof

    def write(self, data: bytes | str) -> None:
        if isinstance(data, str):
            data = data.encode("utf-8")
        self._buf += data
        while len(self._buf) >= _BLOCK_SIZE:
            blk = _block(bytes(self._buf[:_BLOCK_SIZE]), self._level)
            self._fh.write(blk)
            self._coff += len(blk)
            del self._buf[:_BLOCK_SIZE]

    def tell_virtual(self) -> int:
        return (self._coff << 16) | len(self._buf)

    def close(self) -> None:
        if self._buf:
            blk = _block(bytes(self._buf), self._level)
            self._fh.write(blk)
            self._coff += len(blk)
            self._buf.clear()
        if self._write_eof:
            self._fh.write(BGZF_EOF)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def bgzf_cat(text_paths: list[str], out_path: str, header_text: str = "") -> None:
    """Stream plain-text files into one BGZF file (header first, EOF
    last). Each input is read in chunks — constant memory regardless of
    total size."""
    with BgzfWriter(out_path) as w:
        if header_text:
            w.write(header_text)
        for p in text_paths:
            with open(p, "rb") as fh:
                while True:
                    chunk = fh.read(1 << 20)
                    if not chunk:
                        break
                    w.write(chunk)
