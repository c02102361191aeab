"""Pure-Python LZ4 *block format* codec (no external lz4 library).

The reference's seqStorageOption offers three stock random-access codec
families: ZIP_RA, LZ4_RA and LZMA_RA (/root/reference/R/Utilities.R:250-252).
ZIP/LZMA map onto the stdlib zlib/lzma modules; LZ4 has no stdlib binding,
so this module implements the public LZ4 block format
(https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md) directly:

  block := sequence*            sequence := token [lit-ext] literals
                                            [u16le offset] [match-ext]
  token  = (literal_len:4 | match_len-4:4); field value 15 => extension
           bytes (255-continuation) follow
  end    = the last sequence is literals-only (no offset); the last 5
           bytes of a block are always literals and the last match must
           start >= 12 bytes before the end (spec end-of-block rules).

Compression is a greedy single-probe hash-table matcher (the shape of the
reference lz4 "fast" level); decompression is a straight sequence walk
with chunked copies for overlapping matches. Both operate on one _RA
frame (<= a few MiB) at a time inside executor tasks, so pure-Python
speed is amortized across the cluster the same way the xz/zlib paths are.
"""

from __future__ import annotations

try:  # optional C implementation (python-lz4); absent in this container.
    # The formats are identical (both are the public LZ4 block format),
    # so files written either way read back under either path — the C
    # library only changes throughput (~400 MB/s vs ~2-4 MB/s here).
    import lz4.block as _lz4c
except Exception:  # pragma: no cover - environment-dependent
    _lz4c = None

_MIN_MATCH = 4
# spec end conditions: last match must start at least 12 bytes before the
# block end; the last 5 bytes are always literals
_MFLIMIT = 12
_LASTLITERALS = 5


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def compress_block(src: bytes) -> bytes:
    """src -> one LZ4 block. Always succeeds (incompressible data costs
    ~0.4% expansion as literal runs)."""
    src = bytes(src)
    if _lz4c is not None:
        return _lz4c.compress(src, store_size=False)
    n = len(src)
    out = bytearray()
    if n == 0:
        return b""
    anchor = 0
    if n >= _MFLIMIT + 1:
        table: dict[bytes, int] = {}
        match_limit = n - _MFLIMIT   # last legal match start (exclusive)
        end_match = n - _LASTLITERALS  # matches may not extend past here
        i = 0
        while i < match_limit:
            key = src[i:i + _MIN_MATCH]
            j = table.get(key, -1)
            table[key] = i
            if j < 0 or i - j > 0xFFFF:
                i += 1
                continue
            # extend the match forward
            m, p = i + _MIN_MATCH, j + _MIN_MATCH
            while m < end_match and src[m] == src[p]:
                m += 1
                p += 1
            lit_len = i - anchor
            mlen = m - i - _MIN_MATCH
            token = (min(lit_len, 15) << 4) | min(mlen, 15)
            out.append(token)
            if lit_len >= 15:
                _write_len(out, lit_len - 15)
            out += src[anchor:i]
            out += (i - j).to_bytes(2, "little")
            if mlen >= 15:
                _write_len(out, mlen - 15)
            i = m
            anchor = m
    # trailing literal-only sequence
    lit_len = n - anchor
    token = min(lit_len, 15) << 4
    out.append(token)
    if lit_len >= 15:
        _write_len(out, lit_len - 15)
    out += src[anchor:]
    return bytes(out)


def decompress_block(src, out_size: int) -> bytes:
    """One LZ4 block -> its out_size uncompressed bytes."""
    src = bytes(src)
    if _lz4c is not None and out_size > 0:
        return _lz4c.decompress(src, uncompressed_size=out_size)
    n = len(src)
    out = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                c = src[i]
                i += 1
                lit += c
                if c != 255:
                    break
        if lit:
            out += src[i:i + lit]
            i += lit
        if i >= n:
            break  # literals-only final sequence
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0 or off > len(out):
            raise ValueError("corrupt LZ4 block: bad match offset")
        mlen = (token & 0x0F) + _MIN_MATCH
        if token & 0x0F == 15:
            while True:
                c = src[i]
                i += 1
                mlen += c
                if c != 255:
                    break
        start = len(out) - off
        if off >= mlen:
            out += out[start:start + mlen]
        else:
            # overlapping match: the copied region grows as it is copied
            seg = bytes(out[start:])
            reps = mlen // off + 1
            out += (seg * reps)[:mlen]
    if len(out) != out_size:
        raise ValueError(
            f"corrupt LZ4 block: decoded {len(out)} bytes, expected {out_size}"
        )
    return bytes(out)
