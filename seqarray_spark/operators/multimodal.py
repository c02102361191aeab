"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas kernels.

Image decode is REAL for BMP (24/32-bit uncompressed) and PNM (P5/P6)
payloads — a pure-numpy header parse + reshape, no imaging libraries —
so `extract_features(fake=False)` and `image_stats` run end-to-end in
this container. The `decoder=` plug-point remains for production
formats (PIL/librosa/av); `fake=True` keeps the deterministic stub for
payloads that are not images at all.

Scale notes: binary payloads ride in the same rows as their metadata, so
filters on metadata (mime_type, width, size) prune *before* any decode;
mapInPandas streams Arrow batches so peak memory is one batch of blobs,
not one partition. For very large blobs store pointers (path, offset) and
fetch inside the kernel instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, mime_type string, width int, height int, "
    "n_bytes int, payload binary"
)

FEATURE_SCHEMA = "media_id long, feat array<float>, decode_ok boolean"


def make_media_table(spark, docs: DataFrame, payload_from: str = "text") -> DataFrame:
    """Build a media-shaped table from any source table (testdata has no
    binary column, so payloads are derived deterministically from text)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mime_type"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
        F.length(payload_from).cast("int").alias("n_bytes"),
        F.encode(F.col(payload_from), "utf-8").alias("payload"),
    )


# ---------------------------------------------------------------------------
# pure-numpy image codec (BMP BI_RGB 24/32-bit, PNM P5/P6)


def _decode_bmp(p: bytes) -> np.ndarray | None:
    """Uncompressed BMP -> (h, w, 3) uint8 RGB. 4-byte-padded rows,
    bottom-up unless height is negative, BGR(A) channel order."""
    off = int.from_bytes(p[10:14], "little")
    w = int.from_bytes(p[18:22], "little", signed=True)
    h = int.from_bytes(p[22:26], "little", signed=True)
    bpp = int.from_bytes(p[28:30], "little")
    comp = int.from_bytes(p[30:34], "little")
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    topdown, h = h < 0, abs(h)
    c = bpp // 8
    stride = (w * c + 3) & ~3
    px = np.frombuffer(p, np.uint8, count=stride * h, offset=off)
    img = px.reshape(h, stride)[:, : w * c].reshape(h, w, c)
    if not topdown:
        img = img[::-1]
    return np.ascontiguousarray(img[:, :, [2, 1, 0]])  # BGR(A) -> RGB


def _decode_pnm(p: bytes) -> np.ndarray | None:
    """Binary PNM (P5 gray / P6 RGB) -> (h, w, 3) uint8 RGB (gray
    replicated across channels). Handles '#' comments in the header."""
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(p) and p[i:i + 1].isspace():
            i += 1
        if p[i:i + 1] == b"#":
            while i < len(p) and p[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(p) and not p[j:j + 1].isspace():
            j += 1
        toks.append(int(p[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxv = toks
    if not (0 < maxv <= 255) or w <= 0 or h <= 0:
        return None
    ch = 3 if p[:2] == b"P6" else 1
    img = np.frombuffer(p, np.uint8, count=w * h * ch, offset=i).reshape(h, w, ch)
    if maxv != 255:
        # PNM samples scale to maxval (spec: maxval = full intensity) —
        # normalize to 0-255 like reference decoders do
        img = np.round(img.astype(np.float64) * (255.0 / maxv)).astype(np.uint8)
    return np.ascontiguousarray(np.repeat(img, 3, axis=2) if ch == 1 else img)


def decode_image(payload) -> np.ndarray | None:
    """BINARY payload -> (h, w, 3) uint8 RGB, or None when the payload is
    not a decodable BMP/PNM image. Pure numpy — runs in any executor."""
    try:
        p = bytes(payload or b"")
        if p[:2] == b"BM":
            return _decode_bmp(p)
        if p[:2] in (b"P6", b"P5"):
            return _decode_pnm(p)
    except Exception:
        return None
    return None


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP (bottom-up, BGR,
    4-byte-padded rows)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    return (
        b"BM" + (off + len(data)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x00" * 4  # BI_RGB
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16  # ppm resolutions + palette counts
        + data
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary P6 PPM."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _fake_decode(payload: bytes, width: int, height: int, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real image decode + feature extract:
    fold the payload bytes into `dim` buckets and normalize. Replace with
    PIL/torchvision in a real deployment."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)
    idx = np.arange(arr.size) % dim
    feat = np.zeros(dim)
    np.add.at(feat, idx, arr)
    denom = np.linalg.norm(feat)
    return (feat / denom if denom else feat).astype(np.float32)


def _real_decode(payload: bytes, width: int, height: int, dim: int = 8,
                 normalize: bool = True):
    """Default real decoder: BMP/PNM pixel decode (decode_image) then the
    same fold-and-normalize featurization as the stub, applied to ACTUAL
    pixel values. None when the payload is not a decodable image.
    normalize=False returns the raw integer fold sums (exactly
    representable in float32 for images under ~64k pixel-value mass per
    lane) — the value-checkable form an SQL oracle can recompute."""
    img = decode_image(payload)
    if img is None:
        return None
    arr = img.astype(np.float64).ravel()
    idx = np.arange(arr.size) % dim
    feat = np.zeros(dim)
    np.add.at(feat, idx, arr)
    if normalize:
        denom = np.linalg.norm(feat)
        if denom:
            feat = feat / denom
    return feat.astype(np.float32)


def extract_features(
    media: DataFrame,
    dim: int = 8,
    batch_hint: int = 1024,
    fake: bool = False,
    normalize: bool = True,
    decoder=None,
) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    `decoder` is the production plug-point: any callable
    (payload: bytes, width: int, height: int, dim: int) ->
    np.ndarray[float32] | None (None = decode failure, surfaced as
    decode_ok=False, feat NULL). It is shipped to executors inside the
    kernel closure, so it must be picklable (a module-level function
    wrapping PIL/librosa/av in a real deployment). When no decoder is
    supplied, the DEFAULT is the REAL pure-numpy BMP/PNM decoder
    (decode_image — no external libs needed); pass fake=True to opt in
    to the deterministic byte-fold stub for payloads that are not
    images. normalize=False skips the L2 normalization and returns raw
    integer fold sums (SQL-oracle-checkable).
    """
    if decoder is None:
        if fake:
            decoder = _fake_decode
        else:
            def decoder(p, w, h, d, _n=normalize):
                return _real_decode(p, w, h, d, normalize=_n)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, w, h, dim)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": feats,
                    "decode_ok": [f is not None for f in feats],
                }
            )

    cols = media.select("media_id", "width", "height", "payload")
    return cols.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def make_synthetic_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real image payloads from an id column: pixel value
    (x + y + id) % 256 replicated across RGB, size w = id%16+4,
    h = id%12+4; even ids encode as BMP, odd as P6 PPM. The pixel
    formula has a closed form an SQL oracle can recompute, so the decode
    path is value-checkable end-to-end."""
    ids = docs.select(F.col(id_col).alias("media_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = mid % 16 + 4, mid % 12 + 4
                v = ((np.arange(w)[None, :] + np.arange(h)[:, None] + mid)
                     % 256).astype(np.uint8)
                img = np.repeat(v[:, :, None], 3, axis=2)
                payload = encode_bmp(img) if mid % 2 == 0 else encode_ppm(img)
                out.append((mid, "image/bmp" if mid % 2 == 0 else "image/x-ppm",
                            w, h, len(payload), payload))
            yield pd.DataFrame(
                out, columns=["media_id", "mime_type", "width", "height",
                              "n_bytes", "payload"],
            )

    return ids.mapInPandas(kernel, schema=MEDIA_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "media_id long, w int, h int, n_px long, sum_px long, min_px int, "
    "max_px int, decode_ok boolean"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Exact integer pixel statistics via the real decoder — integer
    sums/extrema so results hash identically against a SQL oracle (no
    float summation order issues)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload)
                if img is None:
                    rows.append((int(mid), None, None, None, None, None,
                                 None, False))
                    continue
                h, w, _ = img.shape
                rows.append((
                    int(mid), w, h, int(img.size), int(img.sum(dtype=np.int64)),
                    int(img.min()), int(img.max()), True,
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "w", "h", "n_px", "sum_px",
                               "min_px", "max_px", "decode_ok"],
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_STATS_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (decode stubbed). Shows the explode-then-decode shape: frame indices
    are generated relationally so the decoder kernel stays per-frame."""
    n_frames = (F.col("n_bytes") / 100 + 1).cast("int")
    return media.filter(F.col("mime_type").startswith("audio") == False).select(  # noqa: E712
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
