"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas kernels.

The decode step itself is STUBBED (no image/audio libs in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder produces stable features so the whole
Spark-side pipeline — schema, partitioning, UDF signature, batch shape —
is real and testable.

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


def extract_features(
    media: DataFrame,
    dim: int = 8,
    batch_hint: int = 1024,
    fake: bool = True,
    decoder=None,
) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    `decoder` is the production plug-point: any callable
    (payload: bytes, width: int, height: int, dim: int) ->
    np.ndarray[float32] | None (None = decode failure, surfaced as
    decode_ok=False, feat NULL). It is shipped to executors inside the
    kernel closure, so it must be picklable (a module-level function
    wrapping PIL/librosa/av in a real deployment). When no decoder is
    supplied: fake=True uses the deterministic stub, fake=False raises
    (no imaging libs in this container).
    """
    if decoder is None:
        if not fake:
            raise NotImplementedError(
                "real decoders (PIL/librosa/av) are not available in this "
                "container; pass decoder=<callable> or fake=True for the "
                "deterministic stub"
            )
        decoder = _fake_decode

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
