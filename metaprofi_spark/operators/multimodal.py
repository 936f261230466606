"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched ``mapInPandas``
UDFs.  The actual codecs are NOT available in this container, so the
decode step is stubbed two ways:

* ``decode_stub="fake"`` — a deterministic fake decoder (hash-derived
  dimensions + features) so the Spark-side plumbing (schema, batch
  shape, partitioning) is real and testable;
* ``decode_stub="raise"`` — ``NotImplementedError`` marking exactly
  where a real libjpeg/ffmpeg-backed kernel plugs in.

The batch shape is the part that matters at 100 TB: payloads stay in
Arrow buffers end-to-end, one python worker processes a whole record
batch, and the feature output is a fixed-width array column ready for
the similarity operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from metaprofi_spark.kernels.mmh2 import mmh2_64_bytes

DECODED_SCHEMA = "doc_id long, width int, height int, n_bytes long, features array<float>"


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "html",
    n_features: int = 16,
    decode_stub: str = "fake",
) -> DataFrame:
    """binary payload -> (dims, features).  Real decoders plug into
    ``_decode_batch``; everything around it is production plumbing."""

    def _decode_batch(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if decode_stub == "raise":
            raise NotImplementedError(
                "image/audio decode requires codec libraries not present in "
                "this environment; plug a real decoder in here"
            )
        # deterministic fake: dimensions + features derived from content
        # hashes, stable across runs/partitionings
        h = mmh2_64_bytes(payloads, list(range(2 + n_features)))  # (n, 2+f)
        width = (h[:, 0] % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = (h[:, 1] % np.uint64(1080) + np.uint64(16)).astype(np.int32)
        feats = (h[:, 2:].astype(np.float64) / 2**64).astype(np.float32)
        return width, height, feats

    def _to_bytes(b) -> bytes:
        if b is None:
            return b""
        if isinstance(b, str):  # string columns decode like binary payloads
            return b.encode("utf-8")
        return bytes(b)

    def fn(batches):
        for pdf in batches:
            payloads = [_to_bytes(b) for b in pdf[payload_col]]
            width, height, feats = _decode_batch(payloads)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "width": width,
                    "height": height,
                    "n_bytes": pd.array([len(b) for b in payloads], dtype="int64"),
                    "features": list(feats),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, src_width int, src_height int, width int, height int, "
    "payload binary"
)


def resize_payloads(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "html",
    decode_stub: str = "fake",
) -> DataFrame:
    """Image-resize plumbing: (doc_id, src dims, target dims, resized
    payload).  The Spark side is real — Arrow-batched, binary in/out,
    fixed output schema ready for a sink or a feature pass; the pixel
    kernel is stubbed exactly like decode_and_featurize (no codec libs
    in this container): ``fake`` emits a deterministic payload derived
    from the content hash + target geometry (stable across
    partitionings, pinned by test), ``raise`` marks the libvips/PIL
    plug point."""

    def _resize_batch(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray, list[bytes]]:
        if decode_stub == "raise":
            raise NotImplementedError(
                "image resize requires codec libraries not present in "
                "this environment; plug a real resizer in here"
            )
        h = mmh2_64_bytes(payloads, [0, 1, 2])  # (n, 3)
        src_w = (h[:, 0] % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        src_h = (h[:, 1] % np.uint64(1080) + np.uint64(16)).astype(np.int32)
        # deterministic fake "pixels": 8 bytes of content hash tiled to
        # a size proportional to the target geometry
        out = [
            bytes(h[i, 2].tobytes() * max((target_w * target_h) // 64, 1))
            for i in range(len(payloads))
        ]
        return src_w, src_h, out

    def _to_bytes(b) -> bytes:
        if b is None:
            return b""
        if isinstance(b, str):
            return b.encode("utf-8")
        return bytes(b)

    def fn(batches):
        for pdf in batches:
            payloads = [_to_bytes(b) for b in pdf[payload_col]]
            src_w, src_h, out = _resize_batch(payloads)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "src_width": src_w,
                    "src_height": src_h,
                    "width": pd.array([target_w] * len(payloads), dtype="int32"),
                    "height": pd.array([target_h] * len(payloads), dtype="int32"),
                    "payload": out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "html",
    every_n: int = 10,
) -> DataFrame:
    """Video-style frame sampling plan: emits (doc_id, frame_idx) rows
    without decoding — the partition-explode pattern used before a
    decode pass so frame work redistributes across the cluster."""
    from pyspark.sql import functions as F

    n_frames = (F.octet_length(F.col(payload_col)) / 100 + 1).cast("int")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
    )
