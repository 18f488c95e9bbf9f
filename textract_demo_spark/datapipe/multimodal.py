"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-
batched Pandas UDFs over mapInPandas.

The image/audio codec libraries are not available in this container,
so the decode kernel is STUBBED behind ``decode_enabled`` — with a
deterministic fake feature extractor standing in — while everything
Spark-side (schema, binary handling, batch shape, partitioning,
UDF signature) is real and tested. Swap ``_fake_features`` for a real
PIL/torchvision/ffmpeg kernel on a full cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

decode_enabled = False  # flip when codec libs exist on the cluster

MEDIA_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                "content_hash string")
FRAME_SCHEMA = ("doc_id long, frame_idx int, n_bytes long, "
                "feature array<float>")

N_FEATURES = 8
FRAME_STRIDE = 256  # bytes per fake "frame"


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the payload as an opaque binary blob with typed metadata
    (the multimodal column convention: binary + media_type +
    size + content hash; all JVM-side)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long")
         .alias("n_bytes"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"))


def _real_decode(data: bytes) -> list[list[float]]:
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/ffmpeg) not present"
        " in this container; set multimodal.decode_enabled=True on a"
        " full cluster and implement the kernel here")


def _fake_features(data: bytes) -> list[list[float]]:
    """Deterministic stand-in: one 'frame' per FRAME_STRIDE bytes,
    features = normalized byte statistics of the frame window."""
    frames = []
    for off in range(0, max(len(data), 1), FRAME_STRIDE):
        win = data[off:off + FRAME_STRIDE] or b"\x00"
        feats = []
        for j in range(N_FEATURES):
            sl = win[j::N_FEATURES] or b"\x00"
            feats.append(round(sum(sl) / (255.0 * len(sl)), 6))
        frames.append(feats)
    return frames


def extract_frames(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media: batch of
    (doc_id, media) -> rows of (doc_id, frame_idx, n_bytes, feature).
    Arrow-batched; the kernel sees real bytes."""
    kernel = _real_decode if decode_enabled else _fake_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_bytes": [],
                   "feature": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                for i, feats in enumerate(kernel(data)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_bytes"].append(len(data))
                    out["feature"].append(feats)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(
        run, schema=FRAME_SCHEMA)
