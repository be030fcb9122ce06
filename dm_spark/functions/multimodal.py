"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio decode libraries, so the decode kernel
is STUBBED (deterministic fake features / NotImplementedError for real
codecs) — but the Spark-side plumbing is real and tested: binary
columns with typed metadata, Arrow-batched mapInPandas with the exact
schema/batch shape a real decoder (PIL/ffmpeg) would use, partition-
friendly (no driver collect, no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media binary, media_type string"
FEATURE_SCHEMA = "doc_id long, n_bytes int, n_frames int, feat array<float>"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off int, frame_len int"
FRAME_STRIDE = 64


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build an opaque binary media column (utf-8 payload stand-in) +
    typed metadata — the table shape a multimodal corpus would have."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.when(F.col(id_col) % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
    )


def decode_and_featurize(media_df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """mapInPandas decode kernel. Arrow delivers `media` as bytes per
    batch; a real implementation would PIL-open / ffmpeg-demux here.
    The stub computes deterministic pseudo-features from the bytes so
    the pipeline (schema, batching, downstream joins) is fully
    exercised.
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/ffmpeg, not present in this environment"
        )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["media"].map(len).astype("int32")
            n_frames = (n_bytes % 16 + 1).astype("int32")  # deterministic fake
            feats = [
                np.frombuffer(m[:32].ljust(32, b"\0"), dtype=np.uint8).astype(np.float32) / 255.0
                for m in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "n_frames": n_frames,
                    "feat": [f.tolist() for f in feats],
                }
            )

    return media_df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media_df: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling: one row per sampled frame (every `stride` bytes)
    with its byte range — the video frame-sample / audio chunking
    plumbing; a real decoder would demux instead of slicing. Arrow
    batches in, exploded frame rows out, no driver involvement."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, lens = [], [], [], []
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                n = len(m)
                # ceil(n/stride): the n//stride+1 form emitted a
                # phantom zero-length frame past the end whenever n is
                # an exact multiple of stride
                k = max(1, (n + stride - 1) // stride)
                for i in range(k):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * stride)
                    lens.append(min(stride, n - i * stride))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_off": pd.array(offs, dtype="int32"),
                 "frame_len": pd.array(lens, dtype="int32")}
            )

    return media_df.mapInPandas(kernel, schema=FRAME_SCHEMA)
