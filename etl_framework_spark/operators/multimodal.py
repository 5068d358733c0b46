"""Multimodal (binary) columns: SURVEY.md §2.11 L6.

Semantics: media payloads ride through the pipeline as opaque
BinaryType columns plus a typed metadata struct; decode / feature
steps are Arrow-batched `mapInPandas` operators so a 100 TB corpus
streams through Python workers in columnar batches (never row-at-a-
time). No image/audio codecs exist in this environment, so the decode
kernel is stubbed: `real_decode=True` raises NotImplementedError; the
default deterministic fake derives dimensions from the payload digest,
keeping schema/partitioning/batching — the Spark-side plumbing — real
and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id bigint, n_bytes int, digest string, width int, height int"


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simulate ingesting a media column: payload bytes + metadata struct."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.named_struct(
        F.lit("mime"), F.lit("application/octet-stream"),
        F.lit("n_bytes"), F.length(payload),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def decode_media(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode the binary payload into (width, height) features.

    df must have (doc_id, payload). Arrow-batched; one Python worker
    pass per partition, vectorized within each batch.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError(
                "real media codecs (PIL/ffmpeg) are not installed in this "
                "environment; use the deterministic stub (real_decode=False)"
            )
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": digests,
                    # fake "decoded" dims, deterministic in the payload
                    "width": (digests.map(lambda h: int(h[:4], 16) % 640 + 1)).astype("int32"),
                    "height": (digests.map(lambda h: int(h[4:8], 16) % 480 + 1)).astype("int32"),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_digest string"


def sample_frames(df: DataFrame, frame_size: int = 64, stride: int = 4) -> DataFrame:
    """Frame-sampling plumbing (video/audio): treat the payload as a
    sequence of `frame_size`-byte frames and emit every `stride`-th
    one (frame_idx, size, digest). Arrow-batched mapInPandas — each
    Python worker slices its own partitions' payloads; no shuffle, and
    output size is input/stride (the point of sampling at 100 TB).

    df must have (doc_id, payload). With real codecs this is where
    ffmpeg keyframe extraction would slot in; the slicing, batching,
    and one-row-per-frame fan-out are the production-shaped parts.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step = frame_size * stride
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_digest": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for off in range(0, len(b), step):
                    chunk = b[off : off + frame_size]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(off // frame_size)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_digest"].append(
                        hashlib.sha256(chunk).hexdigest()[:16]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_bytes": pd.Series(out["frame_bytes"], dtype="int32"),
                    "frame_digest": pd.Series(out["frame_digest"], dtype="object"),
                }
            )

    return df.mapInPandas(_frames, schema=FRAMES_SCHEMA)
