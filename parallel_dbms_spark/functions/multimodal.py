"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (extension surface — the container has no image/audio codecs,
so the DECODE step is stubbed; the Spark-side plumbing — schema,
partitioning, Arrow batch shapes — is real and tested).

Pattern at 100 TB: binaries live in the lake as (binary payload, typed
metadata struct); decode/feature-extract runs as mapInPandas over Arrow
batches so each task streams batches instead of materializing a
partition; outputs are fixed-width feature columns that downstream
relational operators treat normally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# Schema of the multimodal envelope produced by attach_binary().
MM_META_FIELDS = "kind string, byte_len bigint, sha256 string"


def attach_binary(df: DataFrame, payload_col, kind: str = "blob") -> DataFrame:
    """Wrap an existing column as an opaque binary payload + metadata
    struct. In production the payload would come from
    ``spark.read.format('binaryFile')`` or a lake column; here any
    column (e.g. documents.text) can stand in as bytes."""
    payload = F.encode(payload_col.cast("string"), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(F.col("payload")).alias("byte_len"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — image codecs are not available in this container.

    The real implementation would be `PIL.Image.open(io.BytesIO(payload))`
    inside `extract_features`' pandas batches; the surrounding Spark
    plumbing (Arrow batch iteration, schema, partitioning) is what this
    module actually exercises.
    """
    raise NotImplementedError("image decoding requires codec libraries not in this container")


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes are
    folded into ``dim`` buckets. Keeps tests meaningful (stable values,
    right shape) without codecs."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [x / 997.0 for x in acc]


def extract_features(df: DataFrame, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary payload.

    Arrow-batched: each pandas batch maps payload->feature vector. With
    ``use_stub=False`` it would call the real decoder (NotImplementedError
    here, by design)."""
    out_schema = f"doc_id bigint, byte_len bigint, feature array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                pdf["payload"].map(decode_image)  # raises: no codecs in container
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(lambda p: _fake_feature(p, dim)),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema=out_schema)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, use_stub: bool = True
) -> DataFrame:
    """mapInPandas image resize: binary in -> binary out, batch-wise.

    The pixel math is stubbed (no codecs in this container): the "resized
    image" is a deterministic even-stride resample of the payload bytes
    to exactly ``width*height`` bytes. Everything around it is the real
    production shape — binary columns through Arrow batches in AND out,
    per-row output size fixed by the op's parameters, no driver hop, no
    partition materialization. Swap ``_fake_resize`` for
    PIL ``Image.resize`` + re-encode and nothing else changes.
    """

    def _fake_resize(payload: bytes, n_out: int) -> bytes:
        if len(payload) == 0:
            return bytes(n_out)
        step = len(payload) / n_out
        return bytes(payload[int(i * step)] for i in range(n_out))

    n_out = width * height
    out_schema = "doc_id bigint, payload binary, width int, height int, byte_len bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                pdf["payload"].map(decode_image)  # raises: no codecs in container
            resized = pdf["payload"].map(lambda p: _fake_resize(bytes(p), n_out))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                    "byte_len": resized.map(len),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling *plan* shape: explode a (stubbed) frame
    index list and keep every Nth — demonstrates the fan-out schema
    (one row per sampled frame) used by real video pipelines."""
    n_frames = (F.col("meta.byte_len") % 120 + 1).cast("int")  # stub frame count
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .filter(F.col("frame_idx") % every_n == 0)
        .select("doc_id", "frame_idx", "meta")
    )


def audio_window_energy(
    df: DataFrame, frame_bytes: int = 256, use_stub: bool = True
) -> DataFrame:
    """Audio-modality plumbing: per-window RMS energy over a binary
    payload — the framing/feature shape of VAD, silence trimming, and
    loudness normalization in audio pipelines.

    The codec step is stubbed (no audio libs in this container): the
    payload's raw bytes stand in for PCM samples; windows are fixed
    ``frame_bytes`` slices. Real shape everywhere else: binary in via
    Arrow batches, ONE output row per (doc, window) — the fan-out
    happens executor-side inside mapInPandas, and window count scales
    with payload size, never with driver memory. Swap the stub for
    soundfile/ffmpeg decode and the schema/partitioning is unchanged.
    """
    import numpy as np

    out_schema = "doc_id bigint, window_idx int, n_bytes int, rms double"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, nb, rms = [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not use_stub:
                    decode_image(bytes(payload))  # raises: no codecs here
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(buf) == 0:
                    continue
                for w in range(0, len(buf), frame_bytes):
                    chunk = buf[w : w + frame_bytes].astype(np.float64) - 128.0
                    ids.append(did)
                    widx.append(w // frame_bytes)
                    nb.append(len(chunk))
                    rms.append(float(np.sqrt((chunk * chunk).mean())))
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": widx, "n_bytes": nb, "rms": rms}
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema=out_schema)
