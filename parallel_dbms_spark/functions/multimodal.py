"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (extension surface).

Decode support is format-honest: uncompressed formats that need no
codec library — PPM/PGM (netpbm), 24-bit BMP, 16-bit PCM WAV — decode
FOR REAL (pure stdlib + numpy, see :func:`decode_image` /
:func:`decode_wav`); compressed formats (JPEG/PNG/MP3/...) raise
``NotImplementedError`` because their codecs are not in this
container. The Spark-side plumbing — schema, partitioning, Arrow batch
shapes — is identical either way and fully tested.

Pattern at 100 TB: binaries live in the lake as (binary payload, typed
metadata struct); decode/feature-extract runs as mapInPandas over Arrow
batches so each task streams batches instead of materializing a
partition; outputs are fixed-width feature columns that downstream
relational operators treat normally.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """Raw netpbm: P6 (RGB) -> (h, w, 3) uint8, P5 (gray) -> (h, w).
    Header = magic, width, height, maxval as whitespace-separated
    tokens, ``#`` comments allowed; pixel data follows the single
    whitespace after maxval."""
    magic = payload[:2]
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from pixels
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> raw P6/P5 bytes (the re-encode side
    of the resize pipeline)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    magic = b"P5" if gray else b"P6"
    return magic + f" {w} {h} 255\n".encode("ascii") + arr.astype(np.uint8).tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB. Rows are stored
    bottom-up, 4-byte padded, BGR order — all undone here."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got {bpp}bpp/c{compression})")
    flipped, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not flipped:
        img = img[::-1]  # bottom-up -> top-down
    return img[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to a uint8 numpy array — REAL for the
    codec-free formats (raw netpbm P5/P6, uncompressed 24-bit BMP),
    ``NotImplementedError`` for compressed formats whose codec
    libraries (PIL/libjpeg/libpng) are not in this container. The
    mapInPandas call sites are format-agnostic: adding JPEG support
    later is one more dispatch arm, nothing else changes."""
    magic = bytes(payload[:2])
    if magic in (b"P5", b"P6"):
        return _decode_netpbm(bytes(payload))
    if magic == b"BM":
        return _decode_bmp(bytes(payload))
    raise NotImplementedError(
        f"no codec for magic {magic!r}: compressed formats (JPEG/PNG/...) "
        "need codec libraries not in this container"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV -> (float64 samples in [-1, 1) with shape
    (n, channels), sample_rate). Pure stdlib ``wave`` + numpy — real
    audio decode, no codec library involved."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        n, ch = wf.getnframes(), wf.getnchannels()
        raw = np.frombuffer(wf.readframes(n), dtype="<i2")
        return raw.reshape(-1, ch).astype(np.float64) / 32768.0, wf.getframerate()


def _to_gray(img: np.ndarray) -> np.ndarray:
    return img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)


def _nearest_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index gather — the real
    pixel math, vectorized in numpy."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return img[yi][:, xi]


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes are
    folded into ``dim`` buckets. Keeps tests meaningful (stable values,
    right shape) without codecs."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [x / 997.0 for x in acc]


def _image_feature(payload: bytes, dim: int) -> list[float]:
    """REAL feature vector from a decoded image: grayscale intensity
    mean-pooled into ``dim`` buckets, normalized to [0, 1]."""
    g = _to_gray(decode_image(payload)).ravel()
    idx = (np.arange(g.size) * dim) // max(g.size, 1)
    sums = np.bincount(idx, weights=g, minlength=dim)
    cnts = np.bincount(idx, minlength=dim).clip(min=1)
    return (sums / cnts / 255.0).tolist()


def extract_features(df: DataFrame, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary payload.

    Arrow-batched: each pandas batch maps payload->feature vector.
    ``use_stub=False`` runs the REAL decoder + grayscale pooled
    features (netpbm/BMP payloads; compressed formats raise for lack
    of codecs); the default stub folds raw bytes so text-as-bytes
    fixtures still exercise the identical plumbing."""
    out_schema = "doc_id bigint, byte_len bigint, feature array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_stub:
                feats = pdf["payload"].map(lambda p: _fake_feature(p, dim))
            else:
                feats = pdf["payload"].map(
                    lambda p: _image_feature(bytes(p), dim)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema=out_schema)


def image_pooled_intensity(df: DataFrame, dim: int = 8) -> DataFrame:
    """REAL-decode pooled intensity in the INTEGER contract (the
    multimodal_pcm_energy trade applied to pixels): decode_image runs
    the actual netpbm/BMP parser, each pixel contributes its integer
    3-channel sum (3x the grayscale mean — exact, no thirds), and the
    ``dim`` mean-pool buckets report (sum, count) integer pairs
    instead of the float ratio — bit-equal on any engine, so the
    decode -> pool path value-hashes against a SQL oracle. The float
    feature twin (``extract_features(use_stub=False)``) stays for
    consumers wanting [0,1] features; sums/counts carry the same
    information losslessly. One mapInPandas Arrow pass, one output
    row per (doc, bucket)."""
    out_schema = "doc_id bigint, pos int, s3_sum bigint, n_px bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, sums, cnts = [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                if img.ndim == 3:
                    s3 = img.astype(np.int64).sum(axis=2).ravel()
                else:
                    s3 = (img.astype(np.int64) * 3).ravel()
                idx = (np.arange(s3.size) * dim) // max(s3.size, 1)
                acc = np.zeros(dim, dtype=np.int64)
                np.add.at(acc, idx, s3)
                npx = np.bincount(idx, minlength=dim)
                ids += [did] * dim
                poss += list(range(dim))
                sums += acc.tolist()
                cnts += npx.tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "pos": poss, "s3_sum": sums, "n_px": cnts}
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema=out_schema)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, use_stub: bool = True
) -> DataFrame:
    """mapInPandas image resize: binary in -> binary out, batch-wise.

    ``use_stub=False`` is the REAL path for codec-free formats: decode
    (netpbm/BMP) -> nearest-neighbor resample to (height, width) ->
    re-encode as raw PPM/PGM. The stub resamples raw payload bytes to
    exactly ``width*height`` so text-as-bytes fixtures flow through the
    same shape. Either way the production shape holds — binary columns
    through Arrow batches in AND out, per-row output size fixed by the
    op's parameters, no driver hop, no partition materialization.
    """

    def _fake_resize(payload: bytes, n_out: int) -> bytes:
        if len(payload) == 0:
            return bytes(n_out)
        step = len(payload) / n_out
        return bytes(payload[int(i * step)] for i in range(n_out))

    def _real_resize(payload: bytes) -> bytes:
        return encode_ppm(_nearest_resize(decode_image(payload), width, height))

    n_out = width * height
    out_schema = "doc_id bigint, payload binary, width int, height int, byte_len bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_stub:
                resized = pdf["payload"].map(lambda p: _fake_resize(bytes(p), n_out))
            else:
                resized = pdf["payload"].map(lambda p: _real_resize(bytes(p)))
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

    ``use_stub=False`` is REAL audio: the payload is decoded as 16-bit
    PCM WAV (stdlib ``wave``, :func:`decode_wav`), windows are
    ``frame_bytes`` samples of the channel-mean signal, RMS is over
    [-1, 1) floats. The stub treats raw payload bytes as 8-bit
    samples so text-as-bytes fixtures run the same shape. Either way:
    binary in via Arrow batches, ONE output row per (doc, window) —
    the fan-out happens executor-side inside mapInPandas, and window
    count scales with payload size, never with driver memory.

    Besides the float ``rms``, every window carries an INTEGER
    ``energy`` — the sum of squared samples on the pre-normalized
    lattice (stub: ``byte - 128``; WAV: the int16 values, recovered
    exactly since /32768 is a power-of-two scale). Integer energy is
    bit-equal across engines, which is what lets the registry row
    value-hash against a DuckDB oracle (rms's sqrt stays the
    float twin for audio consumers).
    """
    out_schema = (
        "doc_id bigint, window_idx int, n_samples int, rms double, "
        "energy bigint"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, nb, rms, energy = [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if use_stub:
                    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                    sig = buf.astype(np.float64) - 128.0
                    lattice = sig
                else:
                    samples, _rate = decode_wav(bytes(payload))
                    sig = samples.mean(axis=1)  # downmix to mono
                    lattice = np.rint(sig * 32768.0)
                if len(sig) == 0:
                    continue
                for w in range(0, len(sig), frame_bytes):
                    chunk = sig[w : w + frame_bytes]
                    lat = lattice[w : w + frame_bytes]
                    ids.append(did)
                    widx.append(w // frame_bytes)
                    nb.append(len(chunk))
                    rms.append(float(np.sqrt((chunk * chunk).mean())))
                    energy.append(int((lat * lat).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": widx,
                    "n_samples": nb,
                    "rms": rms,
                    "energy": energy,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema=out_schema)


def phash64(payload: bytes) -> int:
    """Perceptual difference-hash (dHash) of a decodable image payload:
    decode -> grayscale -> nearest-resize to 9x8 -> compare each pixel
    to its right neighbor -> 64 bits packed as a SIGNED int64 (Spark
    LongType). Robust to small pixel noise and uniform brightness
    shifts in a way byte hashes are not — two re-encodes of the same
    picture land within a few bits.
    """
    g = _to_gray(decode_image(payload))
    small = _nearest_resize(g, 9, 8)  # width 9 -> 8 comparisons/row
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_signatures(df: DataFrame) -> DataFrame:
    """(id, sh): 64-bit pHash per image payload, Arrow-batched through
    mapInPandas over (doc_id, payload) — the image-side analog of
    ``dedup.simhash``'s text signature."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["doc_id"],
                    "sh": pdf["payload"].map(lambda p: phash64(bytes(p))),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, schema="id bigint, sh bigint")


def image_neardup_pairs(
    df: DataFrame, max_hamming: int = 6, blocks: int = 8
) -> DataFrame:
    """Near-duplicate IMAGE pairs: pHash signatures + the pigeonhole
    hamming-block candidate join shared with text SimHash
    (``dedup.hamming_neardup_pairs``). One Python pass computes the
    64-bit signature per image; everything after — blocking, candidate
    equi-joins, exact hamming verify — is codegen built-ins. At 100 TB
    of images the signature pass is the only part that touches pixels;
    the join works on 8-byte hashes.
    """
    from .dedup import hamming_neardup_pairs

    return hamming_neardup_pairs(
        image_signatures(df), max_hamming=max_hamming, blocks=blocks
    )


def encode_wav16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Float [-1, 1) mono samples -> 16-bit PCM WAV bytes (stdlib
    ``wave``) — the encode half of :func:`decode_wav`, used to package
    raw signals as a real audio binary column."""
    import io
    import wave

    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_spectral_features(
    df: DataFrame, frame: int = 512
) -> DataFrame:
    """Per-frame SPECTRAL features over a WAV binary column — RMS,
    spectral centroid (Hz), and bandwidth (Hz) from a real rFFT of
    each ``frame``-sample window: the front half of every audio
    pipeline (VAD, language/music discrimination, silence trimming,
    Whisper-style chunk gating).

    Real DSP, no codec library: :func:`decode_wav` (stdlib) -> mono
    downmix -> frame -> ``numpy.fft.rfft`` -> magnitude moments.
    Executor-side fan-out in one Arrow pass (mapInPandas): one output
    row per (doc, frame); frame count scales with payload bytes, never
    driver memory. Trailing partial frames are kept (zero-padded FFT
    denominator = actual length). Deterministic: numpy FFT on the same
    bytes yields identical doubles on every executor.
    """
    out_schema = (
        "doc_id bigint, frame_idx int, n_samples int, "
        "rms double, centroid_hz double, bandwidth_hz double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, ns, rms, cen, bw = [], [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                sig = samples.mean(axis=1)
                for w in range(0, len(sig), frame):
                    seg = sig[w : w + frame]
                    if len(seg) == 0:
                        continue
                    mag = np.abs(np.fft.rfft(seg))
                    freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
                    tot = mag.sum()
                    c = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                    b = (
                        float(np.sqrt(((freqs - c) ** 2 * mag).sum() / tot))
                        if tot > 0
                        else 0.0
                    )
                    ids.append(did)
                    fidx.append(w // frame)
                    ns.append(len(seg))
                    rms.append(float(np.sqrt(np.mean(seg**2))))
                    cen.append(c)
                    bw.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "centroid_hz": pd.Series(cen, dtype="float64"),
                    "bandwidth_hz": pd.Series(bw, dtype="float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, out_schema)
