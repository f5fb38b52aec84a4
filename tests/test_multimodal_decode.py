"""REAL decode paths for codec-free formats (netpbm P5/P6, 24-bit BMP,
16-bit PCM WAV): pixel/sample values verified against hand-built
payloads, and the same use_stub=False ops driven end-to-end through
mapInPandas. Compressed formats still raise NotImplementedError.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from parallel_dbms_spark.functions import multimodal as mm


def _ppm(arr: np.ndarray) -> bytes:
    return mm.encode_ppm(arr)


def _bmp24(arr: np.ndarray) -> bytes:
    """Minimal bottom-up uncompressed 24-bit BMP from an RGB array."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    rows = b"".join(
        bgr[y].tobytes() + bytes(stride - w * 3) for y in range(h - 1, -1, -1)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + info + rows


def _wav16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """samples: float array in [-1, 1), mono."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples * 32768.0).astype("<i2").tobytes())
    return buf.getvalue()


RGB = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)


def test_ppm_roundtrip_exact():
    assert np.array_equal(mm.decode_image(_ppm(RGB)), RGB)


def test_pgm_with_comment_header():
    gray = np.array([[0, 128], [255, 7]], dtype=np.uint8)
    raw = b"P5\n# a comment\n2 2\n255\n" + gray.tobytes()
    assert np.array_equal(mm.decode_image(raw), gray)


def test_bmp_decodes_to_rgb_topdown():
    assert np.array_equal(mm.decode_image(_bmp24(RGB)), RGB)


def test_compressed_formats_still_raise():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0JFIF")


def test_wav_decode_values():
    sig = np.array([0.0, 0.5, -0.5, 0.25])
    samples, rate = mm.decode_wav(_wav16(sig, rate=16000))
    assert rate == 16000 and samples.shape == (4, 1)
    assert np.allclose(samples[:, 0], sig, atol=1 / 32768)


def _payload_df(spark, payloads: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()],
        "doc_id long, payload binary",
    )


def test_extract_features_real_path_through_spark(spark):
    # uniform-intensity image -> every pooled bucket equals v/255
    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    df = _payload_df(spark, {1: _ppm(img), 2: _bmp24(img)})
    rows = {
        r["doc_id"]: r["feature"]
        for r in mm.extract_features(df, dim=4, use_stub=False).collect()
    }
    for feat in rows.values():
        assert np.allclose(feat, [200 / 255.0] * 4)


def test_resize_real_path_roundtrips_as_ppm(spark):
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    df = _payload_df(spark, {1: _ppm(img)})
    row = mm.resize_images(df, width=4, height=2, use_stub=False).first()
    out = mm.decode_image(bytes(row["payload"]))
    assert out.shape == (2, 4, 3)
    # nearest-neighbor: resampled pixels are original pixels
    assert np.array_equal(out, img[[0, 4]][:, [0, 2, 4, 6]])


def test_audio_energy_real_path(spark):
    # constant amplitude 0.5 -> RMS 0.5 in every full window
    sig = np.full(1024, 0.5)
    df = _payload_df(spark, {7: _wav16(sig)})
    rows = mm.audio_window_energy(df, frame_bytes=256, use_stub=False).collect()
    assert len(rows) == 4
    assert all(abs(r["rms"] - 0.5) < 1e-3 for r in rows)


def test_phash_neardup_finds_noisy_twin_not_distinct(spark):
    """pHash near-dup: a PPM image and its slightly-noised twin pair up
    at small hamming distance; a structurally different image pairs
    with neither. Pixels are real (decoded by the netpbm path)."""
    import numpy as np

    from parallel_dbms_spark.functions.multimodal import (
        encode_ppm,
        image_neardup_pairs,
        phash64,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    noisy = base.copy()
    noisy[3:5, 3:5] = np.clip(noisy[3:5, 3:5].astype(int) + 9, 0, 255).astype(
        np.uint8
    )
    # different structure: strong gradient, not noise
    distinct = np.tile(
        (np.arange(16, dtype=np.uint8) * 16)[None, :, None], (16, 1, 3)
    )
    rows = [
        (1, bytearray(encode_ppm(base))),
        (2, bytearray(encode_ppm(noisy))),
        (3, bytearray(encode_ppm(distinct))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(df, max_hamming=6).collect()
    }
    assert (1, 2) in pairs, f"noisy twin not found: {pairs}"
    assert pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # signature sanity: identical payload -> identical hash; the local
    # phash64 matches what the distributed pass computed
    local = phash64(encode_ppm(base))
    assert isinstance(local, int)
    from parallel_dbms_spark.functions.multimodal import image_signatures

    dist = {r["id"]: r["sh"] for r in image_signatures(df).collect()}
    assert dist[1] == local


def test_audio_spectral_centroid_matches_tone(spark):
    """A pure 1 kHz sine's spectral centroid is 1 kHz (tight bandwidth);
    a 500 Hz + 3 kHz two-tone lands between them with wide bandwidth —
    the physics check that the rFFT features are real, not plumbing."""
    import numpy as np

    from parallel_dbms_spark.functions import multimodal as mm

    rate = 8000
    t = np.arange(4096) / rate
    sine = 0.8 * np.sin(2 * np.pi * 1000 * t)
    two = 0.4 * np.sin(2 * np.pi * 500 * t) + 0.4 * np.sin(2 * np.pi * 3000 * t)
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_wav16(sine, rate))),
         (2, bytearray(mm.encode_wav16(two, rate)))],
        "doc_id long, payload binary",
    )
    out = mm.audio_spectral_features(df, frame=512)
    rows = out.collect()
    # full frames only (the trailing partial frame has coarser bins)
    by_doc: dict = {}
    for r in rows:
        if r["n_samples"] == 512:
            by_doc.setdefault(r["doc_id"], []).append(r)
    cents1 = [r["centroid_hz"] for r in by_doc[1]]
    assert all(abs(c - 1000.0) < 40.0 for c in cents1), cents1
    bw1 = [r["bandwidth_hz"] for r in by_doc[1]]
    cents2 = [r["centroid_hz"] for r in by_doc[2]]
    # equal-amplitude tones at 500/3000 -> centroid near 1750
    assert all(1400.0 < c < 2100.0 for c in cents2), cents2
    bw2 = [r["bandwidth_hz"] for r in by_doc[2]]
    assert min(bw2) > max(bw1)  # two-tone is spectrally wider
    # RMS of a 0.8-amplitude sine is 0.8/sqrt(2)
    rms1 = [r["rms"] for r in by_doc[1]]
    assert all(abs(v - 0.8 / np.sqrt(2)) < 0.02 for v in rms1)
    # frame fan-out: 4096 samples / 512 = 8 full frames per doc
    assert len(by_doc[1]) == 8 and len(by_doc[2]) == 8
