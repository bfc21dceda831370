"""IMA-ADPCM differential: an INDEPENDENT in-test encoder (written
from the IMA ADPCM spec: quantize the diff against the step table,
track its own reconstruction) compresses a deterministic waveform;
the module decoder must reproduce the encoder's tracked reconstruction
SAMPLE-EXACT — the prediction loop is the lossless layer of the lossy
codec, same evidence shape as the JPEG coefficient test."""

from __future__ import annotations

import struct

import numpy as np

from annotation_service_spark.operators.multimodal import (
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    decode_features,
    decode_ima_adpcm,
)


def _encode_block(samples: np.ndarray, pred: int, index: int):
    """Encode one mono block: returns (block_bytes, reconstruction,
    next_pred, next_index). samples[0] is transmitted verbatim in the
    header; the rest quantize to nibbles."""
    recon = [pred]
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    step = _IMA_STEP_TABLE[index]
    nibbles = []
    cur = pred
    for s in samples[1:]:
        diff = int(s) - cur
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        delta = step >> 3
        if diff >= step:
            nib |= 4
            diff -= step
            delta += step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
            delta += step >> 1
        if diff >= step >> 2:
            nib |= 1
            delta += step >> 2
        cur = cur - delta if nib & 8 else cur + delta
        cur = min(32767, max(-32768, cur))
        recon.append(cur)
        index = min(88, max(0, index + _IMA_INDEX_TABLE[nib]))
        step = _IMA_STEP_TABLE[index]
        nibbles.append(nib)
    for i in range(0, len(nibbles), 2):
        lo = nibbles[i]
        hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
        out.append(lo | (hi << 4))
    return bytes(out), recon, cur, index


def _wav_ima(samples: np.ndarray, rate=8000, samples_per_block=505):
    """Wrap mono int16 samples into an IMA-ADPCM WAV (tag 0x0011),
    returning (payload, full reconstruction)."""
    block_align = 4 + (samples_per_block - 1 + 1) // 2
    data = bytearray()
    recon: list[int] = []
    pred, index = int(samples[0]), 0
    for b0 in range(0, len(samples), samples_per_block):
        blk = samples[b0 : b0 + samples_per_block]
        pred = int(blk[0])  # block header restarts the predictor
        enc, r, pred, index = _encode_block(blk, pred, index)
        enc = enc.ljust(block_align, b"\x00")
        # zero-padded nibbles keep decoding (decoder emits them too),
        # so pad the reference reconstruction the same way
        data.extend(enc)
        recon.extend(r)
        pad = (block_align - 4) * 2 + 1 - len(r)
        if pad:
            cur, idx2 = r[-1], index
            step = _IMA_STEP_TABLE[idx2]
            for _ in range(pad):
                delta = step >> 3
                cur = min(32767, max(-32768, cur + delta))
                recon.append(cur)
                idx2 = min(88, max(0, idx2 + _IMA_INDEX_TABLE[0]))
                step = _IMA_STEP_TABLE[idx2]
            index = idx2
    fmt = struct.pack(
        "<HHIIHHH", 0x0011, 1, rate, rate * block_align // samples_per_block,
        block_align, 4, samples_per_block,
    )
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return payload, np.asarray(recon, dtype=np.int16)


def _waveform(n=1600):
    t = np.arange(n, dtype=np.float64)
    x = 9000 * np.sin(2 * np.pi * t / 80) + 4000 * np.sin(2 * np.pi * t / 13)
    return np.clip(np.round(x), -32768, 32767).astype(np.int16)


def test_ima_adpcm_decode_matches_encoder_reconstruction():
    samples = _waveform()
    payload, recon = _wav_ima(samples)
    got, rate = decode_ima_adpcm(payload)
    assert rate == 8000
    assert np.array_equal(got, recon)
    # and the codec actually tracks the waveform (lossy but close)
    m = min(len(samples), len(got))
    err = np.abs(got[:m].astype(np.int64) - samples[:m].astype(np.int64))
    assert np.median(err) < 2000


def test_ima_adpcm_feature_dispatch():
    payload, _ = _wav_ima(_waveform(600), samples_per_block=201)
    feats = decode_features(payload, 16, deterministic_fake=False)
    assert feats.shape == (16,)
    assert np.isfinite(feats).all()


def test_ima_adpcm_rejects_pcm_and_garbage():
    import pytest

    with pytest.raises(ValueError):
        decode_ima_adpcm(b"RIFF\x00\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        decode_ima_adpcm(b"not a riff at all")


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=2,
        max_size=400,
    ),
    st.integers(min_value=2, max_value=64),
)
def test_ima_adpcm_property_roundtrip(samples, spb):
    """For ANY waveform and block size, decode(encode(x)) equals the
    encoder's tracked reconstruction exactly, stays inside int16, and
    block boundaries restart cleanly."""
    x = np.asarray(samples, dtype=np.int16)
    payload, recon = _wav_ima(x, samples_per_block=spb)
    got, rate = decode_ima_adpcm(payload)
    assert np.array_equal(got, recon)
    assert got.dtype == np.int16


def test_resize_nearest_known_pixels():
    """4x4 checkerboard downscaled 2x: half-pixel-center mapping picks
    sources at indices floor((i+0.5)*2) = 1, 3."""
    from annotation_service_spark.operators.multimodal import resize_nearest

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[1, 1] = 10
    img[1, 3] = 20
    img[3, 1] = 30
    img[3, 3] = 40
    out = resize_nearest(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == 10 and out[0, 1, 0] == 20
    assert out[1, 0, 0] == 30 and out[1, 1, 0] == 40
    # identity when target == source
    assert np.array_equal(resize_nearest(img, 4, 4), img)


def test_resize_media_roundtrips_ppm(spark):
    """resize_media over a mixed batch: a real PPM shrinks to the
    planned geometry and re-decodes; a non-image payload passes
    through unchanged with resized=false."""
    from annotation_service_spark.operators.multimodal import (
        decode_ppm,
        resize_media,
    )

    w, h = 64, 48
    px = np.arange(w * h * 3, dtype=np.int64) % 251
    ppm = b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()
    rows = [(1, bytearray(ppm)), (2, bytearray(b"not an image"))]
    media = spark.createDataFrame(rows, "media_id long, media binary")
    out = {r.media_id: r for r in resize_media(media, max_side=16).collect()}
    assert out[1].resized and (out[1].width, out[1].height) == (16, 12)
    back = decode_ppm(bytes(out[1].payload))
    assert back.shape == (12, 16, 3)
    # spot-check one resampled pixel against the direct kernel
    from annotation_service_spark.operators.multimodal import resize_nearest

    ref = resize_nearest(px.reshape(h, w, 3).astype(np.uint8), 16, 12)
    assert np.array_equal(back, ref)
    assert not out[2].resized and bytes(out[2].payload) == b"not an image"


def _wav_bytes(samples, rate=8000):
    import io
    import struct
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        x = np.clip(np.asarray(samples) * 32767, -32768, 32767).astype("<i2")
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def _tone_mix(seed, n=4000, noise=0.0):
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n) / 8000.0
    x = np.zeros(n)
    for _ in range(3):
        f = rng.uniform(100, 3000)
        x += rng.uniform(0.2, 0.5) * np.sin(2 * np.pi * f * t)
    if noise:
        x += rng.normal(0, noise, n)
    return x / np.max(np.abs(x))


def test_afp_structural_properties():
    """afp63: identical clip -> 0 hamming; noised/rescaled variant ->
    small hamming; different tonal content -> large; 63-bit range."""
    from annotation_service_spark.operators import multimodal as mm

    a = mm.afp63(_tone_mix(1))
    assert a == mm.afp63(_tone_mix(1))
    assert 0 <= a < 1 << 63
    # amplitude invariance: scaling the waveform changes nothing
    assert mm.afp63(_tone_mix(1) * 0.3) == a
    near = mm.afp63(_tone_mix(1, noise=0.02))
    far = mm.afp63(_tone_mix(2))
    d_near = bin(a ^ near).count("1")
    d_far = bin(a ^ far).count("1")
    assert d_near <= 6, d_near
    assert d_far >= 10, d_far


def test_audio_fingerprint_pairs_pipeline(spark):
    """End-to-end audio near-dup through Spark: noised re-encodes
    pair with their originals inside the guaranteed radius; unrelated
    clips and undecodable payloads never pair."""
    from annotation_service_spark.operators import multimodal as mm

    rows = []
    for i in range(6):
        rows.append((i, bytearray(_wav_bytes(_tone_mix(i)))))
    rows.append((100, bytearray(_wav_bytes(_tone_mix(0, noise=0.02)))))
    rows.append((104, bytearray(_wav_bytes(_tone_mix(4, noise=0.02)))))
    rows.append((300, bytearray(b"definitely not audio")))
    df = spark.createDataFrame(rows, "media_id long, media binary")
    tbl = {r.id: r for r in mm.audio_fingerprint_table(df).collect()}
    assert not tbl[300].decoded and all(tbl[i].decoded for i in range(6))
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.audio_fingerprint_pairs(df, max_hamming=6).collect()
    }
    assert (0, 100) in pairs and (4, 104) in pairs
    assert all(300 not in p for p in pairs)
