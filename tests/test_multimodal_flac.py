"""FLAC decoder differential tests: a minimal subset ENCODER writes
real FLAC streams (STREAMINFO + fixed-blocksize frames, Rice residual
coding, CRC-8/CRC-16), and decode_flac must reconstruct the PCM
bit-exactly — the lossless-codec analog of the ADPCM/JPEG
differentials. Encoder and decoder share only the public format
(RFC 9639), so agreement checks the decode path, not a mirror."""

from __future__ import annotations

import random

import numpy as np
import pytest

from annotation_service_spark.operators.multimodal import (
    _crc8_flac,
    _crc16_flac,
    decode_features,
    decode_flac,
)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in reversed(range(n)):
            self.bits.append((v >> i) & 1)

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(rate: int, bps: int, total: int) -> bytes:
    w = _BitWriter()
    w.write(16, 16)  # min block size
    w.write(65535, 16)  # max block size
    w.write(0, 24)  # min frame size (unknown)
    w.write(0, 24)  # max frame size (unknown)
    w.write(rate, 20)
    w.write(0, 3)  # channels - 1 (mono)
    w.write(bps - 1, 5)
    w.write(total, 36)
    body = w.to_bytes() + b"\x00" * 16  # md5 unset
    assert len(body) == 34
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + body


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(e: int) -> int:
    return (e << 1) ^ (e >> 63)


def _encode_frame(
    samples: list[int],
    frame_no: int,
    order: int,
    rice_param: int,
    bps: int = 16,
    escape_width: int | None = None,
    lpc: tuple[list[int], int, int] | None = None,
) -> bytes:
    """One fixed-strategy frame: blocksize code 7 (16-bit literal),
    sample-rate from STREAMINFO, mono, explicit sample-size code.
    ``lpc=(coefs, shift, precision)`` writes an LPC subframe instead
    of FIXED."""
    bs = len(samples)
    w = _BitWriter()
    w.write(0x3FFE, 14)  # sync
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocksize strategy
    w.write(7, 4)  # block size: 16-bit at end of header
    w.write(0, 4)  # sample rate: from STREAMINFO
    w.write(0, 4)  # channel assignment: mono
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
    w.write(0, 1)  # reserved
    assert frame_no < 128
    w.write(frame_no, 8)  # UTF-8 number, 1-byte form
    w.write(bs - 1, 16)
    hdr = w.to_bytes()
    w.write(_crc8_flac(hdr), 8)

    # subframe header
    w.write(0, 1)
    if lpc is not None:
        coefs, shift, precision = lpc
        order = len(coefs)
        w.write(0x20 | (order - 1), 6)
    else:
        w.write(8 + order, 6)
    w.write(0, 1)  # no wasted bits
    for s in samples[:order]:  # warmup
        w.write_signed(s, bps)
    if lpc is not None:
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, precision)
        pred = lambda i: sum(  # noqa: E731
            c * samples[i - 1 - j] for j, c in enumerate(coefs)
        ) >> shift
    else:
        coefs = _FIXED_COEFS[order]
        pred = lambda i: sum(  # noqa: E731
            c * samples[i - 1 - j] for j, c in enumerate(coefs)
        )
    residuals = [samples[i] - pred(i) for i in range(order, bs)]

    w.write(0, 2)  # residual method 0: 4-bit rice params
    w.write(0, 4)  # partition order 0
    if escape_width is not None:
        w.write(0xF, 4)  # escape
        w.write(escape_width, 5)
        for e in residuals:
            w.write_signed(e, escape_width)
    else:
        w.write(rice_param, 4)
        for e in residuals:
            u = _zigzag(e)
            w.write_unary(u >> rice_param)
            if rice_param:
                w.write(u & ((1 << rice_param) - 1), rice_param)
    frame = w.to_bytes()
    return frame + _crc16_flac(frame).to_bytes(2, "big")


def _encode(
    samples: list[int],
    rate: int = 8000,
    blocksize: int = 64,
    order: int = 2,
    rice_param: int = 6,
    bps: int = 16,
    **frame_kw,
) -> bytes:
    out = bytearray(_streaminfo(rate, bps, len(samples)))
    for fno, i in enumerate(range(0, len(samples), blocksize)):
        blk = samples[i : i + blocksize]
        out += _encode_frame(blk, fno, order, rice_param, bps=bps, **frame_kw)
    return bytes(out)


def _signal(n: int, seed: int = 7) -> list[int]:
    """A tonal signal + noise — compressible, full int16 range."""
    rng = random.Random(seed)
    return [
        max(
            -32768,
            min(
                32767,
                int(8000 * np.sin(i / 9.0) + 2000 * np.sin(i / 57.0))
                + rng.randint(-300, 300),
            ),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_flac_fixed_orders_roundtrip(order):
    x = _signal(200)
    payload = _encode(x, blocksize=50, order=order, rice_param=7)
    got, rate = decode_flac(payload)
    assert rate == 8000
    assert got.tolist() == x


def test_flac_multiframe_and_tail():
    x = _signal(230, seed=11)  # last frame shorter than blocksize
    payload = _encode(x, blocksize=64, order=2, rice_param=6)
    got, _ = decode_flac(payload)
    assert got.tolist() == x


def test_flac_escape_partition_roundtrip():
    x = _signal(96, seed=3)
    payload = _encode(
        x, blocksize=48, order=1, rice_param=0, escape_width=17
    )
    got, _ = decode_flac(payload)
    assert got.tolist() == x


def test_flac_lpc_roundtrip():
    x = _signal(120, seed=5)
    payload = _encode(
        x,
        blocksize=60,
        order=0,
        rice_param=7,
        lpc=([3434, -1658, 271], 11, 14),  # a plausible order-3 predictor
    )
    got, _ = decode_flac(payload)
    assert got.tolist() == x


def test_flac_crc_detects_corruption():
    x = _signal(64, seed=2)
    payload = bytearray(_encode(x, blocksize=64, order=2))
    payload[len(payload) // 2] ^= 0x40  # flip a bit mid-frame
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))


def test_flac_rejects_stereo_and_non_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxxWAVE")
    # stereo STREAMINFO: channels-1 = 1
    w = _BitWriter()
    w.write(16, 16); w.write(65535, 16); w.write(0, 24); w.write(0, 24)
    w.write(8000, 20); w.write(1, 3); w.write(15, 5); w.write(0, 36)
    body = w.to_bytes() + b"\x00" * 16
    with pytest.raises(ValueError):
        decode_flac(b"fLaC" + bytes([0x80, 0, 0, 34]) + body)


def test_flac_rejects_frame_bps_mismatching_streaminfo():
    """A frame whose header sample-size code differs from STREAMINFO
    would be normalized by the wrong 2^(bps-1) scale downstream —
    the decoder raises rather than guesses (ADVICE r8)."""
    x = [v // 256 for v in _signal(32, seed=4)]  # fits 8-bit
    # STREAMINFO claims 16-bit; the frame header says 8-bit (ss code 1)
    payload = bytearray(_streaminfo(8000, 16, len(x)))
    payload += _encode_frame(x, 0, order=1, rice_param=4, bps=8)
    with pytest.raises(ValueError, match="sample size"):
        decode_flac(bytes(payload))


def test_flac_feeds_decode_features():
    x = _signal(128, seed=9)
    payload = _encode(x, blocksize=64, order=2)
    feats = decode_features(payload, 8, deterministic_fake=False)
    want = np.asarray(x, dtype=np.float64) / 32768.0
    edges = np.linspace(0, len(want), 9, dtype=np.int64)
    expect = [want[a:b].mean() for a, b in zip(edges[:-1], edges[1:])]
    assert np.allclose(feats, expect, atol=1e-6)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=400,
        ),
        order=st.integers(min_value=0, max_value=4),
        rice_param=st.integers(min_value=0, max_value=14),
        blocksize=st.sampled_from([16, 48, 64, 100]),
    )
    def test_flac_roundtrip_property(samples, order, rice_param, blocksize):
        """Any int16 signal round-trips bit-exactly through any FIXED
        order / Rice parameter / blocksize combination — the lossless
        contract as a property, not a fixture. Blocks shorter than the
        predictor order fall back to order 0 (warmup needs `order`
        samples). The Rice parameter is floored per frame so the unary
        quotient of a worst-case random-noise residual stays bounded
        (what a real encoder's parameter estimator guarantees; tiny
        params on noise make valid-but-megabit frames)."""
        payload = bytearray(_streaminfo(8000, 16, len(samples)))
        for fno, i in enumerate(range(0, len(samples), blocksize)):
            blk = samples[i : i + blocksize]
            o = order if len(blk) > order else 0
            coefs = _FIXED_COEFS[o]
            residuals = [
                blk[j] - sum(c * blk[j - 1 - k] for k, c in enumerate(coefs))
                for j in range(o, len(blk))
            ]
            maxzig = max((_zigzag(e) for e in residuals), default=0)
            param = min(14, max(rice_param, maxzig.bit_length() - 6))
            payload += _encode_frame(blk, fno % 128, o, param)
        got, rate = decode_flac(bytes(payload))
        assert rate == 8000
        assert got.tolist() == samples

except ImportError:  # pragma: no cover - hypothesis always present here
    pass


def test_flac_24bit_roundtrip_and_feature_scale():
    """24-bit FLAC (the archival shape) round-trips exactly AND the
    feature path normalizes by 2^(bps-1), not a hardcoded 32768 —
    features from a 24-bit encoding of a waveform must match features
    from the 16-bit encoding of the same waveform scaled up 256x."""
    from annotation_service_spark.operators.multimodal import (
        decode_flac_meta,
    )

    x16 = _signal(128, seed=13)
    x24 = [v * 256 for v in x16]  # same waveform at 24-bit scale
    p24 = _encode(x24, blocksize=64, order=2, rice_param=9, bps=24)
    got, rate, bps = decode_flac_meta(p24)
    assert (rate, bps) == (8000, 24)
    assert got.tolist() == x24
    f24 = decode_features(p24, 8, deterministic_fake=False)
    f16 = decode_features(
        _encode(x16, blocksize=64, order=2), 8, deterministic_fake=False
    )
    assert np.allclose(f24, f16, atol=1e-9)
