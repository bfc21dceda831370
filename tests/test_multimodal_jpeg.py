"""Baseline-JPEG decoder differential tests.

The encoder below is an INDEPENDENT in-test implementation of
baseline JPEG encoding (T.81 Annex K tables, forward DCT, quantize,
canonical Huffman, byte stuffing). The decoder under test
(operators/multimodal.py decode_jpeg) must recover:

1. the quantized coefficients BYTE-EXACTLY (integer equality of the
   dequantized blocks — no rounding ambiguity exists at that layer),
2. pixels within the quantization-error bound (JPEG is lossy, but
   the loss is bounded by the quant tables, not by decoder bugs).
"""

from __future__ import annotations

import numpy as np
import pytest

from annotation_service_spark.operators import multimodal as mm

# T.81 Annex K.1 luminance quantization table (natural order, row major)
K1_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3: standard luminance DC Huffman (bits, values)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = bytes(range(12))
# T.81 Annex K.3: standard luminance AC Huffman
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)


def _huff_codes(bits, vals):
    """Canonical Huffman: value -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:  # pad with 1-bits per T.81 F.1.2.3
            self.write(1, 1)


def _dct2(block: np.ndarray) -> np.ndarray:
    a = mm._dct_basis()
    return a @ block @ a.T


def _encode_jpeg(img: np.ndarray, quant: np.ndarray) -> tuple[bytes, list]:
    """Independent baseline JPEG encoder: grayscale (h, w) or YCbCr
    4:4:4 (h, w, 3), one shared quant/Huffman table set. Returns
    (payload, quantized_blocks) where quantized_blocks[c][by][bx] is
    the int64 quantized coefficient block (natural order) — the
    ground truth the decoder must reproduce exactly after its own
    dequantize (decoder blocks == these * quant)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_codes = _huff_codes(DC_BITS, DC_VALS)
    ac_codes = _huff_codes(AC_BITS, AC_VALS)
    zz = mm._JPEG_ZIGZAG

    bw = _BitWriter()
    pred = [0] * nc
    qblocks = [
        [[None] * (pw // 8) for _ in range(ph // 8)] for _ in range(nc)
    ]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(nc):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                coef = _dct2(blk.astype(np.float64) - 128.0)
                q = np.round(coef / quant.reshape(8, 8)).astype(np.int64)
                qblocks[c][by][bx] = q
                zig = q.reshape(64)[zz]

                def emit(v: int, size_prefix: int, codes):
                    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
                    sym = (size_prefix << 4) | s if codes is ac_codes else s
                    code, ln = codes[sym]
                    bw.write(code, ln)
                    if s:
                        bw.write(v if v > 0 else v + (1 << s) - 1, s)

                emit(int(zig[0]) - pred[c], 0, dc_codes)
                pred[c] = int(zig[0])
                k, run = 1, 0
                last_nz = max(
                    (i for i in range(1, 64) if zig[i]), default=0
                )
                while k <= last_nz:
                    if zig[k] == 0:
                        run += 1
                        if run == 16:
                            code, ln = ac_codes[0xF0]  # ZRL
                            bw.write(code, ln)
                            run = 0
                    else:
                        emit(int(zig[k]), run, ac_codes)
                        run = 0
                    k += 1
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_quant = quant.reshape(64)[zz].astype(np.uint8)
    dqt = seg(0xDB, bytes([0x00]) + bytes(zz_quant))
    sof_comps = b"".join(
        bytes([c + 1, 0x11, 0]) for c in range(nc)
    )
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([nc]) + sof_comps,
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_BITS) + DC_VALS
        + bytes([0x10]) + bytes(AC_BITS) + AC_VALS,
    )
    sos_comps = b"".join(bytes([c + 1, 0x00]) for c in range(nc))
    sos = seg(0xDA, bytes([nc]) + sos_comps + bytes([0, 63, 0]))
    payload = (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )
    return payload, qblocks


def _test_image(h: int, w: int, nc: int, seed: int = 5) -> np.ndarray:
    """Smooth gradient + deterministic texture (smoothness keeps the
    quantization round-trip error small and realistic)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
    out = np.stack(
        [
            np.clip(base + rng.randint(-8, 9, (h, w)) + 20 * c, 0, 255)
            for c in range(nc)
        ],
        axis=2,
    ).astype(np.uint8)
    return out[:, :, 0] if nc == 1 else out


@pytest.mark.parametrize("h,w,nc", [(16, 24, 1), (13, 19, 1), (16, 16, 3), (11, 14, 3)])
def test_jpeg_coefficients_byte_exact(h, w, nc):
    """Decoder's dequantized blocks == encoder's quantized blocks *
    quant, integer-for-integer — the lossless layer of the codec."""
    img = _test_image(h, w, nc)
    payload, qblocks = _encode_jpeg(img, K1_QUANT)
    dw, dh, comps, planes = mm._jpeg_decode_blocks(payload)
    assert (dw, dh) == (w, h)
    assert len(comps) == nc
    for c in range(nc):
        for by in range(len(qblocks[c])):
            for bx in range(len(qblocks[c][0])):
                expect = qblocks[c][by][bx] * K1_QUANT.reshape(8, 8)
                got = planes[c][by, bx]
                assert np.array_equal(got, expect), (c, by, bx)


@pytest.mark.parametrize("h,w,nc", [(16, 24, 1), (16, 16, 3)])
def test_jpeg_pixel_roundtrip_bounded(h, w, nc):
    """Decoded pixels differ from the source only by quantization
    error. With the K.1 table on a smooth image the luma error stays
    small; assert a conservative bound plus exact shape/dtype."""
    img = _test_image(h, w, nc)
    payload, _ = _encode_jpeg(img, K1_QUANT)
    out = mm.decode_jpeg(payload)
    assert out.shape == (h, w, 3 if nc == 3 else 1)
    assert out.dtype == np.uint8
    if nc == 1:
        err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    else:
        # encoder treated the 3 channels as YCbCr; decoder converts
        # to RGB — convert the source the same way for comparison
        y, cb, cr = (img[:, :, i].astype(np.float64) for i in range(3))
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        ref = np.clip(np.round(np.stack([r, g, b], 2)), 0, 255)
        err = np.abs(out.astype(int) - ref.astype(int))
    assert err.mean() < 8 and err.max() < 64, (err.mean(), err.max())


def test_jpeg_flat_image_zero_error():
    """A flat image quantizes with zero loss (only the DC term, which
    the K.1 table divides by 16 — a multiple-of-16 level survives
    exactly), so decode must be bit-perfect."""
    img = np.full((8, 8), 160, np.uint8)
    payload, _ = _encode_jpeg(img, K1_QUANT)
    out = mm.decode_jpeg(payload)
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_dispatch_in_decode_features():
    """decode_features routes JPEG magic to the real codec: identical
    images → identical features; different images → different
    features (not the md5 fake path, which would differ for any byte
    change including recompression)."""
    img = _test_image(16, 16, 1)
    p1, _ = _encode_jpeg(img, K1_QUANT)
    p2, _ = _encode_jpeg(img, K1_QUANT)
    f1 = mm.decode_features(p1, 8, deterministic_fake=False)
    f2 = mm.decode_features(p2, 8, deterministic_fake=False)
    assert np.array_equal(f1, f2)
    gray = img.astype(np.float64).ravel() / 255.0
    approx = mm._segment_means(gray, 8)
    assert np.abs(f1 - approx).max() < 0.05  # real decode, near source


def test_jpeg_mislabeled_progressive_rejected():
    """A baseline stream whose SOF marker is flipped to SOF2 is
    CORRUPT, not progressive (its single scan claims the full 0-63
    band for a DC-class scan): the progressive path must raise
    ValueError — real progressive streams are covered by
    test_multimodal_progressive.py."""
    img = _test_image(8, 8, 1)
    payload, _ = _encode_jpeg(img, K1_QUANT)
    bad = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        mm.decode_jpeg(bad)


def test_jpeg_partial_component_scan_rejected():
    """A baseline SOS covering only a subset of the SOF components
    (multi-scan sequential) must raise ValueError — the guard that
    routes it to decode_features' fallback instead of a KeyError that
    would kill the Spark task (round-8 review regression fix)."""
    img = _test_image(16, 16, 3)
    payload, _ = _encode_jpeg(img, K1_QUANT)
    i = payload.index(b"\xff\xda")
    seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
    body = payload[i + 4 : i + 2 + seglen]
    ns = body[0]
    assert ns == 3
    new_body = bytes([1]) + body[1:3] + body[1 + 2 * ns :]
    new_seg = (
        b"\xff\xda" + (len(new_body) + 2).to_bytes(2, "big") + new_body
    )
    bad = payload[:i] + new_seg + payload[i + 2 + seglen :]
    with pytest.raises(ValueError, match="multi-scan baseline"):
        mm._jpeg_decode_blocks(bad)


def _ppm_bytes(arr):
    import numpy as np

    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _gradient_img(seed, h=48, w=64, noise=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    # the base STRUCTURE must depend on the seed (an early version
    # seeded only the noise, so every "different" image was identical)
    base = (
        (x * (11 + 3 * seed) / w * 23 + y * (5 + 7 * seed) / h * 31) % 256
    ).astype(np.int64)
    img = np.stack([base, (base * 2) % 256, (255 - base) % 256], axis=2)
    if noise:
        img = img + rng.randint(-noise, noise + 1, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_phash_structural_properties():
    """phash63: identical image -> hamming 0; mildly-noised version
    of the same structure -> small hamming; structurally unrelated
    images -> near the 31-bit expectation; always 63-bit balanced."""
    from annotation_service_spark.operators import multimodal as mm

    a = mm.phash63(_gradient_img(1))
    a2 = mm.phash63(_gradient_img(1))
    near = mm.phash63(_gradient_img(1, noise=6))
    import numpy as np

    rng = np.random.RandomState(9)
    unrelated = mm.phash63(rng.randint(0, 256, (48, 64, 3)).astype(np.uint8))
    assert a == a2
    assert a < 1 << 63 and a >= 0
    assert bin(a).count("1") in (31, 32)  # median split balance
    d_near = bin(a ^ near).count("1")
    d_far = bin(a ^ unrelated).count("1")
    assert d_near <= 6, d_near
    assert d_far >= 18, d_far
    # grayscale path and resize invariance of structure
    g = mm.phash63(_gradient_img(1)[:, :, 0])
    assert isinstance(g, int)


def test_image_phash_pairs_pipeline(spark):
    """End-to-end perceptual dedup through Spark: planted noised
    twins pair up within the guaranteed hamming radius, unrelated
    images do not, and undecodable payloads are skipped (not crashed,
    and their sh=0 rows never collide into fake pairs)."""
    import numpy as np

    from annotation_service_spark.operators import multimodal as mm

    rows = []
    for i in range(8):
        rows.append((i, bytearray(_ppm_bytes(_gradient_img(i)))))
    # noised twins of 0 and 3
    rows.append((100, bytearray(_ppm_bytes(_gradient_img(0, noise=5)))))
    rows.append((103, bytearray(_ppm_bytes(_gradient_img(3, noise=5)))))
    # unrelated random images + undecodable junk
    rng = np.random.RandomState(77)
    for j in range(4):
        rows.append(
            (200 + j, bytearray(_ppm_bytes(rng.randint(0, 256, (40, 40, 3)))))
        )
    rows.append((300, bytearray(b"not an image at all")))
    rows.append((301, bytearray(b"junk junk junk")))
    df = spark.createDataFrame(rows, "media_id long, media binary")

    tbl = {r.id: (r.sh, r.decoded) for r in mm.image_phash_table(df).collect()}
    assert not tbl[300][1] and not tbl[301][1]
    assert all(tbl[i][1] for i in range(8))

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.image_phash_pairs(df, max_hamming=6).collect()
    }
    assert (0, 100) in pairs and (3, 103) in pairs
    assert all(a != 300 and a != 301 and b != 300 and b != 301 for a, b in pairs)
    # python-side differential: every reported pair's hamming matches
    # the phash63 recomputation
    for (a, b), hm in pairs.items():
        assert bin(tbl[a][0] ^ tbl[b][0]).count("1") == hm


def test_video_near_dup_pairs(spark):
    """Video near-dup over frame pHash band-key sets: a noised
    re-encode pairs with its original near jaccard 1.0; a video
    sharing half its frames scores ~the shared fraction; unrelated
    videos never pair; undecodable frames are skipped not fatal."""
    import numpy as np

    from annotation_service_spark.operators import multimodal as mm

    def frames(seed_list, noise=0):
        return [bytearray(_ppm_bytes(_gradient_img(s, noise=noise))) for s in seed_list]

    rows = [
        (1, frames([0, 1, 2, 3, 4, 5])),
        (2, frames([0, 1, 2, 3, 4, 5], noise=4)),       # noised re-encode of 1
        (6, frames([0, 1, 2, 3, 4, 5])),                # exact copy of 1
        (3, frames([0, 1, 2, 30, 31, 32])),             # shares half of 1's scenes
        (4, frames([40, 41, 42, 43, 44, 45])),          # unrelated
        (5, frames([50, 51]) + [bytearray(b"junk frame")]),  # partial junk
    ]
    df = spark.createDataFrame(rows, "media_id long, frames array<binary>")
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in mm.video_near_dup_pairs(df, threshold=0.05).collect()
    }
    assert pairs[(1, 6)] == 1.0                          # exact copy
    assert pairs[(1, 2)] >= 0.4, pairs.get((1, 2))       # noised re-encode
    assert 0.2 <= pairs[(1, 3)] <= 0.5, pairs.get((1, 3))  # scene subset
    assert pairs[(1, 2)] > pairs[(1, 3)]                 # graded ordering
    assert (1, 4) not in pairs and (2, 4) not in pairs   # unrelated
    assert all(5 not in p or pairs[p] < 0.2 for p in pairs)
    # frame sampling: every_n=2 halves the feature set but keeps the
    # exact-copy and re-encode pairs
    sampled = {
        (r.id_a, r.id_b): r.jaccard
        for r in mm.video_near_dup_pairs(df, every_n=2, threshold=0.3).collect()
    }
    assert (1, 6) in sampled and (1, 2) in sampled
