"""Progressive-JPEG decoder differential tests (T.81 annex G).

The encoder below is an INDEPENDENT in-test implementation of
progressive encoding — spectral-selection scans, successive
approximation (first + refinement passes for DC and AC), EOB-run
batching with buffered correction bits, per-scan canonical Huffman
tables — over the SAME quantized coefficients the baseline test
encoder produces. The decoder under test must recover those
coefficients BYTE-EXACTLY, i.e. a progressive re-coding of a baseline
file decodes to identical planes: the two coding processes are
different entropy orderings of the same integers, so any decoder
drift is a bug, not rounding."""

from __future__ import annotations

import numpy as np
import pytest
from test_multimodal_jpeg import (
    DC_BITS,
    DC_VALS,
    K1_QUANT,
    _BitWriter,
    _encode_jpeg,
    _huff_codes,
    _test_image,
)

from annotation_service_spark.operators import multimodal as mm


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


class _OpSink:
    """Two-pass scan body: record symbol/raw-bit ops, then build a
    flat canonical Huffman table over exactly the symbols used and
    replay into a stuffed bit writer — progressive scans legally
    carry their own DHT, which also exercises between-scan table
    redefinition in the decoder."""

    def __init__(self):
        self.ops: list[tuple] = []

    def sym(self, s: int) -> None:
        self.ops.append(("sym", s))

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append(("bits", v & ((1 << n) - 1), n))

    def table(self) -> tuple[list[int], bytes]:
        syms = sorted({s for op, s, *rest in self.ops if op == "sym"})
        if not syms:
            syms = [0]
        length = 2
        while (1 << length) <= len(syms):
            length += 1
        bits = [0] * 16
        bits[length - 1] = len(syms)
        return bits, bytes(syms)

    def replay(self, codes: dict) -> bytes:
        w = _BitWriter()
        for op in self.ops:
            if op[0] == "sym":
                code, ln = codes[op[1]]
                w.write(code, ln)
            else:
                w.write(op[1], op[2])
        w.flush()
        return bytes(w.out)


class _EobState:
    def __init__(self):
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits tied to the run


def _flush_eobrun(sink: _OpSink, state: _EobState) -> None:
    if state.eobrun:
        rr = state.eobrun.bit_length() - 1
        sink.sym(rr << 4)
        sink.bits(state.eobrun - (1 << rr), rr)
        for b in state.pending:
            sink.bits(b, 1)
        state.eobrun = 0
        state.pending = []


def _ac_first_block(sink, state, zig, ss, se, al):
    vals = []
    for k in range(ss, se + 1):
        v = int(zig[k])
        a = abs(v) >> al
        vals.append(-a if v < 0 else a)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            _flush_eobrun(sink, state)
        return
    _flush_eobrun(sink, state)
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            sink.sym(0xF0)
            r -= 16
        s = abs(v).bit_length()
        sink.sym((r << 4) | s)
        sink.bits(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if last < se - ss:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            _flush_eobrun(sink, state)


def _ac_refine_block(sink, state, zig, ss, se, al):
    """The jcphuff-style refinement pass: corrections for
    already-nonzero coefficients buffer until the next emitted symbol
    (or travel with the EOB run), newly significant values are ±1."""
    absv = [abs(int(zig[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for i, a in enumerate(absv):
        if a == 1:
            eob = ss + i
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        temp = absv[k - ss]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(sink, state)
            sink.sym(0xF0)
            r -= 16
            for b in br:
                sink.bits(b, 1)
            br = []
        if temp > 1:  # significant before this scan: 1 correction bit
            br.append(temp & 1)
            continue
        _flush_eobrun(sink, state)
        sink.sym((r << 4) | 1)
        sink.bits(0 if int(zig[k]) < 0 else 1, 1)
        r = 0
        for b in br:
            sink.bits(b, 1)
        br = []
    if r > 0 or br:
        state.eobrun += 1
        state.pending.extend(br)
        if state.eobrun == 0x7FFF:
            _flush_eobrun(sink, state)


def _encode_progressive(img: np.ndarray, quant: np.ndarray, al: int = 1):
    """Progressive re-coding of the baseline encoder's quantized
    coefficients: DC first (point transform ``al``) → per-component
    AC first scans in two spectral bands → DC refinement → AC
    refinement, each entropy scan preceded by its own DHT."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    _, qblocks = _encode_jpeg(img, quant)  # ground-truth coefficients
    zz = mm._JPEG_ZIGZAG
    bh, bw_ = len(qblocks[0]), len(qblocks[0][0])
    zigs = [
        [[qblocks[c][by][bx].reshape(64)[zz] for bx in range(bw_)] for by in range(bh)]
        for c in range(nc)
    ]

    out = bytearray(b"\xff\xd8")
    zq = quant.reshape(64)[zz].astype(np.uint8)
    out += _seg(0xDB, bytes([0x00]) + bytes(zq))
    sof_comps = b"".join(bytes([c + 1, 0x11, 0]) for c in range(nc))
    out += _seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([nc]) + sof_comps,
    )

    def sos_header(comp_ids, ss, se, ah, al_):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # Td=0, Ta=0
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al_]))

    # --- scan 1: DC first, interleaved over all components ----------
    dc_codes = _huff_codes(DC_BITS, DC_VALS)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + DC_VALS)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, al)
    wtr = _BitWriter()
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw_):
            for c in range(nc):
                v = int(zigs[c][by][bx][0]) >> al  # arithmetic shift
                diff = v - pred[c]
                pred[c] = v
                s = abs(diff).bit_length()
                code, ln = dc_codes[s]
                wtr.write(code, ln)
                if s:
                    wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    out += bytes(wtr.out)

    # --- AC first scans: two bands for comp 1, full band for others -
    ac_first_scans = [(0, 1, 5), (0, 6, 63)] + [
        (c, 1, 63) for c in range(1, nc)
    ]
    for c, ss, se in ac_first_scans:
        sink, state = _OpSink(), _EobState()
        for by in range(bh):
            for bx in range(bw_):
                _ac_first_block(sink, state, zigs[c][by][bx], ss, se, al)
        _flush_eobrun(sink, state)
        bits, vals = sink.table()
        out += _seg(0xC4, bytes([0x10]) + bytes(bits) + vals)
        out += sos_header([c + 1], ss, se, 0, al)
        out += sink.replay(_huff_codes(bits, vals))

    # --- DC refinement: interleaved, raw bits, no Huffman -----------
    for lo in range(al - 1, -1, -1):
        out += sos_header(list(range(1, nc + 1)), 0, 0, lo + 1, lo)
        wtr = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                for c in range(nc):
                    wtr.write((int(zigs[c][by][bx][0]) >> lo) & 1, 1)
        wtr.flush()
        out += bytes(wtr.out)

    # --- AC refinement per component, full band ----------------------
    for lo in range(al - 1, -1, -1):
        for c in range(nc):
            sink, state = _OpSink(), _EobState()
            for by in range(bh):
                for bx in range(bw_):
                    _ac_refine_block(
                        sink, state, zigs[c][by][bx], 1, 63, lo
                    )
            _flush_eobrun(sink, state)
            bits, vals = sink.table()
            out += _seg(0xC4, bytes([0x10]) + bytes(bits) + vals)
            out += sos_header([c + 1], 1, 63, lo + 1, lo)
            out += sink.replay(_huff_codes(bits, vals))

    out += b"\xff\xd9"
    return bytes(out), qblocks


@pytest.mark.parametrize(
    "h,w,nc", [(16, 24, 1), (13, 19, 1), (16, 16, 3), (11, 14, 3)]
)
def test_progressive_coefficients_byte_exact(h, w, nc):
    """Progressive decode == the baseline ground truth, integer for
    integer: spectral bands + two successive-approximation levels
    reassemble the exact coefficients."""
    img = _test_image(h, w, nc)
    payload, qblocks = _encode_progressive(img, K1_QUANT, al=1)
    dw, dh, comps, planes = mm._jpeg_decode_blocks(payload)
    assert (dw, dh) == (w, h)
    assert len(comps) == nc
    for c in range(nc):
        for by in range(len(qblocks[c])):
            for bx in range(len(qblocks[c][0])):
                expect = qblocks[c][by][bx] * K1_QUANT.reshape(8, 8)
                got = planes[c][by, bx]
                assert np.array_equal(got, expect), (c, by, bx)


def test_progressive_two_level_approximation():
    """Al=2 start: two chained refinement scans per coefficient class
    must still reassemble exactly (the buffered-correction-bit path
    runs twice)."""
    img = _test_image(16, 16, 1, seed=9)
    payload, qblocks = _encode_progressive(img, K1_QUANT, al=2)
    _, _, _, planes = mm._jpeg_decode_blocks(payload)
    for by in range(len(qblocks[0])):
        for bx in range(len(qblocks[0][0])):
            expect = qblocks[0][by][bx] * K1_QUANT.reshape(8, 8)
            assert np.array_equal(planes[0][by, bx], expect), (by, bx)


def test_progressive_equals_baseline_pixels():
    """The same image encoded baseline and progressive decodes to the
    SAME pixels — the two processes differ only in entropy layout."""
    img = _test_image(16, 24, 3, seed=3)
    base_payload, _ = _encode_jpeg(img, K1_QUANT)
    prog_payload, _ = _encode_progressive(img, K1_QUANT)
    assert np.array_equal(
        mm.decode_jpeg(base_payload), mm.decode_jpeg(prog_payload)
    )


def test_progressive_dispatch_in_decode_features():
    img = _test_image(16, 16, 1, seed=4)
    prog, _ = _encode_progressive(img, K1_QUANT)
    base, _ = _encode_jpeg(img, K1_QUANT)
    fp = mm.decode_features(prog, 8, deterministic_fake=False)
    fb = mm.decode_features(base, 8, deterministic_fake=False)
    assert np.array_equal(fp, fb)


def test_progressive_truncation_degrades_gracefully():
    """Progressive rendering is the format's point: a stream cut at a
    scan boundary decodes to a valid lower-precision image (the scans
    seen so far), not an error — while a cut before any scan landed
    still raises."""
    img = _test_image(16, 16, 1)
    payload, _ = _encode_progressive(img, K1_QUANT)
    # find the second SOS and cut just before it: only scan 1 (DC
    # first) has landed
    first_sos = payload.index(b"\xff\xda")
    second_sos = payload.index(b"\xff\xda", first_sos + 2)
    partial = mm.decode_jpeg(payload[:second_sos] + b"\xff\xd9")
    full = mm.decode_jpeg(payload)
    assert partial.shape == full.shape
    # DC-only rendering: block means approximate the image, detail absent
    assert partial.dtype == np.uint8
    # cut before ANY scan → no coefficients → error
    with pytest.raises((ValueError, IndexError)):
        mm._jpeg_decode_blocks(payload[:first_sos])


def test_decode_features_survives_corrupt_media_fuzz():
    """The 100 TB robustness contract: decode_features with
    deterministic_fake=True must NEVER raise on corrupt media — a
    corrupt payload lands in the stub, not in a dead Spark task.
    Seeded byte-flip fuzz over baseline JPEG, progressive JPEG, and
    FLAC payloads (this fuzz previously surfaced KeyError /
    OverflowError / ZeroDivisionError escapes from corrupt Huffman
    table ids, runaway DC predictors, and zero sampling factors —
    each now raises ValueError inside the decoder instead)."""
    import random

    from test_multimodal_flac import _encode as _encode_flac
    from test_multimodal_flac import _signal

    img = _test_image(16, 16, 3)
    payloads = [
        _encode_jpeg(img, K1_QUANT)[0],
        _encode_progressive(img, K1_QUANT)[0],
        _encode_flac(_signal(128), blocksize=64),
    ]
    rng = random.Random(5)
    for payload in payloads:
        for _ in range(150):
            b = bytearray(payload)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            out = mm.decode_features(bytes(b), 8, deterministic_fake=True)
            assert out.shape == (8,)
