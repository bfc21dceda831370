"""MP4 (ISO-BMFF) MJPEG container demux differential tests.

The muxer below is an INDEPENDENT in-test implementation of the
ISO-BMFF layout (ISO/IEC 14496-12, public): ftyp, mdat carrying the
raw JPEG samples, and a moov with one video trak whose stbl holds the
four sample tables the demuxer needs (stsd codec entry, stsz sizes,
stsc sample→chunk runs, stco/co64 chunk offsets). The demuxer under
test (operators/multimodal.py demux_mp4_mjpeg) must recover the
sample payloads byte-exactly through any chunking, splice the T.81
Annex K.3 Huffman tables into DHT-stripped frames, raise on
structural damage, and recognize-and-decline non-JPEG codecs by
name. ``demux_video_mjpeg`` / ``video_frames_table`` sniffing over
both containers is covered at the end.
"""

from __future__ import annotations

import numpy as np
import pytest

from annotation_service_spark.operators import multimodal as mm
from tests.test_multimodal_avi import _frames, _strip_dht, mux_avi
from tests.test_multimodal_jpeg import K1_QUANT, _encode_jpeg, _test_image


def _box(btype: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + btype + body


def _u32(v: int) -> bytes:
    return v.to_bytes(4, "big")


def _full(version_flags: int = 0) -> bytes:
    return _u32(version_flags)


def _stsc_runs(chunks: list[int]) -> list[tuple[int, int]]:
    """Compress a per-chunk sample-count list into (first_chunk,
    samples_per_chunk) runs, 1-based."""
    runs: list[tuple[int, int]] = []
    for i, spc in enumerate(chunks, start=1):
        if not runs or runs[-1][1] != spc:
            runs.append((i, spc))
    return runs


def mux_mp4(
    frames: list[bytes],
    codec: bytes = b"jpeg",
    chunks: list[int] | None = None,
    use_co64: bool = False,
    faststart: bool = False,
    audio_track_first: bool = False,
    second_codec: bytes | None = None,
) -> bytes:
    """Minimal spec-shaped MP4: ftyp, mdat of concatenated samples,
    moov(mvhd, trak(tkhd, mdia(mdhd, hdlr 'vide', minf(vmhd,
    stbl(stsd/stts/stsc/stsz/stco))))). ``chunks`` is the per-chunk
    sample count layout (default: everything in one chunk);
    ``faststart`` puts moov before mdat (absolute offsets still
    correct — computed in a second pass); ``audio_track_first``
    prepends a 'soun' trak, exercising track selection."""
    if chunks is None:
        chunks = [len(frames)]
    assert sum(chunks) == len(frames)

    ftyp = _box(b"ftyp", b"isom" + _u32(0x200) + b"isomiso2mp41")
    mdat_body = b"".join(frames)

    def build_moov(chunk_offsets: list[int]) -> bytes:
        # VisualSampleEntry: 6 reserved + data_reference_index, then
        # 70 bytes of predefined/width/height/dpi/frame-count/name/
        # depth fields the demuxer ignores.
        entry = _box(codec, b"\x00" * 6 + (1).to_bytes(2, "big") + b"\x00" * 70)
        if second_codec is not None:
            entry += _box(
                second_codec,
                b"\x00" * 6 + (1).to_bytes(2, "big") + b"\x00" * 70,
            )
        stsd = _box(
            b"stsd",
            _full() + _u32(2 if second_codec is not None else 1) + entry,
        )
        stts = _box(b"stts", _full() + _u32(1) + _u32(len(frames)) + _u32(100))
        runs = _stsc_runs(chunks)
        stsc = _box(
            b"stsc",
            _full() + _u32(len(runs))
            + b"".join(_u32(fc) + _u32(spc) + _u32(1) for fc, spc in runs),
        )
        stsz = _box(
            b"stsz",
            _full() + _u32(0) + _u32(len(frames))
            + b"".join(_u32(len(f)) for f in frames),
        )
        if use_co64:
            co = _box(
                b"co64",
                _full() + _u32(len(chunk_offsets))
                + b"".join(o.to_bytes(8, "big") for o in chunk_offsets),
            )
        else:
            co = _box(
                b"stco",
                _full() + _u32(len(chunk_offsets))
                + b"".join(_u32(o) for o in chunk_offsets),
            )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + co)
        vmhd = _box(b"vmhd", _u32(1) + b"\x00" * 8)
        minf = _box(b"minf", vmhd + stbl)
        hdlr = _box(
            b"hdlr", _full() + _u32(0) + b"vide" + b"\x00" * 12 + b"Video\x00"
        )
        mdhd = _box(b"mdhd", _full() + _u32(0) * 3 + _u32(1000) + _u32(0))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _box(b"tkhd", _u32(7) + b"\x00" * 80)
        trak = _box(b"trak", tkhd + mdia)
        traks = trak
        if audio_track_first:
            a_hdlr = _box(
                b"hdlr", _full() + _u32(0) + b"soun" + b"\x00" * 12 + b"Audio\x00"
            )
            a_mdia = _box(b"mdia", mdhd + a_hdlr)
            traks = _box(b"trak", tkhd + a_mdia) + traks
        mvhd = _box(b"mvhd", _full() + _u32(0) * 3 + _u32(1000) + _u32(0) * 20)
        return _box(b"moov", mvhd + traks)

    def offsets_from(mdat_payload_start: int) -> list[int]:
        offs, pos, i = [], mdat_payload_start, 0
        for spc in chunks:
            offs.append(pos)
            for _ in range(spc):
                pos += len(frames[i])
                i += 1
        return offs

    if faststart:
        # moov size is offset-independent (fixed-width fields), so a
        # dummy-offset pass measures it, then the real offsets follow.
        probe = build_moov(offsets_from(0))
        start = len(ftyp) + len(probe) + 8
        moov = build_moov(offsets_from(start))
        assert len(moov) == len(probe)
        return ftyp + moov + _box(b"mdat", mdat_body)
    start = len(ftyp) + 8
    return ftyp + _box(b"mdat", mdat_body) + build_moov(offsets_from(start))


def test_mp4_roundtrip_byte_exact():
    frames = _frames(4)
    assert mm.demux_mp4_mjpeg(mux_mp4(frames)) == frames


def test_mp4_multi_chunk_layouts():
    frames = _frames(6)
    for chunks in ([2, 2, 2], [1, 3, 2], [6], [1] * 6):
        assert mm.demux_mp4_mjpeg(mux_mp4(frames, chunks=chunks)) == frames


def test_mp4_co64_and_faststart():
    frames = _frames(3)
    assert mm.demux_mp4_mjpeg(mux_mp4(frames, use_co64=True)) == frames
    assert mm.demux_mp4_mjpeg(mux_mp4(frames, faststart=True)) == frames
    assert (
        mm.demux_mp4_mjpeg(mux_mp4(frames, faststart=True, use_co64=True))
        == frames
    )


def test_mp4_audio_track_first_selects_video():
    frames = _frames(2)
    assert mm.demux_mp4_mjpeg(mux_mp4(frames, audio_track_first=True)) == frames


def test_mp4_missing_dht_spliced_and_decodes_identically():
    full = _frames(2)
    stripped = [_strip_dht(f) for f in full]
    out = mm.demux_mp4_mjpeg(mux_mp4(stripped))
    for orig, got in zip(full, out):
        assert b"\xff\xc4" in got
        np.testing.assert_array_equal(
            mm.decode_jpeg(orig), mm.decode_jpeg(got)
        )


def test_mp4_foreign_codec_declined_by_name():
    with pytest.raises(NotImplementedError, match="avc1"):
        mm.demux_mp4_mjpeg(mux_mp4(_frames(1), codec=b"avc1"))


def test_mp4_truncation_and_junk_raise():
    mp4 = mux_mp4(_frames(2))
    with pytest.raises(ValueError):
        mm.demux_mp4_mjpeg(mp4[: len(mp4) // 2])
    with pytest.raises(ValueError):
        mm.demux_mp4_mjpeg(b"\x00\x00\x00\x0cftypisom")  # no moov
    with pytest.raises(ValueError):
        mm.demux_mp4_mjpeg(b"not a container at all")


def test_mp4_corrupt_sample_skipped_per_frame():
    """One garbage sample reduces coverage by one frame — it doesn't
    discard the container (skip-don't-kill at frame granularity)."""
    frames = _frames(3)
    out = mm.demux_mp4_mjpeg(
        mux_mp4([frames[0], b"\x00" * 40, frames[2]])
    )
    assert out == [frames[0], frames[2]]


def test_avi_corrupt_frame_skipped_per_frame():
    """AVI regression for the same contract (ADVICE r11: one bad
    frame used to raise out of walk_movi and drop the whole video)."""
    frames = _frames(3)
    avi = mux_avi([frames[0], b"\xff\xd8garbage-no-sos", frames[2]], 16, 16)
    assert mm.demux_avi_mjpeg(avi) == [frames[0], frames[2]]


def test_mjpeg_ensure_dht_tolerates_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; the splice walk must skip them, not mis-read a length."""
    full = _frames(1)[0]
    stripped = _strip_dht(full)
    padded = stripped[:2] + b"\xff\xff\xff" + stripped[2:]
    got = mm.mjpeg_ensure_dht(padded)
    assert b"\xff\xc4" in got
    np.testing.assert_array_equal(mm.decode_jpeg(full), mm.decode_jpeg(got))


def test_demux_video_sniffs_both_containers():
    frames = _frames(2)
    assert mm.demux_video_mjpeg(mux_mp4(frames)) == frames
    assert mm.demux_video_mjpeg(mux_avi(frames, 16, 16)) == frames
    with pytest.raises(ValueError):
        mm.demux_video_mjpeg(b"\x89PNG\r\n\x1a\n not a video")


def test_video_frames_table_mixed_containers_and_string_ids(spark):
    """video_frames_table over a mixed AVI+MP4+junk corpus with a
    STRING id column (ADVICE r11: the table used to hardcode
    'media_id long' and die in Arrow on any other id schema). Junk
    and foreign-codec rows are skipped, both container formats land
    with identical frame arrays, and the id keeps the caller's
    name/type."""
    frames = _frames(3)
    rows = [
        ("avi-1", mux_avi(frames, 16, 16)),
        ("mp4-1", mux_mp4(frames)),
        ("junk", b"\x00garbage" * 8),
        ("foreign", mux_mp4(frames[:1], codec=b"avc1")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, payload binary")
    out = {
        r["clip_id"]: [bytes(f) for f in r["frames"]]
        for r in mm.video_frames_table(
            df, id_col="clip_id", media_col="payload"
        ).collect()
    }
    assert set(out) == {"avi-1", "mp4-1"}
    assert out["avi-1"] == frames
    assert out["mp4-1"] == frames


def test_mp4_mixed_stsd_entries_declined_by_name():
    """ADVICE r12: a track whose stsd holds MIXED codec entries (first
    jpeg, later avc1) must decline the foreign codec by name — stsc's
    sample_description_index can route later samples to the later
    entry, so decoding everything as MJPEG would be silently wrong."""
    frames = _frames(2)
    mixed = mux_mp4(frames, second_codec=b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        mm.demux_mp4_mjpeg(mixed)
    # two MJPEG-family entries are fine — all samples decode the same way
    ok = mux_mp4(frames, second_codec=b"mjpa")
    assert mm.demux_mp4_mjpeg(ok) == frames


def test_mp4_demux_fuzz_never_hangs_or_miscategorizes():
    """Random corruptions/truncations of a valid MP4 must either
    demux to valid JPEG-prefixed frames or raise cleanly — never
    hang, never return garbage (same contract as the AVI fuzz)."""
    import random

    rng = random.Random(11)
    base = mux_mp4(_frames(3), chunks=[1, 2])
    for trial in range(300):
        buf = bytearray(base)
        if trial % 3 == 0:
            del buf[rng.randrange(1, len(buf)) :]
        elif trial % 3 == 1:
            i = rng.randrange(len(buf))
            buf[i] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(0, len(buf) - 4)
            buf[i : i + 4] = rng.randbytes(4)
        try:
            out = mm.demux_mp4_mjpeg(bytes(buf))
        except (ValueError, NotImplementedError, IndexError, OverflowError):
            continue
        assert isinstance(out, list)
        for f in out:
            assert f[:2] == b"\xff\xd8"


def mux_fmp4(
    fragments: list[list[bytes]],
    codec: bytes = b"jpeg",
    per_sample_sizes: bool = True,
    tfhd_default_size: bool = False,
) -> bytes:
    """Minimal spec-shaped FRAGMENTED MP4 (ISO 14496-12 §8.8): ftyp,
    moov with EMPTY sample tables + mvex/trex fragment defaults, then
    one (moof + mdat) pair per fragment. tfhd uses the
    default-base-is-moof convention (flag 0x20000); trun carries an
    explicit data_offset from the moof's first byte. With
    ``per_sample_sizes=False`` every sample in a fragment must be the
    same length and the size travels in the tfhd default (or, with
    ``tfhd_default_size=False`` too, in trex)."""
    track_id = 1
    ftyp = _box(b"ftyp", b"iso5" + _u32(0x200) + b"iso5dash")

    entry = _box(codec, b"\x00" * 6 + (1).to_bytes(2, "big") + b"\x00" * 70)
    stsd = _box(b"stsd", _full() + _u32(1) + entry)
    stts = _box(b"stts", _full() + _u32(0))
    stsc = _box(b"stsc", _full() + _u32(0))
    stsz = _box(b"stsz", _full() + _u32(0) + _u32(0))
    stco = _box(b"stco", _full() + _u32(0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _box(b"vmhd", _u32(1) + b"\x00" * 8)
    minf = _box(b"minf", vmhd + stbl)
    hdlr = _box(b"hdlr", _full() + _u32(0) + b"vide" + b"\x00" * 12 + b"V\x00")
    mdhd = _box(b"mdhd", _full() + _u32(0) * 3 + _u32(1000) + _u32(0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    # tkhd v0: ctime(4) mtime(4) track_ID(4) reserved...
    tkhd = _box(
        b"tkhd", _u32(7) + _u32(0) * 2 + _u32(track_id) + b"\x00" * 68
    )
    trak = _box(b"trak", tkhd + mdia)
    trex_size = (
        len(fragments[0][0]) if not per_sample_sizes and not tfhd_default_size
        else 0
    )
    trex = _box(
        b"trex",
        _full() + _u32(track_id) + _u32(1) + _u32(100) + _u32(trex_size)
        + _u32(0),
    )
    mvex = _box(b"mvex", trex)
    mvhd = _box(b"mvhd", _full() + _u32(0) * 3 + _u32(1000) + _u32(0) * 20)
    moov = _box(b"moov", mvhd + trak + mvex)

    out = ftyp + moov
    for seq, frames in enumerate(fragments, start=1):
        if not per_sample_sizes:
            assert len({len(f) for f in frames}) == 1

        def build_moof(data_offset: int) -> bytes:
            mfhd = _box(b"mfhd", _full() + _u32(seq))
            tf_flags = 0x20000 | (0x10 if tfhd_default_size else 0)
            tfhd_body = _u32(tf_flags) + _u32(track_id)
            if tfhd_default_size:
                tfhd_body += _u32(len(frames[0]))
            tfhd = _box(b"tfhd", tfhd_body)
            tfdt = _box(b"tfdt", _full() + _u32(0))
            tr_flags = 0x1 | (0x200 if per_sample_sizes else 0)
            trun_body = _u32(tr_flags) + _u32(len(frames))
            trun_body += data_offset.to_bytes(4, "big", signed=True)
            if per_sample_sizes:
                trun_body += b"".join(_u32(len(f)) for f in frames)
            trun = _box(b"trun", trun_body)
            traf = _box(b"traf", tfhd + tfdt + trun)
            return _box(b"moof", mfhd + traf)

        probe = build_moof(0)
        moof = build_moof(len(probe) + 8)  # mdat payload from moof start
        assert len(moof) == len(probe)
        out += moof + _box(b"mdat", b"".join(frames))
    return out


def test_fmp4_multi_fragment_roundtrip():
    frames = _frames(6)
    fmp4 = mux_fmp4([frames[:2], frames[2:5], frames[5:]])
    assert mm.demux_mp4_mjpeg(fmp4) == frames


def test_fmp4_default_size_paths():
    # all samples equal length: sizes via tfhd default, then via trex
    f = _frames(1)[0]
    frames = [f, f, f, f]
    for kwargs in (
        {"per_sample_sizes": False, "tfhd_default_size": True},
        {"per_sample_sizes": False, "tfhd_default_size": False},
    ):
        fmp4 = mux_fmp4([frames[:2], frames[2:]], **kwargs)
        assert mm.demux_mp4_mjpeg(fmp4) == frames


def test_fmp4_dht_splice_and_corrupt_sample_skip():
    full = _frames(3)
    stripped = [_strip_dht(x) for x in full]
    out = mm.demux_mp4_mjpeg(
        mux_fmp4([[stripped[0], b"\x00" * 32], [stripped[2]]])
    )
    assert len(out) == 2
    import numpy as np

    np.testing.assert_array_equal(
        mm.decode_jpeg(full[0]), mm.decode_jpeg(out[0])
    )


def test_fmp4_init_segment_returns_no_frames():
    """An init segment (moov with empty tables, no moofs) is a valid
    zero-sample video, not an error."""
    fmp4 = mux_fmp4([_frames(1)])
    # cut after moov: find the first moof and truncate cleanly before it
    i = fmp4.find(b"moof") - 4
    assert mm.demux_mp4_mjpeg(fmp4[:i]) == []


def test_fmp4_foreign_codec_declined():
    with pytest.raises(NotImplementedError, match="avc1"):
        mm.demux_mp4_mjpeg(mux_fmp4([_frames(1)], codec=b"avc1"))


def test_fmp4_fuzz_never_hangs_or_miscategorizes():
    import random

    rng = random.Random(13)
    base = mux_fmp4([_frames(2), _frames(2, seed0=9)])
    for trial in range(300):
        buf = bytearray(base)
        if trial % 3 == 0:
            del buf[rng.randrange(1, len(buf)) :]
        elif trial % 3 == 1:
            i = rng.randrange(len(buf))
            buf[i] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(0, len(buf) - 4)
            buf[i : i + 4] = rng.randbytes(4)
        try:
            out = mm.demux_mp4_mjpeg(bytes(buf))
        except (ValueError, NotImplementedError, IndexError, OverflowError):
            continue
        assert isinstance(out, list)
        for f in out:
            assert f[:2] == b"\xff\xd8"
