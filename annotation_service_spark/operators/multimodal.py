"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction / resize / frame-sampling are
Arrow-batched ``mapInPandas`` stages. Three REAL pure-Python codecs
are built in — binary PPM (P6) images, 8-bit non-interlaced PNG, and
PCM WAV audio — dispatched by magic bytes; formats needing external
codec libraries (JPEG, MP3, … not in this environment) fall back to a
STUBBED decode: with
``deterministic_fake=True`` it derives stable pseudo-features from
the bytes (md5-seeded), otherwise it raises NotImplementedError. The
Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is identical for real and stubbed formats; plugging in
PIL/ffmpeg is one more ``_decode_*`` entry.

Scale design: media rows are big (MBs); the decode stage is
``mapInPandas`` so each task streams batches instead of materializing
a partition, and a ``repartition(n)`` before decode spreads hot media
evenly. Feature vectors come out as ``array<float>`` ready for the
similarity operators.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def documents_as_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically wrap a text table as a media table (binary
    payload + typed metadata) so the multimodal pipeline is testable
    with the driver's synthetic data."""
    payload = F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.lit("2|"), "text"))))
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("media"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            ((F.col("n_chars") % 7) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for codecs not available here: md5-seeded
    uniform floats. Real formats (PPM/WAV) never reach this."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(n).astype(np.float32)


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL codec: binary PPM (P6, 8-bit maxval) → uint8 array of
    shape (height, width, 3). Pure Python/numpy, deterministic."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace/comment
    # separated, then exactly one whitespace byte before pixel data
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return img.reshape(height, width, 3)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL codec: PNG, 8-bit depth, non-interlaced (grayscale / RGB /
    palette / gray+alpha / RGBA) → uint8 array (height, width,
    channels); palette images come back expanded to RGB. Pure stdlib
    ``zlib`` + numpy, implementing chunk walk + scanline defiltering
    per the public PNG spec (RFC 2083 §6): filters None/Sub/Up/
    Average/Paeth. Sub and Up defilter vectorized (mod-256 cumsum /
    array add); Average/Paeth are the sequential recurrences the spec
    defines."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat: list[bytes] = []
    pos = 8
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # 4 length + 4 type + data + 4 crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError("only 8-bit PNG supported")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"bad PNG zlib stream: {exc}") from None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("bad PNG pixel-data size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: per-channel-lane running sum mod 256
            cur = (
                np.cumsum(line.reshape(w, channels), axis=0) & 0xFF
            ).reshape(stride)
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential recurrence
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL codec: PCM WAV → (float64 samples in [-1, 1] averaged
    across channels, sample_rate). Stdlib ``wave`` + numpy."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _segment_means(x: np.ndarray, n: int) -> np.ndarray:
    """Mean over n equal segments (deterministic fixed-dim featurize);
    short inputs repeat-pad so every feature is defined."""
    if len(x) == 0:
        return np.zeros(n, dtype=np.float32)
    if len(x) < n:
        x = np.repeat(x, -(-n // len(x)))
    edges = np.linspace(0, len(x), n + 1, dtype=np.int64)
    return np.array(
        [x[a:b].mean() for a, b in zip(edges[:-1], edges[1:])], dtype=np.float32
    )


def decode_features(payload: bytes, n: int, deterministic_fake: bool) -> np.ndarray:
    """Magic-byte dispatch: PPM → grayscale segment means (scaled to
    [0,1]); WAV → waveform segment means; anything else → the
    documented stub (or NotImplementedError).

    Magic bytes are a sniff, not a proof: arbitrary binary payloads
    (2 in 65536) start with ``P6`` by accident. A payload whose
    header parse then fails is treated as NOT that format and falls
    through to the unknown-format branch — same skip-don't-kill
    semantics as the corrupt-archive error budget in
    ``sources/zipcsv.py`` (a truncated real file lands in the stub
    rather than failing the whole task)."""
    if payload[:2] == b"P6":
        try:
            img = decode_ppm(payload)
            gray = img.astype(np.float64).mean(axis=2).ravel() / 255.0
            return _segment_means(gray, n)
        except (ValueError, IndexError):
            pass  # magic collision or corrupt PPM → unknown format
    if payload[:8] == _PNG_MAGIC:
        try:
            img = decode_png(payload)
            if img.shape[2] in (2, 4):  # drop the alpha channel
                img = img[:, :, :-1]
            gray = img.astype(np.float64).mean(axis=2).ravel() / 255.0
            return _segment_means(gray, n)
        except (ValueError, IndexError, OSError):
            pass  # magic collision, corrupt, or unsupported PNG → unknown
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            x, _rate = decode_wav(payload)
            return _segment_means(x, n)
        except Exception:  # wave.Error subclasses Exception directly
            pass  # magic collision or corrupt WAV → unknown format
    if not deterministic_fake:
        raise NotImplementedError(
            "no built-in codec for this format and real media codec "
            "libraries are not available in this environment; pass "
            "deterministic_fake=True or plug a decoder into "
            "decode_features"
        )
    return _fake_decode(payload, n)


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    feature_dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode + featurize each media blob → (id, features
    array<float>, n_bytes). Real Arrow batch plumbing; real codecs
    for PPM/WAV, stub for everything else (see module docstring)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            feats = [
                decode_features(bytes(b), feature_dim, deterministic_fake).tolist()
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "features": feats,
                    "n_bytes": [len(bytes(b)) for b in pdf[media_col]],
                }
            )

    return media.select(id_col, media_col).mapInPandas(run, out_schema)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling: one row per sampled frame index —
    pure built-in sequence/explode, no decode needed for the index
    plan (decode happens per-frame downstream)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize PLANNING (the aspect-preserving target geometry) as pure
    column math; the pixel resample itself lives behind the decode
    stub."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return media.withColumn(
        "resize_target",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
        ),
    )
