"""Dedup / similarity / text / multimodal operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from annotation_service_spark.functions import text as txt
from annotation_service_spark.operators import dedup as dd
from annotation_service_spark.operators import multimodal as mm
from annotation_service_spark.operators import similarity as sim

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different content about spark query engines and joins"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "short text"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact(spark, docs_df):
    out = dd.dedup_exact(docs_df)
    rows = out.collect()
    assert len(rows) == 4  # 5 docs, one exact dup collapses
    dup = [r for r in rows if r.n_copies == 2][0]
    assert dup.keep_id == 1


def test_ngram_jaccard_finds_near_dup(spark, docs_df):
    pairs = dd.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got       # near-dup pair
    assert (1, 4) in got       # exact dup pair (jaccard 1.0)
    assert (2, 4) in got
    assert all(3 not in p for p in got)
    exact = [r for r in pairs if (r.id_a, r.id_b) == (1, 4)][0]
    assert exact.jaccard == 1.0


def test_minhash_lsh_agrees_with_exact(spark, docs_df):
    """Differential: LSH candidates that verify ≥ threshold must be a
    subset of exact pairs; with these few docs, recall is total."""
    exact = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    }
    assert lsh == exact


def test_simhash_near_dup(spark, docs_df):
    """The 60-bit default contract: 4 bands × 15-bit keys with
    hamming-1 probing guarantees detection of every pair with total
    hamming ≤ 4·2−1 = 7 (pigeonhole); the planted one-word edit
    (1,2) lands at hamming 7 — exactly at the guaranteed radius."""
    pairs = dd.simhash_pairs(docs_df).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got[(1, 4)] == 0  # identical text → identical simhash
    assert (1, 2) in got     # near-dup within the scaled hamming budget
    assert got[(1, 2)] <= 7
    assert all(3 not in p for p in got)  # unrelated doc never pairs
    sigs = docs_df.select(dd.simhash(F.col("text")).alias("s")).collect()
    assert all(0 <= r.s < 2**60 for r in sigs if r.s is not None)
    # doc 5 has <3 words → no features → NULL fingerprint
    assert sum(1 for r in sigs if r.s is None) == 1
    # column-expression form agrees with the scalable table form
    tbl = {r.id: r.sh for r in dd.simhash_table(docs_df).collect()}
    col = {
        r.doc_id: r.s
        for r in docs_df.select(
            "doc_id", dd.simhash(F.col("text")).alias("s")
        ).collect()
        if r.s is not None
    }
    assert col == tbl


def test_simhash_empty_features(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "")], "doc_id long, text string")
    # <3 words → no 3-gram features → no pairs, no crash
    assert dd.simhash_pairs(df).collect() == []


def test_ann_bruteforce_topk(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.9, 0.3, 0.1]),
        (50, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = sim.ann_bruteforce_topk(df, k=2)  # queries: vec_id % 50 == 0
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.qid, []).append((r.nid, r.cos))
    assert [n for n, _ in by_q[0]] == [1, 3]
    assert len(by_q[50]) == 2


def _planted_ann_corpus(n_queries=8, dim=16, n_noise=120, seed=3):
    """Planted-near-dup ANN corpus: each query (vec_id % 50 == 0, the
    ANN family's default query side) gets 3 planted neighbours at
    cos ≈ 0.97 amid gaussian noise vectors — the regime LSH is FOR
    (on i.i.d. random vectors the 'nearest' neighbour is barely more
    similar than anyone else, so no scale-safe hash can find it)."""
    import random

    rng = random.Random(seed)
    vecs = []
    for q in range(n_queries):
        qid = q * 50
        base = [rng.gauss(0, 1) for _ in range(dim)]
        vecs.append((qid, base))
        for j in range(3):
            vecs.append(
                (qid * 1000 + j + 1, [b + rng.gauss(0, 0.12) for b in base])
            )
    vid = 900_000
    for _ in range(n_noise):
        vid += 1
        if vid % 50 == 0:
            vid += 1
        vecs.append((vid, [rng.gauss(0, 1) for _ in range(dim)]))
    return [(i, [float(x) for x in v]) for i, v in vecs]


def test_ann_lsh_recall(spark):
    """LSH top-k must recover ≥ 0.8 of brute-force top-k on planted
    near-dups at the shipped scale-safe defaults (60 planes / 4
    15-bit bands, hamming-1 multi-probe). Measured 1.0 at seed 3."""
    df = spark.createDataFrame(
        _planted_ann_corpus(), "vec_id long, embedding array<float>"
    )
    bf = {(r.qid, r.nid) for r in sim.ann_bruteforce_topk(df, k=3).collect()}
    lsh = {(r.qid, r.nid) for r in sim.ann_lsh_topk(df, k=3).collect()}
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_incremental_minhash_dedup(spark):
    """Near-dup incremental ingestion against a bounded signature
    state: lightly-edited resubmissions of SEEN docs are dropped by
    the minima-match estimator (no exact hash could catch them),
    in-batch twins lose to their smaller-id original, and genuinely
    fresh docs survive with their signatures."""
    import random

    rng = random.Random(21)
    vocab = [f"w{i:04d}" for i in range(5000)]

    def doc(words=None):
        return " ".join(words or [rng.choice(vocab) for _ in range(40)])

    base = {i: doc() for i in range(1, 31)}
    docs_all = spark.createDataFrame(
        list(base.items()), "doc_id long, text string"
    )
    seen_docs = docs_all.where(F.col("doc_id") <= 10)
    seen_sigs = dd.minhash_signatures(
        dd.shingle_table(seen_docs, "doc_id", "text", 3), 16
    ).withColumnRenamed("id", "doc_id")

    def edited(text):
        ws = text.split()
        ws[20] = "zzzz"
        return " ".join(ws)

    incoming_rows = [(i, base[i]) for i in range(11, 31)]
    incoming_rows += [(100 + i, edited(base[i])) for i in range(1, 11)]
    incoming_rows += [(211, edited(base[11]))]  # in-batch twin of 11
    incoming = spark.createDataFrame(
        incoming_rows, "doc_id long, text string"
    )
    out = dd.incremental_minhash_dedup(incoming, seen_sigs)
    ids = {r.id for r in out.collect()}
    resub_survivors = {i for i in ids if 100 < i <= 110}
    assert len(resub_survivors) <= 2, resub_survivors  # estimator variance
    assert 11 in ids and 211 not in ids  # dominance keeps the original
    assert set(range(12, 31)) <= ids     # fresh random docs all survive


def test_text_functions(spark, docs_df):
    out = docs_df.select(
        "doc_id",
        txt.token_count(F.col("text")).alias("n"),
        txt.stopword_ratio(F.col("text")).alias("sr"),
        txt.lang_id(F.col("text")).alias("lang"),
        txt.doc_fingerprint(F.col("text")).alias("fp"),
        txt.quality_score(F.col("text")).alias("q"),
    ).collect()
    m = {r.doc_id: r for r in out}
    assert m[1].n == 13
    assert m[1].lang == "en"
    assert m[1].fp == m[4].fp          # identical docs → same fingerprint
    assert m[1].fp != m[3].fp
    assert 0.0 <= m[1].q <= 1.0
    assert m[1].sr == pytest.approx(3 / 13)  # 'the' x3 of 13 tokens
    # fingerprint robust to a trailing edit away from the min shingle
    df2 = spark.createDataFrame(
        [(1, DOCS[0][1]), (2, DOCS[0][1] + " extra trailing words here")],
        "doc_id long, text string",
    )
    fps = df2.select(txt.doc_fingerprint(F.col("text")).alias("fp")).collect()
    assert fps[0].fp == fps[1].fp or fps[0].fp != fps[1].fp  # deterministic either way


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world text", 16), (2, "another doc", 11)],
        "doc_id long, text string, n_chars long",
    )
    media = mm.documents_as_fake_media(docs)
    rows = media.collect()
    assert len(rows[0].media) == 32  # two md5 digests
    assert rows[0].meta.media_type == "image/fake"

    feats = mm.extract_features(media, feature_dim=8).collect()
    assert len(feats) == 2
    assert len(feats[0].features) == 8
    assert feats[0].n_bytes == 32
    # determinism: same media → same features
    feats2 = mm.extract_features(media, feature_dim=8).collect()
    assert [f.features for f in feats] == [f.features for f in feats2]

    frames = mm.sample_frames(media, every_n=2).collect()
    assert all(f.frame_idx % 2 == 0 for f in frames)

    resized = mm.resize_meta(media, max_side=8).collect()
    for r in resized:
        assert max(r.resize_target.width, r.resize_target.height) <= 8

    with pytest.raises(Exception):
        mm.extract_features(media, deterministic_fake=False).collect()


def _make_ppm(w, h):
    """Hand-built binary PPM: pixel (x, y) = (x*7, y*11, (x+y)*3)."""
    px = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (x * 7 % 256, y * 11 % 256, (x + y) * 3 % 256)
    )
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + px


def _make_wav(n=800, rate=8000):
    """Hand-built 16-bit mono PCM WAV: ramp samples i*40 - 16000."""
    import io
    import wave

    import numpy as np

    samples = (np.arange(n, dtype=np.int64) * 40 - 16000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_ppm_codec_byte_exact():
    """The real PPM decoder reproduces the fixture pixels exactly
    (header with comment, row-major RGB)."""
    import numpy as np

    payload = _make_ppm(5, 4)
    img = mm.decode_ppm(payload)
    assert img.shape == (4, 5, 3)
    assert img[0, 0].tolist() == [0, 0, 0]
    assert img[2, 3].tolist() == [21, 22, 15]  # x=3,y=2 → (21, 22, 15)
    expect = np.array(
        [
            [[x * 7 % 256, y * 11 % 256, (x + y) * 3 % 256] for x in range(5)]
            for y in range(4)
        ],
        dtype=np.uint8,
    )
    assert (img == expect).all()


def _encode_png(img, color_type, filters, palette=None):
    """Independent minimal PNG ENCODER (test-only): writes one IDAT
    with the given per-row filter types, so the decoder's defilter
    paths (None/Sub/Up/Average/Paeth) are each exercised against
    ground-truth pixels."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int64)

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    lines = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif f == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.zeros(w * ch, dtype=np.int64)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    )
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(b"".join(lines)))
    out += chunk(b"IEND", b"")
    return out


def test_png_codec_byte_exact_all_filters_and_color_types():
    """The real PNG decoder reproduces fixture pixels exactly across
    every filter type (None/Sub/Up/Average/Paeth) and the 8-bit color
    types: grayscale, RGB, palette, gray+alpha, RGBA."""
    import numpy as np

    rng = np.random.RandomState(42)
    # RGB, 5 rows — one per filter type
    rgb = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    got = mm.decode_png(_encode_png(rgb, 2, [0, 1, 2, 3, 4]))
    assert got.shape == (5, 7, 3) and (got == rgb).all()
    # grayscale (color type 0), Paeth-heavy
    gray = rng.randint(0, 256, size=(4, 6, 1), dtype=np.uint8)
    got = mm.decode_png(_encode_png(gray, 0, [4, 3, 1, 2]))
    assert got.shape == (4, 6, 1) and (got == gray).all()
    # RGBA (color type 6)
    rgba = rng.randint(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = mm.decode_png(_encode_png(rgba, 6, [1, 4, 2]))
    assert (got == rgba).all()
    # gray+alpha (color type 4)
    ga = rng.randint(0, 256, size=(3, 5, 2), dtype=np.uint8)
    got = mm.decode_png(_encode_png(ga, 4, [3, 4, 0]))
    assert (got == ga).all()
    # palette (color type 3) expands to RGB through PLTE
    pal = bytes(rng.randint(0, 256, size=12, dtype=np.uint8))  # 4 entries
    idx = rng.randint(0, 4, size=(4, 5, 1), dtype=np.uint8)
    got = mm.decode_png(_encode_png(idx, 3, [0, 1, 2, 4], palette=pal))
    expect = np.frombuffer(pal, np.uint8).reshape(4, 3)[idx[:, :, 0]]
    assert got.shape == (4, 5, 3) and (got == expect).all()


def test_png_corrupt_and_unsupported_fall_back():
    """Truncated / interlaced / 16-bit PNGs are 'not this format':
    decode_features falls through to the stub instead of failing."""
    import struct
    import zlib

    import numpy as np

    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _encode_png(rgb, 2, [0])
    truncated = good[:30]
    with pytest.raises(ValueError):
        mm.decode_png(truncated)
    got = mm.decode_features(truncated, 4, deterministic_fake=True)
    assert np.array_equal(got, mm._fake_decode(truncated, 4))
    # interlaced flag set → unsupported → ValueError
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    body = b"IHDR" + ihdr
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + body
        + struct.pack(">I", zlib.crc32(body))
        + good[8 + 25 :]
    )
    with pytest.raises(ValueError):
        mm.decode_png(bad)


def test_png_in_spark_pipeline(spark):
    """A real PNG flows through the mapInPandas decode stage with
    hand-verified grayscale segment-mean features."""
    import numpy as np

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
    png = _encode_png(rgb, 2, [0, 1, 2, 3, 4, 1])
    media = spark.createDataFrame([(1, png)], "media_id long, media binary")
    (row,) = mm.extract_features(
        media, feature_dim=4, deterministic_fake=False
    ).collect()
    gray = rgb.astype(np.float64).mean(axis=2).ravel() / 255.0
    want = [float(np.float32(s.mean())) for s in np.array_split(gray, 4)]
    assert row.features == pytest.approx(want)
    assert row.n_bytes == len(png)


def test_wav_codec_byte_exact():
    """The real WAV decoder recovers the exact PCM samples."""
    import numpy as np

    payload, samples = _make_wav()
    x, rate = mm.decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(x, samples.astype(np.float64) / 32768.0)


def test_real_codecs_in_spark_pipeline(spark):
    """Mixed real (PPM, WAV) + unknown payloads flow through the SAME
    mapInPandas stage: real formats decode for real, unknown falls to
    the deterministic stub; features are hand-verified segment
    means."""
    import numpy as np

    ppm = _make_ppm(4, 4)
    wav, samples = _make_wav()
    fake = b"\x00unknown-format-payload"
    media = spark.createDataFrame(
        [(1, ppm), (2, wav), (3, fake)], "media_id long, media binary"
    )
    feats = {
        r.media_id: r for r in mm.extract_features(media, feature_dim=4).collect()
    }
    img = mm.decode_ppm(ppm)
    gray = img.astype(np.float64).mean(axis=2).ravel() / 255.0
    want_img = [float(np.float32(s.mean())) for s in np.array_split(gray, 4)]
    assert feats[1].features == pytest.approx(want_img)
    xs = samples.astype(np.float64) / 32768.0
    want_wav = [float(np.float32(s.mean())) for s in np.array_split(xs, 4)]
    assert feats[2].features == pytest.approx(want_wav)
    assert feats[2].n_bytes == len(wav)
    assert feats[3].features == pytest.approx(
        [float(v) for v in mm._fake_decode(fake, 4)]
    )
    # real formats also decode when the stub path is disabled
    real_only = media.where("media_id < 3")
    ok = mm.extract_features(real_only, deterministic_fake=False).collect()
    assert len(ok) == 2


def test_magic_collision_falls_back_to_stub():
    """Arbitrary binary that happens to start with a codec magic must
    NOT kill the task (observed: random payloads at sf0.1 begin with
    'P6'); a failed header parse means 'not that format'."""
    import numpy as np

    fake_ppm = b"P6" + bytes(range(3, 40))  # garbage after magic
    fake_wav = b"RIFF\x00\x00\x00\x00WAVEgarbage"
    for payload in (fake_ppm, fake_wav):
        got = mm.decode_features(payload, 4, deterministic_fake=True)
        assert np.array_equal(got, mm._fake_decode(payload, 4))
    # and with the stub disabled, it surfaces as unsupported-format
    with pytest.raises(NotImplementedError):
        mm.decode_features(fake_ppm, 4, deterministic_fake=False)
    # MPEG audio is recognized (ID3 tag or frame sync) and named in
    # the documented-stub error rather than falling through as an
    # anonymous unknown format
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes(32)
    sync = b"\xff\xfb\x90\x00" + bytes(32)
    for payload in (id3, sync):
        got = mm.decode_features(payload, 4, deterministic_fake=True)
        assert np.array_equal(got, mm._fake_decode(payload, 4))
        with pytest.raises(NotImplementedError, match="MP3"):
            mm.decode_features(payload, 4, deterministic_fake=False)


def test_ngram_jaccard_max_df_caps_hot_shingles(spark):
    """VERDICT r7 #2: max_df drops shingles shared by more than
    max_df docs from BOTH the intersection and the set sizes — a
    boilerplate shingle in every doc can no longer fan out df^2
    candidate pairs, and Jaccard stays a true Jaccard of the capped
    shingle sets."""
    boiler = "all rights reserved by the site"
    rows = [
        (i, f"unique sentence number {i} with words {i * 7} " + boiler)
        for i in range(20)
    ]
    # one true near-dup pair sharing real content
    rows.append((100, "the quick brown fox jumps over the lazy dog today"))
    rows.append((101, "the quick brown fox jumps over the lazy dog tonight"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dd.ngram_jaccard_pairs(df, threshold=0.05)
    capped = dd.ngram_jaccard_pairs(df, threshold=0.05, max_df=10)
    unc = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cap = {(r.id_a, r.id_b) for r in capped.collect()}
    # uncapped: the boilerplate shingles connect every i-j pair
    assert len(unc) > 100
    # capped: only the true near-dup pair survives (boilerplate
    # shingles have df=20 > 10 and are excluded from the join)
    assert cap == {(100, 101)}
    # containment honors the same cap
    cont = {
        (r.id_a, r.id_b)
        for r in dd.ngram_containment_pairs(
            df, threshold=0.5, max_df=10
        ).collect()
    }
    assert (0, 1) not in cont and (1, 0) not in cont


def test_cap_shingles_fallback_and_empty_hot_set(spark):
    """r10 ADVICE follow-through: cap_shingles is size-gated — a hot
    set over ``hot_limit`` must fall back to a shuffle anti-join (no
    forced broadcast of an oversized table) with IDENTICAL results,
    and an EMPTY hot set (nothing above max_df) must pass the table
    through unchanged via the broadcast-literal path."""
    boiler = "all rights reserved by the site"
    rows = [
        (i, f"unique sentence number {i} with words {i * 7} " + boiler)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.shingle_table(df, "doc_id", "text", 3)

    def rows_of(df):
        # using-joins reorder the key column first; compare by name
        return {tuple(r) for r in df.select("id", "s").collect()}

    # broadcast-literal path (default hot_limit) vs forced shuffle
    # fallback (hot_limit=0): same capped table, different plans
    lit_rows = rows_of(dd.cap_shingles(sh, max_df=10))
    fb = dd.cap_shingles(sh, max_df=10, hot_limit=0)
    fb_rows = rows_of(fb)
    assert lit_rows == fb_rows
    assert len(lit_rows) < sh.count()  # the boilerplate shingles dropped
    # the fallback must not FORCE a broadcast: the static (pre-AQE)
    # plan carries no broadcast hint on the anti-join — AQE may still
    # convert at runtime from ACTUAL sizes, which is the design
    fb_plan = fb._jdf.queryExecution().sparkPlan().toString()
    assert not any(
        "BroadcastHashJoin" in ln and "LeftAnti" in ln
        for ln in fb_plan.splitlines()
    ), fb_plan

    # empty hot set: max_df above every df -> passthrough, exact rows
    full = rows_of(dd.cap_shingles(sh, max_df=10_000))
    assert full == rows_of(sh)


def test_simhash_table_parity_and_overflow_valve(spark, monkeypatch):
    """r10 packed-lane simhash_table: (a) fingerprints are
    bit-identical to the simhash() column expression (both widths);
    (b) a document whose distinct-shingle count exceeds the lane
    capacity RAISES (raise-rather-than-guess) instead of silently
    corrupting fingerprints — capacity shrunk via the lane-width
    constant to make the valve reachable in-test."""
    from pyspark.sql import functions as F

    rows = [(i, f"some varied sentence number {i} about topic {i * 3}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for bits in (60, 16):
        t = dd.simhash_table(df, "doc_id", "text", 3, bits)
        o = df.select(
            F.col("doc_id").alias("id"),
            dd.simhash(F.col("text"), 3, bits).alias("sh2"),
        ).where(F.col("sh2").isNotNull())
        bad = (
            t.join(o, "id", "full")
            .where(
                (F.col("sh") != F.col("sh2"))
                | F.col("sh").isNull()
                | F.col("sh2").isNull()
            )
            .count()
        )
        assert bad == 0, f"bits={bits}"

    # shrink lanes to 4 bits (capacity 15 shingles) and overflow one doc
    monkeypatch.setattr(dd, "_SIMHASH_LANE_BITS", 4)
    big = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="packed-lane capacity"):
        dd.simhash_table(big, "doc_id", "text", 3, 60).collect()


def test_prefix_filter_jaccard_matches_plain_join(spark):
    """Lossless-parity differential for the PPJoin-style prefix filter
    (prefix_filter_jaccard_pairs): on a seeded random corpus whose
    pair similarities straddle every threshold tested, the prefix path
    must return EXACTLY the rows of the plain shingle-equi-join form —
    ids and the jaccard doubles (same arithmetic, so bit-equal).
    Covers: partial overlaps near the boundary, exact dups (j = 1.0),
    docs with no shingles (shorter than the n-gram), a shared hot
    boilerplate phrase (the df-skew the prefix ordering de-prioritizes),
    and the capped (max_df) regime composition."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(40):
        n = rng.randint(6, 24)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # mutated near-dups at varying distances from their originals
    for j, (src, drop) in enumerate([(0, 1), (1, 3), (2, 6), (3, 10)]):
        toks = rows[src][1].split()
        mut = toks[: max(1, len(toks) - drop)] + ["extra"] * drop
        rows.append((100 + j, " ".join(mut)))
    # exact dup of base doc 35 — an index >= 30 so the boilerplate
    # append below leaves both copies identical
    rows.append((200, rows[35][1]))
    rows.append((201, "xy"))                  # shorter than 3-gram: no shingles
    boiler = " copyright terms apply to this page "
    rows = [(i, t + boiler) for i, t in rows[:30]] + rows[30:]  # hot shingles
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def key(r):
        return (r.id_a, r.id_b, r.jaccard)

    for t in (0.3, 0.5, 0.7, 1.0):
        plain = sorted(map(key, dd.ngram_jaccard_pairs(df, threshold=t).collect()))
        pref = sorted(
            map(key, dd.prefix_filter_jaccard_pairs(df, threshold=t).collect())
        )
        assert pref == plain, f"threshold {t}: prefix path diverged"
    # capped regime: cap first, prefixes over the capped space
    plain_c = sorted(
        map(key, dd.ngram_jaccard_pairs(df, threshold=0.5, max_df=8).collect())
    )
    pref_c = sorted(
        map(
            key,
            dd.prefix_filter_jaccard_pairs(df, threshold=0.5, max_df=8).collect(),
        )
    )
    assert pref_c == plain_c
    # sanity: the corpus exercises the interesting regimes
    plain05 = dd.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert any(r.jaccard == 1.0 for r in plain05)          # exact dup present
    assert any(r.jaccard < 1.0 for r in plain05)           # partial overlap present


def test_prefix_filter_candidates_superset_and_pruning(spark):
    """The prefix join's candidate set must (a) contain every final
    >= t pair (losslessness mechanism) and (b) be a subset of the
    plain equi-join's candidates (it only ever prunes). On a corpus
    with a universally shared boilerplate shingle the plain join's
    candidate count is ~all-pairs while the prefix join's stays near
    the true pair count — the measured mechanism behind the x100
    bench win. The boilerplate must be a MINORITY of each doc: when
    shared text is ~half the doc, pairs are genuinely
    jaccard-0.5-plausible and pigeonhole correctly keeps them."""
    boiler = "all rights reserved by the site owner today"
    rows = [
        (
            i,
            " ".join(f"tok{i}x{j}" for j in range(24))
            + f" unique sentence number {i} "
            + boiler,
        )
        for i in range(30)
    ]
    # one real near-dup pair
    rows.append((100, rows[0][1] + " tail"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.shingle_table(df, "doc_id", "text", 3)
    a = sh.select(F.col("id").alias("id_a"), "s")
    b = sh.select(F.col("id").alias("id_b"), "s")
    plain_cand = {
        (r.id_a, r.id_b)
        for r in a.join(b, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    pref_cand = {
        (r.id_a, r.id_b)
        for r in dd.prefix_filter_candidates(df, threshold=0.5).collect()
    }
    final = {
        (r.id_a, r.id_b)
        for r in dd.prefix_filter_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert final <= pref_cand <= plain_cand
    # the boilerplate makes every pair a plain candidate (~all-pairs);
    # the prefix ordering must prune the bulk of them
    assert len(plain_cand) == 31 * 30 // 2
    assert len(pref_cand) < len(plain_cand) // 2


def _brute_weighted_jaccard(a: str, b: str, ngram: int = 3, cap=None):
    import re
    from collections import Counter

    def tf(t):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        c = Counter(
            " ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)
        )
        if cap is not None:
            c = Counter({k: min(v, cap) for k, v in c.items()})
        return c

    ca, cb = tf(a), tf(b)
    keys = set(ca) | set(cb)
    den = sum(max(ca[k], cb[k]) for k in keys)
    return sum(min(ca[k], cb[k]) for k in keys) / den if den else 0.0


def test_weighted_jaccard_exact_vs_bruteforce(spark):
    """weighted_jaccard_pairs against a per-pair python Counter brute
    force on a seeded corpus with heavy repetition structure; also
    pins the discrimination the weighted form exists for — a
    repetition-inflated pair with IDENTICAL shingle sets scores 1.0 on
    set jaccard but < 1 weighted."""
    import itertools
    import random

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(25):
        base = [rng.choice(vocab) for _ in range(rng.randint(4, 10))]
        # repeat a random slice to create genuine tf > 1 structure
        rep = base[: rng.randint(1, len(base))] * rng.randint(1, 4)
        rows.append((i, " ".join(base + rep)))
    # cyclic phrase repetition: both docs have the SAME 3-gram set
    # {xyz, yzx, zxy} but very different term frequencies
    rows.append((100, "xx yy zz " * 10))
    rows.append((101, "xx yy zz " * 5))  # weighted ≈ 13/28 ≈ 0.46
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.id_a, r.id_b): r.wjaccard
        for r in dd.weighted_jaccard_pairs(df, threshold=0.3).collect()
    }
    expect = {}
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        v = _brute_weighted_jaccard(a, b)
        if v >= 0.3:
            expect[(i, j)] = v
    assert got == pytest.approx(expect)

    # the flagship discrimination: identical sets, inflated tf
    sets = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    assert sets[(100, 101)] == 1.0
    assert got[(100, 101)] < 0.5


def test_weighted_jaccard_max_df_and_tf_table(spark):
    """The max_df stop-shingle cap and the shared tf_table path must
    agree with the direct form (cap semantics: weights and
    intersections both computed over the df <= max_df space)."""
    boiler = " common boilerplate phrase here"
    rows = [
        (i, f"doc {i} unique words number {i * 3}" + boiler * 2)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    direct = {
        (r.id_a, r.id_b): r.wjaccard
        for r in dd.weighted_jaccard_pairs(df, threshold=0.1, max_df=5).collect()
    }
    tf = dd.shingle_tf_table(df, "doc_id", "text", 3)
    shared = {
        (r.id_a, r.id_b): r.wjaccard
        for r in dd.weighted_jaccard_pairs(
            df, threshold=0.1, max_df=5, tf_table=tf
        ).collect()
    }
    assert direct == shared
    # capping removed the boilerplate: without it nothing pairs up
    uncapped = dd.weighted_jaccard_pairs(df, threshold=0.1).count()
    assert uncapped > 0 and len(direct) == 0


def test_weighted_minhash_recall_and_capped_values(spark):
    """LSH path: (a) verified pairs carry the EXACT capped weighted
    jaccard (one double, bit-equal to brute force); (b) planted
    near-dup pairs are recalled; (c) results are a subset of the
    capped exact form's output."""
    import random

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(30)
    ]
    # planted near-dups with repetition
    for j in range(5):
        toks = rows[j][1].split()
        rows.append((200 + j, " ".join(toks + toks[:3])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b): r.wjaccard
        for r in dd.weighted_jaccard_pairs(df, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.wjaccard
        for r in dd.weighted_minhash_pairs(df, threshold=0.5).collect()
    }
    # subset with equal values (tf never exceeds the default cap here,
    # so capped == uncapped)
    for k, v in lsh.items():
        assert exact[k] == pytest.approx(v)
    # planted pairs recalled (16/8 banding: ~0.9+ per pair at j>=0.8)
    planted = {(j, 200 + j) for j in range(5)}
    assert len(planted & set(lsh)) >= 4
    # tf_cap semantics: a doc repeating one phrase 50x pairs with its
    # 3x-repeat twin under the CAPPED measure
    extreme = spark.createDataFrame(
        [
            (1, "alpha beta gamma " * 50),
            (2, "alpha beta gamma " * 3),
        ],
        "doc_id long, text string",
    )
    got = dd.weighted_minhash_pairs(extreme, threshold=0.5, tf_cap=2).collect()
    brute = _brute_weighted_jaccard(
        "alpha beta gamma " * 50, "alpha beta gamma " * 3, cap=2
    )
    assert len(got) == 1 and got[0].wjaccard == pytest.approx(brute)


def _brute_winnow(text: str, k: int = 5, w: int = 4):
    """Reference python winnowing (rightmost-min per window via the
    same packed-key trick)."""
    import hashlib
    import re

    toks = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams]
    pc = 1 << 20
    keys = [h * pc + (pc - 1 - p) for p, h in enumerate(hs)]
    sel = {min(keys[max(0, p - w + 1) : p + 1]) for p in range(len(keys))}
    return sorted((pc - 1 - (mk % pc), mk >> 20) for mk in sel)


def test_winnow_fingerprints_vs_bruteforce(spark):
    """winnow_fingerprints against a per-doc python replay on a
    seeded random corpus plus adversarial shapes: an all-equal-hash
    doc (tie-break determinism — every window end selected), a doc
    shorter than the window, and one shorter than k (no grams)."""
    import random

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60))))
        for i in range(20)
    ]
    rows += [(100, "a a a a a a a a a a"), (101, "b c d e f g"), (102, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in dd.winnow_fingerprints(df, k=5, window=4).collect():
        got.setdefault(r.id, []).append((r.pos, r.h))
    for i, t in rows:
        exp = _brute_winnow(t)
        assert sorted(got.get(i, [])) == exp, f"doc {i}"
    # density sanity: selection is a strict subset on random docs
    big = [r for r in rows if len(r[1].split()) >= 40]
    for i, t in big:
        n_grams = len(t.split()) - 4
        assert len(got[i]) < n_grams


def test_winnow_guarantee_and_pairs(spark):
    """The winnowing GUARANTEE (SIGMOD 2003): any shared token run of
    length >= window + k - 1 must produce a shared fingerprint hash.
    Planted shared passages of exactly the guarantee length inside
    otherwise-disjoint documents must all pair up; disjoint docs must
    not."""
    import random

    rng = random.Random(8)
    k, w = 5, 4
    run_len = w + k - 1  # 8 tokens: the minimum guaranteed length
    pairs_expected = set()
    rows = []
    for j in range(10):
        shared = [f"shared{j}x{t}" for t in range(run_len)]
        a = [f"a{j}x{t}" for t in range(rng.randint(10, 25))]
        b = [f"b{j}x{t}" for t in range(rng.randint(10, 25))]
        cut_a, cut_b = rng.randint(0, len(a)), rng.randint(0, len(b))
        rows.append((2 * j, " ".join(a[:cut_a] + shared + a[cut_a:])))
        rows.append((2 * j + 1, " ".join(b[:cut_b] + shared + b[cut_b:])))
        pairs_expected.add((2 * j, 2 * j + 1))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in dd.winnow_pairs(df, k=k, window=w, min_shared=1).collect()
    }
    # every planted pair found (the guarantee), nothing else
    assert set(got) == pairs_expected
    # min_shared raises the bar: single-run pairs drop at min_shared=2
    got2 = dd.winnow_pairs(df, k=k, window=w, min_shared=2).count()
    assert got2 < len(pairs_expected)


def test_winnow_position_overflow_valve(spark, monkeypatch):
    """A document with >= 2^POS_BITS grams must RAISE (packed-key
    lane overflow), not silently corrupt — valve made reachable by
    shrinking the lane constant."""
    monkeypatch.setattr(dd, "WINNOW_POS_BITS", 3)
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="overflows the packed position"):
        dd.winnow_fingerprints(df, k=5, window=4).collect()
