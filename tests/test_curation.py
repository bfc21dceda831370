"""Training-data curation operators (packing + stratified sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from annotation_service_spark.operators import curation as cu


def _docs(spark, tokens_by_id, source="s"):
    return spark.createDataFrame(
        [(i, source, t) for i, t in tokens_by_id.items()],
        "doc_id long, source string, n_tokens int",
    )


def test_greedy_pack_invariants(spark):
    toks = {1: 100, 2: 400, 3: 20, 4: 600, 5: 10, 6: 501, 7: 250, 8: 249}
    out = cu.greedy_pack(_docs(spark, toks), capacity=500, partition_by=["source"])
    rows = sorted((r.doc_id, r.bin_id) for r in out.collect())
    # greedy walk in doc_id order (capacity 500):
    # 100+400 fill bin0 exactly; 20 opens bin1; oversize 600 gets bin2
    # alone; 10 opens bin3; 501 overflows it -> bin4 alone; 250+249
    # share bin5.
    assert rows == [
        (1, 0), (2, 0), (3, 1), (4, 2), (5, 3), (6, 4), (7, 5), (8, 5)
    ]
    # structural invariants: no multi-doc bin over capacity; contiguous ids
    bins: dict[int, list[int]] = {}
    got = {r.doc_id: r for r in out.collect()}
    for i, t in toks.items():
        bins.setdefault(got[i].bin_id, []).append(t)
    for b, ts in bins.items():
        assert sum(ts) <= 500 or len(ts) == 1, (b, ts)
    assert sorted(bins) == list(range(len(bins)))


def test_greedy_pack_oversize_and_groups(spark):
    df = spark.createDataFrame(
        [(1, "a", 700), (2, "a", 100), (3, "b", 100), (4, "b", 400)],
        "doc_id long, source string, n_tokens int",
    )
    out = {(r.source, r.doc_id): r.bin_id for r in
           cu.greedy_pack(df, capacity=500, partition_by=["source"]).collect()}
    assert out[("a", 1)] == 0          # oversize doc in its own bin
    assert out[("a", 2)] == 1          # next doc opens a fresh bin
    assert out[("b", 3)] == 0 and out[("b", 4)] == 0  # fits together
    # groups pack independently (bin ids restart per group)


def test_concat_chunk_map_brute_force(spark):
    toks = {i: (i * 37) % 90 for i in range(1, 30)}
    out = cu.concat_chunk_map(
        _docs(spark, toks), block_size=64, partition_by=["source"]
    )
    rows = {r.doc_id: r for r in out.collect()}
    off = 0
    for i in sorted(toks):
        t = toks[i]
        r = rows[i]
        assert r.start_off == off
        assert r.first_block == off // 64
        expect_last = (off + t - 1) // 64 if t > 0 else off // 64
        assert r.last_block == expect_last
        off += t


def test_concat_chunk_map_global_two_phase(spark):
    """VERDICT r3 #3: the global (no partition_by) form must produce
    the exact single-concatenation cumsum WITHOUT a single-partition
    Window — the plan carries a hash exchange on the range shard, not
    an Exchange SinglePartition."""
    toks = {i: (i * 37) % 90 for i in range(1, 200)}
    df = _docs(spark, toks)
    out = cu.concat_chunk_map(df, block_size=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(toks)
    off = 0
    for i in sorted(toks):
        t = toks[i]
        r = rows[i]
        assert r.start_off == off, i
        assert r.first_block == off // 64
        expect_last = (off + t - 1) // 64 if t > 0 else off // 64
        assert r.last_block == expect_last
        off += t


def test_concat_chunk_map_global_string_ids(spark):
    """ADVICE r5: the global two-phase cumsum must work for
    NON-NUMERIC doc ids (approxQuantile is numeric-only; string ids
    fall back to sample-based range boundaries). Zero-padded ids make
    string order == numeric order, so the sequential expectation is
    the same cumsum."""
    toks = {i: (i * 37) % 90 for i in range(1, 120)}
    df = spark.createDataFrame(
        [(f"doc-{i:05d}", t) for i, t in toks.items()],
        "doc_id string, n_tokens int",
    )
    out = cu.concat_chunk_map(df, block_size=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(toks)
    off = 0
    for i in sorted(toks):
        t = toks[i]
        r = rows[f"doc-{i:05d}"]
        assert r.start_off == off, i
        assert r.first_block == off // 64
        expect_last = (off + t - 1) // 64 if t > 0 else off // 64
        assert r.last_block == expect_last
        off += t


def test_stratified_sample_deterministic_and_rated(spark):
    docs = spark.createDataFrame(
        [(i, "heavy" if i % 2 else "light", "x") for i in range(2000)],
        "doc_id long, source string, text string",
    )
    kept = cu.stratified_sample(
        docs, rates={"heavy": 0.9, "light": 0.1}, salt="s1"
    )
    counts = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert 800 < counts["heavy"] <= 1000   # ~0.9 of 1000
    assert 50 < counts["light"] < 200      # ~0.1 of 1000
    # same salt → identical sample; different salt → different sample
    again = {r.doc_id for r in cu.stratified_sample(
        docs, rates={"heavy": 0.9, "light": 0.1}, salt="s1").collect()}
    assert again == {r.doc_id for r in kept.collect()}
    other = {r.doc_id for r in cu.stratified_sample(
        docs, rates={"heavy": 0.9, "light": 0.1}, salt="s2").collect()}
    assert other != again


def test_redact_pii_unit(spark):
    from annotation_service_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            ("write a@b.co or c.d+x@e-f.org, call 555-123-4567, ping 10.0.0.1",),
            ("no pii here, 999.999.999.999 is not an ip, 12-34-56 not a phone",),
        ],
        "text string",
    )
    out = [r.r for r in df.select(redact_pii(F.col("text")).alias("r")).collect()]
    assert out[0].n_emails == 2 and out[0].n_phones == 1 and out[0].n_ips == 1
    assert "<EMAIL>" in out[0].redacted and "<PHONE>" in out[0].redacted
    assert "a@b.co" not in out[0].redacted and "10.0.0.1" not in out[0].redacted
    assert out[1].n_emails == 0 and out[1].n_phones == 0 and out[1].n_ips == 0
    assert out[1].redacted.startswith("no pii here")


def test_chunk_spans_edges(spark):
    """Span invariants: full coverage with exact overlap, clipped final
    chunk, degenerate single-chunk docs (len <= chunk_size, len = 0)."""
    df = spark.createDataFrame(
        [(1, 300), (2, 350), (3, 351), (4, 120), (5, 0)],
        "doc_id long, n_chars long",
    )
    rows = cu.chunk_spans(df, chunk_size=200, overlap=50).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_start, r.chunk_end))
    for d in by_doc:
        by_doc[d].sort()
    assert by_doc[1] == [(0, 0, 200), (1, 150, 300)]
    assert by_doc[2] == [(0, 0, 200), (1, 150, 350)]
    assert by_doc[3] == [(0, 0, 200), (1, 150, 350), (2, 300, 351)]
    assert by_doc[4] == [(0, 0, 120)]
    assert by_doc[5] == [(0, 0, 0)]
    # consecutive chunks overlap by exactly `overlap` (except clipped tails)
    for d, spans in by_doc.items():
        for (_, s1, e1), (_, s2, _) in zip(spans, spans[1:]):
            assert s2 == s1 + 150 and e1 - s2 in range(0, 51)

def test_chunk_spans_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    try:
        cu.chunk_spans(df, chunk_size=50, overlap=50)
    except ValueError as exc:
        assert "exceed" in str(exc)
    else:
        raise AssertionError("expected ValueError")


def test_dsir_weights_prefer_target_like(spark):
    """Docs sharing the target subset's vocabulary must outweigh docs
    made of off-target vocabulary, and weights are finite/deterministic."""
    from pyspark.sql import functions as F

    rows = [
        # target docs (is_target): "spark" dialect
        (0, "spark shuffle partition broadcast join spark shuffle", True),
        (1, "broadcast join partition spark shuffle partition", True),
        # raw-only doc written in the target dialect -> high weight
        (2, "spark shuffle broadcast partition join shuffle", False),
        # raw-only doc in a disjoint dialect -> low weight
        (3, "llama alpaca vicuna gazelle okapi ibex markhor", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {
        r.id: r.logw
        for r in cu.dsir_weights(df, F.col("tgt"), n_buckets=512).collect()
    }
    assert set(w) == {0, 1, 2, 3}
    assert w[2] > w[3], w
    # target-dialect docs themselves score high too
    assert min(w[0], w[1]) > w[3]

    sel = cu.dsir_resample(df, F.col("tgt"), n_buckets=512, frac=0.5).collect()
    assert {r.id for r in sel} == {0, 1, 2, 3}
    n_sel = sum(1 for r in sel if r.selected)
    assert 1 <= n_sel <= 3  # half the corpus modulo grid ties
    # determinism: same inputs -> identical gscores
    sel2 = cu.dsir_resample(df, F.col("tgt"), n_buckets=512, frac=0.5).collect()
    assert sorted((r.id, r.gscore) for r in sel) == sorted(
        (r.id, r.gscore) for r in sel2
    )


def test_epoch_shuffle_is_exact_permutation(spark):
    """Ranks are exactly 0..n-1 (a permutation), batches are full
    except the last, and the assignment is partition-invariant."""
    from annotation_service_spark.operators import curation as cu
    from annotation_service_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = cu.epoch_shuffle(docs, epoch=3, batch_size=64).collect()
    n = len(out)
    assert sorted(r.rank for r in out) == list(range(n))
    sizes = {}
    for r in out:
        sizes[r.batch_idx] = sizes.get(r.batch_idx, 0) + 1
        assert r.pos_in_batch == r.rank % 64
    full = [b for b, s in sizes.items() if s == 64]
    assert len(full) >= len(sizes) - 1  # only the last may be ragged
    again = {
        (r.doc_id, r.rank)
        for r in cu.epoch_shuffle(
            docs.repartition(13), epoch=3, batch_size=64
        ).collect()
    }
    assert again == {(r.doc_id, r.rank) for r in out}


def test_epoch_shuffle_epochs_differ(spark):
    from annotation_service_spark.operators import curation as cu
    from annotation_service_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    e0 = {r.doc_id: r.rank for r in cu.epoch_shuffle(docs, epoch=0).collect()}
    e1 = {r.doc_id: r.rank for r in cu.epoch_shuffle(docs, epoch=1).collect()}
    assert set(e0) == set(e1)
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > len(e0) * 0.9  # a fresh permutation, not a shift
