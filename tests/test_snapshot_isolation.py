"""Snapshot-isolated ST4 swap (VERDICT r8 #6): the versioned table
manifest gives readers Delta-style isolation — a reader opened before a
refresh finishes on the OLD snapshot even while the writer commits,
overwrites an uncommitted retry directory, and runs retention.
Reference analog: the RWMutex directory swap (manager/manager.go:38-57)
where in-flight lookups complete against the pre-swap directory."""

from __future__ import annotations

import os
import threading
import time

import pytest

from annotation_service_spark.streaming.refresh import (
    VersionedTableManifest,
)


def _write_batch(spark, out, epoch, lo, hi, tag):
    bdir = os.path.join(out, f"batch={epoch}")
    (
        spark.range(lo, hi)
        .selectExpr("id", f"'{tag}' AS tag", "'2024-01-01' AS dataset_date")
        .write.mode("overwrite")
        .partitionBy("dataset_date")
        .parquet(bdir)
    )
    return bdir


def test_manifest_commit_resolve_replay_replace(spark, tmp_path):
    out = str(tmp_path / "table")
    m = VersionedTableManifest(out)
    assert m.current_version() is None
    with pytest.raises(RuntimeError):
        m.resolve()

    d0 = _write_batch(spark, out, 0, 0, 10, "a")
    assert m.commit(0, [d0]) == 0
    assert m.current_version() == 0 and m.resolve() == [d0]

    # cumulative commit
    d1 = _write_batch(spark, out, 1, 10, 15, "b")
    assert m.commit(1, [d1]) == 1
    assert m.resolve() == [d0, d1]
    assert m.read(spark).count() == 15
    # the synthetic batch partition column is internal; dataset_date is kept
    assert set(m.read(spark).columns) == {"id", "tag", "dataset_date"}

    # at-least-once replay of an applied epoch is a no-op
    assert m.commit(1, [d1]) == 1
    assert m.commit(0, [d0]) == 1
    assert m.resolve() == [d0, d1]

    # replace commit: the snapshot is exactly the new dirs
    d2 = _write_batch(spark, out, 2, 100, 103, "c")
    assert m.commit(2, [d2], replace=True) == 2
    assert m.resolve() == [d2]
    assert m.read(spark).count() == 3
    # the superseded version stays readable while its manifest is retained
    assert m.read(spark, version=1).count() == 15

    # retention: keep=1 drops v0/v1 manifests and the dirs only they used
    deleted = m.retain(keep=1)
    assert sorted(deleted) == sorted([d0, d1])
    assert m.versions() == [2]
    assert not os.path.isdir(d0) and not os.path.isdir(d1)
    assert m.read(spark).count() == 3


def test_reader_pinned_to_open_version(spark, tmp_path):
    """A DataFrame resolved from one manifest never observes a later
    commit — even a replace — because its file list is pinned to
    immutable directories."""
    out = str(tmp_path / "table")
    m = VersionedTableManifest(out)
    m.commit(0, [_write_batch(spark, out, 0, 0, 20, "v1")])
    reader = m.read(spark)
    assert reader.count() == 20

    m.commit(1, [_write_batch(spark, out, 1, 0, 7, "v2")], replace=True)
    # old handle: still the full v0 snapshot; new handle: the replacement
    assert reader.count() == 20
    assert {r.tag for r in reader.select("tag").distinct().collect()} == {"v1"}
    assert m.read(spark).count() == 7


def test_reader_mid_scan_during_overwrite_and_commit(spark, tmp_path):
    """THE verdict r8 #6 'Done' criterion: a reader mid-scan while the
    writer (a) overwrites an uncommitted retry directory, (b) commits a
    replacing version, and (c) runs retention that respects the reader
    horizon, still yields ONE consistent version (all rows tagged v1,
    exact v1 count)."""
    import pandas as pd

    out = str(tmp_path / "table")
    m = VersionedTableManifest(out)
    m.commit(0, [_write_batch(spark, out, 0, 0, 400, "v1")])
    reader = m.read(spark).repartition(8)

    marker = str(tmp_path / "scan_started")  # plain string: picklable

    def slow(it):
        open(marker, "w").close()
        for pdf in it:
            time.sleep(0.25)  # hold the scan open across the writer's work
            yield pdf

    slow_df = reader.mapInPandas(slow, schema=reader.schema)

    result: dict = {}

    def scan():
        rows = slow_df.collect()
        result["tags"] = {r.tag for r in rows}
        result["n"] = len(rows)

    t = threading.Thread(target=scan)
    t.start()
    deadline = time.time() + 30
    while not os.path.exists(marker) and time.time() < deadline:
        time.sleep(0.05)
    assert os.path.exists(marker), "scan never started"

    # writer side, all while the scan is in flight:
    # (a) a crashed epoch's partial output gets overwritten by its retry
    bdir1 = os.path.join(out, "batch=1")
    os.makedirs(bdir1, exist_ok=True)
    with open(os.path.join(bdir1, "_partial.tmp"), "w") as fh:
        fh.write("torn write from the crashed attempt")
    _write_batch(spark, out, 1, 1000, 1050, "v2")  # the retry, overwrites
    # (b) replacing commit
    m.commit(1, [bdir1], replace=True)
    # (c) retention keeping the reader's version (the retention horizon
    # is the reader contract — keep >= in-flight snapshot age)
    assert m.retain(keep=2) == []

    t.join(120)
    assert result["n"] == 400
    assert result["tags"] == {"v1"}

    # after the reader window closes, retention reclaims v0
    deleted = m.retain(keep=1)
    assert deleted == [os.path.join(out, "batch=0")]
    fresh = m.read(spark)
    assert fresh.count() == 50
    assert {r.tag for r in fresh.select("tag").distinct().collect()} == {"v2"}


def test_refresh_loop_publishes_versioned_snapshots(spark, tmp_path):
    """start_refresh now commits through the manifest: each micro-batch
    lands as one version; the store's published DataFrame is pinned to
    the manifest it was swapped with."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from annotation_service_spark.streaming import refresh as rf

    watch = tmp_path / "in"
    watch.mkdir()
    out = tmp_path / "table"
    store = rf.SnapshotStore()
    schema = T.StructType([T.StructField("v", T.StringType())])

    def build(batch_df):
        return batch_df.withColumn(
            "dataset_date",
            F.to_date(F.regexp_extract("_src_path", r"(\d{8})-", 1), "yyyyMMdd"),
        ).select("v", "dataset_date")

    (watch / "20240101-a.csv").write_text("v\nx1\nx2\n")
    stream = rf.watch_new_files(spark, str(watch), schema, fmt="csv", header=True)
    q = rf.start_refresh(stream, build, store, "t", str(tmp_path / "ck"), str(out))
    q.awaitTermination(120)
    first = store.get("t")
    assert first.count() == 2

    (watch / "20240202-b.csv").write_text("v\ny1\n")
    q2 = rf.start_refresh(stream, build, store, "t", str(tmp_path / "ck"), str(out))
    q2.awaitTermination(120)
    m = rf.VersionedTableManifest(str(out))
    assert len(m.versions()) == 2
    assert store.get("t").count() == 3
    # the pre-refresh handle still scans its own snapshot
    assert first.count() == 2


# ---------------------------------------------------------------------------
# Property: arbitrary commit/replace/retain sequences keep the manifest's
# invariants (pure filesystem metadata — no Spark needed, so Hypothesis can
# hammer it)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_OPS = st.lists(
    st.tuples(
        st.sampled_from(["commit", "replace", "retain"]),
        st.integers(min_value=1, max_value=3),  # dirs per commit / keep
    ),
    min_size=1,
    max_size=24,
)


@given(_OPS)
@settings(max_examples=150, deadline=None)
def test_manifest_invariants_under_op_sequences(tmp_path_factory, ops):
    """Invariants after ANY op sequence:
    1. CURRENT always resolves to a readable manifest whose dirs exist;
    2. resolve(v) of any retained version names only existing dirs
       (a snapshot stays scannable while its manifest is retained);
    3. retention never deletes a dir a retained manifest references;
    4. epochs are monotonic: replaying any past epoch is a no-op."""
    out = str(tmp_path_factory.mktemp("vtm"))
    m = VersionedTableManifest(out)
    epoch = 0
    ndir = 0
    committed_any = False
    for op, arg in ops:
        if op == "retain":
            if committed_any:
                m.retain(keep=arg)
        else:
            dirs = []
            for _ in range(arg):
                d = os.path.join(out, f"batch={ndir}")
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
                    fh.write(b"\x00")
                dirs.append(d)
                ndir += 1
            got = m.commit(epoch, dirs, replace=(op == "replace"))
            assert got == epoch
            # replaying the same (and any earlier) epoch is a no-op
            assert m.commit(epoch, dirs) == epoch
            if epoch > 0:
                assert m.commit(epoch - 1, dirs) == epoch
            epoch += 1
            committed_any = True
        if committed_any:
            cur = m.current_version()
            assert cur is not None and cur in m.versions()
            for v in m.versions():  # every RETAINED version fully scannable
                for d in m.resolve(v):
                    assert os.path.isdir(d), (v, d)


# ---------------------------------------------------------------------------
# Multi-writer fencing (VERDICT r9 #6): two refresh jobs with independent
# epoch counters share one output_dir; neither may lose the other's dirs.
# Pure filesystem metadata — no Spark session needed.
# ---------------------------------------------------------------------------


def _mkdirs(out, names):
    dirs = []
    for n in names:
        d = os.path.join(out, f"batch={n}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
            fh.write(b"\x00")
        dirs.append(d)
    return dirs


def test_two_writer_interleaved_commits_no_lost_update(tmp_path):
    """Writer A and writer B number epochs independently (two streaming
    queries). The classic lost update: B reads CURRENT, A commits, B
    commits a manifest built from the stale read that drops A's dirs.
    With the lock + epoch-CAS, every interleaving must preserve ALL
    committed dirs; a writer whose epoch number was overtaken gets a
    fresh version rather than a silent skip."""
    out = str(tmp_path / "table")
    a = VersionedTableManifest(out)
    b = VersionedTableManifest(out)
    (da0,) = _mkdirs(out, ["a-0"])
    (db0,) = _mkdirs(out, ["b-0"])
    (da1,) = _mkdirs(out, ["a-1"])
    (db1,) = _mkdirs(out, ["b-1"])

    assert a.commit(0, [da0]) == 0
    # B's epoch 0 is NOT a replay of A's epoch 0 (different dirs): it
    # must land as a new version, not be skipped
    v = b.commit(0, [db0])
    assert v == 1
    assert set(b.resolve()) == {da0, db0}
    # A's epoch 1 was overtaken by B's commit (cur=1): still lands
    assert a.commit(1, [da1]) == 2
    assert b.commit(1, [db1]) == 3
    assert set(a.resolve()) == {da0, db0, da1, db1}
    # true replays (dirs already visible) are still idempotent no-ops
    assert a.commit(1, [da1]) == 3
    assert b.commit(0, [db0]) == 3
    assert len(a.versions()) == 4


def test_two_writer_concurrent_hammer_all_dirs_survive(tmp_path):
    """8 rounds x 2 threads racing commit() with overlapping epoch
    numbers: the final CURRENT must reference every committed dir."""
    out = str(tmp_path / "table")
    writers = {
        "a": VersionedTableManifest(out),
        "b": VersionedTableManifest(out),
    }
    all_dirs = {w: _mkdirs(out, [f"{w}-{i}" for i in range(8)]) for w in writers}
    errs: list = []

    def run(w):
        try:
            for i, d in enumerate(all_dirs[w]):
                writers[w].commit(i, [d])
        except Exception as exc:  # pragma: no cover - failure path
            errs.append(exc)

    ts = [threading.Thread(target=run, args=(w,)) for w in writers]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60)
    assert not errs
    final = set(writers["a"].resolve())
    expect = {d for dirs in all_dirs.values() for d in dirs}
    assert final == expect  # no writer lost the other's updates


def test_writer_lock_loud_timeout_and_stale_break(tmp_path):
    out = str(tmp_path / "table")
    m = VersionedTableManifest(out, lock_timeout=0.3, lock_stale_after=9999)
    (d0,) = _mkdirs(out, ["0"])
    os.makedirs(m.versions_dir, exist_ok=True)
    # a live (non-stale) lock held by "another job": the loser fails LOUDLY
    with open(m._lockpath, "w") as fh:
        fh.write("pid=other t=now\n")
    with pytest.raises(TimeoutError, match="concurrent refresh job"):
        m.commit(0, [d0])
    assert m.current_version() is None  # nothing half-committed

    # the same lock, aged past stale_after (crashed writer): broken and
    # the commit proceeds
    stale = VersionedTableManifest(out, lock_timeout=1.0, lock_stale_after=0.05)
    time.sleep(0.1)
    assert stale.commit(0, [d0]) == 0
    assert stale.resolve() == [d0]
    assert not os.path.exists(m._lockpath)  # released after commit


def test_two_process_commit_fencing(tmp_path):
    """The lock's real claim is CROSS-PROCESS (two refresh JOBS, not
    two threads): O_CREAT|O_EXCL and rename are per-filesystem, so the
    same guarantee must hold across process boundaries. Two
    subprocesses race 12 commits each with overlapping epoch numbers;
    every directory must be referenced by the final CURRENT."""
    import subprocess
    import sys
    import textwrap

    out = str(tmp_path / "table")
    for w in ("a", "b"):
        _mkdirs(out, [f"{w}-{i}" for i in range(12)])
    prog = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, {root!r})
        from annotation_service_spark.streaming.refresh import (
            VersionedTableManifest,
        )
        out, w = sys.argv[1], sys.argv[2]
        m = VersionedTableManifest(out)
        for i in range(12):
            m.commit(i, [os.path.join(out, f"batch={{w}}-{{i}}")])
        """
    ).format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen([sys.executable, "-c", prog, out, w])
        for w in ("a", "b")
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    m = VersionedTableManifest(out)
    final = set(m.resolve())
    expect = {
        os.path.join(out, f"batch={w}-{i}")
        for w in ("a", "b")
        for i in range(12)
    }
    assert final == expect
    assert not os.path.exists(m._lockpath)
