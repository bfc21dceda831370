"""Zip-member extraction source (S8).

Reference: loader/loader.go:29-75 pulls a zip into memory and locates
a member by filename suffix. Spark has no native zip codec, so the
scalable shape is: ``binaryFile`` scan (one task per zip — the
distributed analog of the reference's per-file goroutine,
geoloader/geoloader.go:131-152) → ``mapInPandas`` opening the archive
from bytes and yielding the member's CSV rows as Arrow batches.
Each zip stays on one executor; 76 snapshots → 76 parallel tasks.

Corruption semantics mirror the reference's two failure layers:

* **Unreadable archive / member** — the reference fails that one
  dataset's load and the loader continues with the other datasets
  (geoloader logs the error and keeps the previous annotator). Here
  ``on_corrupt="skip"`` (default) drops the archive and counts it in
  ``df.corrupt_archive_acc``; ``"abort"`` raises from the task.
* **Record with the wrong number of columns** — the reference's
  ``ValidateRecord`` returns ``ErrBadRecord`` ("Corrupted Data:
  wrong number of columns") and ``maxBadRecordsPerFile = 0`` makes a
  single one fatal (loader/csv-reader.go:17-19, geolite2v2/g2_test.go
  TestCorruptData pins the message). ``on_corrupt="abort"``
  reproduces that (raising once the per-member count exceeds
  ``max_bad_records``); ``"skip"`` drops the short record and counts
  it in ``df.bad_record_acc``.
"""

from __future__ import annotations

import csv
import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: the reference's exact error text (loader/csv-reader.go:12)
ERR_BAD_RECORD = "Corrupted Data: wrong number of columns"


def zip_member_csv(
    spark: SparkSession,
    zip_glob: str,
    member_suffix: str,
    columns: list[str],
    header: bool = True,
    sep: str = ",",
    add_path: bool = True,
    on_corrupt: str = "skip",
    max_bad_records: int = 0,
) -> DataFrame:
    """Read one CSV member (matched by suffix, loader/loader.go:63-75)
    out of every zip matching ``zip_glob``.

    All member columns come back as strings (callers cast, matching
    the reference's string-record consumers); ``_zip_path`` carries
    the source archive for P7 date extraction. Records with EXTRA
    trailing columns are truncated (14-column locations files consumed
    with 13 names); records with too FEW columns are corrupt — see
    module docstring for ``on_corrupt``. The returned DataFrame
    carries ``corrupt_archive_acc`` / ``bad_record_acc`` accumulator
    attributes; read them after an action.
    """
    if on_corrupt not in ("skip", "abort"):
        raise ValueError(f"on_corrupt must be skip|abort, got {on_corrupt!r}")
    bin_df = spark.read.format("binaryFile").load(zip_glob)

    out_fields = [T.StructField(c, T.StringType()) for c in columns]
    if add_path:
        out_fields.append(T.StructField("_zip_path", T.StringType()))
    out_schema = T.StructType(out_fields)

    ncols = len(columns)
    corrupt_archive_acc = spark.sparkContext.accumulator(0)
    bad_record_acc = spark.sparkContext.accumulator(0)

    def extract(it):
        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(content))
                    names = [n for n in zf.namelist() if n.endswith(member_suffix)]
                except zipfile.BadZipFile as exc:
                    if on_corrupt == "abort":
                        raise ValueError(f"corrupt archive {path}: {exc}") from exc
                    corrupt_archive_acc.add(1)
                    continue
                for name in names:
                    bad_here = 0
                    good: list[list[str]] = []
                    with zf.open(name) as fh:
                        text = io.TextIOWrapper(fh, encoding="utf-8", errors="replace")
                        reader = csv.reader(text, delimiter=sep)
                        for i, rec in enumerate(reader):
                            if header and i == 0:
                                continue
                            if not rec:
                                continue
                            if len(rec) < ncols:
                                bad_here += 1
                                if on_corrupt == "abort" and bad_here > max_bad_records:
                                    raise ValueError(ERR_BAD_RECORD)
                                continue
                            good.append(rec[:ncols])
                    bad_record_acc.add(bad_here)
                    out = pd.DataFrame(good, columns=columns, dtype=str)
                    if add_path:
                        out["_zip_path"] = path
                    yield out

    df = bin_df.select("path", "content").mapInPandas(extract, out_schema)
    df.corrupt_archive_acc = corrupt_archive_acc
    df.bad_record_acc = bad_record_acc
    return df
