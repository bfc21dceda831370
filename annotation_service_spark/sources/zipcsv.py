"""Zip-member extraction source (S8).

Reference: loader/loader.go:29-75 pulls a zip into memory and locates
a member by filename suffix. Spark has no native zip codec, so the
scalable shape is: ``binaryFile`` scan (one task per zip — the
distributed analog of the reference's per-file goroutine,
geoloader/geoloader.go:131-152) → ``mapInPandas`` opening the archive
from bytes and yielding the member's CSV rows as Arrow batches.
Each zip stays on one executor; 76 snapshots → 76 parallel tasks.
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zip_member_csv(
    spark: SparkSession,
    zip_glob: str,
    member_suffix: str,
    columns: list[str],
    header: bool = True,
    sep: str = ",",
    add_path: bool = True,
) -> DataFrame:
    """Read one CSV member (matched by suffix, loader/loader.go:63-75)
    out of every zip matching ``zip_glob``.

    All member columns come back as strings (callers cast, matching
    the reference's string-record consumers); ``_zip_path`` carries
    the source archive for P7 date extraction.
    """
    bin_df = spark.read.format("binaryFile").load(zip_glob)

    out_fields = [T.StructField(c, T.StringType()) for c in columns]
    if add_path:
        out_fields.append(T.StructField("_zip_path", T.StringType()))
    out_schema = T.StructType(out_fields)

    ncols = len(columns)

    def extract(it):
        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(content))
                except zipfile.BadZipFile:
                    continue
                names = [n for n in zf.namelist() if n.endswith(member_suffix)]
                for name in names:
                    with zf.open(name) as fh:
                        out = pd.read_csv(
                            fh,
                            header=0 if header else None,
                            names=columns,
                            usecols=range(ncols),
                            dtype=str,
                            sep=sep,
                            keep_default_na=False,
                        )
                    if add_path:
                        out["_zip_path"] = path
                    yield out

    return bin_df.select("path", "content").mapInPandas(extract, out_schema)
