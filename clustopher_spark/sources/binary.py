"""Binary-file ingestion for multimodal columns.

``spark.read.format("binaryFile")`` turns a directory of media files into
(path, modificationTime, length, content) rows — the distributed loader
that feeds :mod:`clustopher_spark.functions.multimodal`: files land as an
opaque ``binary`` column partitioned by Spark's file listing, so decode /
feature-extract stages parallelize per file with no driver involvement.

Scale notes: the binaryFile source caps single-file size at
``spark.sql.sources.binaryFile.maxLength`` (2 GB default) and is
listing-bound for millions of tiny files — at that shape, pack media into
parquet/sequence containers first (the `documents`-style layout) and keep
this reader for medium-sized originals.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Load files under ``path`` as (id, name, length, content) — id is the
    file stem, the natural join key back to metadata tables."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    stem = F.regexp_replace(name, r"\.[^.]+$", "")
    return raw.select(
        stem.alias("id"),
        name.alias("name"),
        F.col("length"),
        F.col("content"),
    )
