"""Dataset catalog + persistence (reference S5/S6/S7: SaveCompressed /
LoadCompressedSupercluster / ListSavedClusters, cluster/storage.go,
cluster/helpers.go:55-140).

The reference hand-rolls a versioned zstd binary format and encodes
metadata in filenames (``cluster-{n}p-{ts}-{id}.zst``). Spark gets the
versioned, compressed, columnar format natively (zstd parquet), so the
catalog is just a tiny metadata table next to the data directories.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


_EXT_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
    ".tsv": "csv",
}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatching ingest edge (S6 breadth beyond the reference's one
    binary format): parquet / csv / json(lines) / orc, inferred from the
    extension when ``fmt`` is omitted. CSV defaults to header+inferSchema
    unless an explicit ``schema`` is given (always give one in production —
    inference is an extra full scan). Parquet/ORC carry their own schema
    and column-pruned, predicate-pushed scans; CSV/JSON are ingest edges to
    convert from, not to serve from."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _EXT_FORMATS.get(ext, "parquet")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if path.endswith(".tsv"):
            options.setdefault("sep", "\t")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str | None = None, **options) -> None:
    """Format-dispatching export edge (S5 breadth): parquet stays the
    canonical serving layout (zstd, columnar, stats); csv/json/orc exist
    for interchange."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _EXT_FORMATS.get(ext, "parquet")
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        options.setdefault("compression", "zstd")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.format(fmt).options(**options).save(path)


class ClusterCatalog:
    """Directory-backed catalog of saved cluster datasets.

    Layout: ``{root}/{dataset_id}/points/`` (+ optional ``zoom_levels/``)
    with a ``meta.json`` carrying what the reference packed into filenames.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- S5: save ---

    def save(
        self,
        points: DataFrame,
        dataset_id: str | None = None,
        zoom_levels: DataFrame | None = None,
        layout: str = "zorder",
    ) -> str:
        dataset_id = dataset_id or uuid.uuid4().hex[:8]
        path = os.path.join(self.root, dataset_id)
        n = points.count()
        if layout == "zorder" and {"lng", "lat"} <= set(points.columns):
            # Morton-ordered write: row-group stats tight in BOTH axes ->
            # 2-3x fewer groups touched per viewport (tests/test_layout.py)
            from clustopher_spark.sources.layout import write_zordered

            write_zordered(points, os.path.join(path, "points"))
        else:
            (
                points.sortWithinPartitions("lng", "lat")
                .write.mode("overwrite")
                .option("compression", "zstd")
                .parquet(os.path.join(path, "points"))
            )
        if zoom_levels is not None:
            (
                zoom_levels.repartition("zoom")
                .sortWithinPartitions("lng", "lat")
                .write.mode("overwrite")
                .option("compression", "zstd")
                .partitionBy("zoom")
                .parquet(os.path.join(path, "zoom_levels"))
            )
        meta = {
            "dataset_id": dataset_id,
            "num_points": n,
            "created_at": time.strftime("%Y%m%d-%H%M%S"),
            "has_zoom_levels": zoom_levels is not None,
            "columns": points.columns,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        return dataset_id

    # --- S6: load ---

    def load_points(self, dataset_id: str) -> DataFrame:
        # mergeSchema: long-lived datasets accrete metric columns across
        # appended batches; the union schema reads older files with nulls
        # backfilled instead of failing (footer merge costs one listing
        # pass — fine for a per-dataset load, would be a config on a
        # million-file table)
        return self.spark.read.option("mergeSchema", "true").parquet(
            os.path.join(self.root, dataset_id, "points")
        )

    def load_zoom_levels(self, dataset_id: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.root, dataset_id, "zoom_levels")
        )

    # --- S7: catalog scans ---

    def list_datasets(self) -> list[dict]:
        out = []
        for d in sorted(os.listdir(self.root)):
            meta_path = os.path.join(self.root, d, "meta.json")
            if os.path.isfile(meta_path):
                with open(meta_path) as f:
                    out.append(json.load(f))
        return out

    def info(self, dataset_id: str) -> dict:
        with open(os.path.join(self.root, dataset_id, "meta.json")) as f:
            meta = json.load(f)
        size = 0
        for dirpath, _, files in os.walk(os.path.join(self.root, dataset_id)):
            size += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        meta["file_size_bytes"] = size
        return meta

    def as_dataframe(self) -> DataFrame:
        """The catalog itself as a small DataFrame (joinable metadata table)."""
        rows = [
            (m["dataset_id"], m["num_points"], m["created_at"], m["has_zoom_levels"])
            for m in self.list_datasets()
        ]
        return self.spark.createDataFrame(
            rows, "dataset_id string, num_points long, created_at string, has_zoom_levels boolean"
        )
