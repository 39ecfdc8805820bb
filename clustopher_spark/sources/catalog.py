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
    ".xml": "xml",
    # Dispatches to the spark-avro module when its jar is on the
    # classpath (any real cluster); this container's pyspark bundle
    # ships only avro-core, so the format errors here — documented as
    # an environment limitation in COVERAGE.md.
    ".avro": "avro",
}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatching ingest edge (S6 breadth beyond the reference's one
    binary format): parquet / csv / json(lines) / orc / xml (built into
    Spark 4 sql-core) / avro (when the spark-avro jar is deployed),
    inferred from the extension when ``fmt`` is omitted. CSV defaults to
    header+inferSchema unless an explicit ``schema`` is given (always give
    one in production — inference is an extra full scan). Parquet/ORC
    carry their own schema and column-pruned, predicate-pushed scans;
    CSV/JSON/XML are ingest edges to convert from, not to serve from."""
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
    if fmt == "xml":
        options.setdefault("rowTag", "row")
    return reader.format(fmt).options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str | None = None, **options) -> None:
    """Format-dispatching export edge (S5 breadth): parquet stays the
    canonical serving layout (zstd, columnar, stats); csv/json/orc/xml
    exist for interchange."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _EXT_FORMATS.get(ext, "parquet")
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        options.setdefault("compression", "zstd")
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "xml":
        options.setdefault("rootTag", "rows")
        options.setdefault("rowTag", "row")
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

    def _write_dataset(
        self,
        points: DataFrame,
        path: str,
        zoom_levels: DataFrame | None,
        layout: str,
    ) -> int:
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
        return n

    def save(
        self,
        points: DataFrame,
        dataset_id: str | None = None,
        zoom_levels: DataFrame | None = None,
        layout: str = "zorder",
    ) -> str:
        dataset_id = dataset_id or uuid.uuid4().hex[:8]
        path = os.path.join(self.root, dataset_id)
        n = self._write_dataset(points, path, zoom_levels, layout)
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

    # --- snapshot versioning (time travel) ---

    def save_snapshot(
        self,
        dataset_id: str,
        points: DataFrame,
        zoom_levels: DataFrame | None = None,
        layout: str = "zorder",
    ) -> int:
        """Immutable snapshot write: version N lands wholly under
        ``versions/v{N}/`` and only then does ``meta.json`` repoint
        ``latest`` (a single small-file swap — the atomic commit).  Old
        versions are never mutated, so concurrent readers of any pinned
        version are isolated from writers, and a crashed writer leaves at
        worst an unreferenced directory.  The same write-ahead layout
        scheme object-store table formats use, minus the manifest log —
        adequate for whole-snapshot (non-incremental) publication."""
        meta = self._meta(dataset_id)
        version = int(meta.get("latest", 0)) + 1
        vpath = os.path.join(self.root, dataset_id, "versions", f"v{version}")
        n = self._write_dataset(points, vpath, zoom_levels, layout)
        meta.setdefault("dataset_id", dataset_id)
        meta["latest"] = version
        meta.setdefault("history", []).append(
            {
                "version": version,
                "num_points": n,
                "created_at": time.strftime("%Y%m%d-%H%M%S"),
                "has_zoom_levels": zoom_levels is not None,
            }
        )
        meta["num_points"] = n
        meta["columns"] = points.columns
        meta["has_zoom_levels"] = zoom_levels is not None
        tmp = os.path.join(self.root, dataset_id, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.root, dataset_id, "meta.json"))
        return version

    def _meta(self, dataset_id: str) -> dict:
        meta_path = os.path.join(self.root, dataset_id, "meta.json")
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                return json.load(f)
        os.makedirs(os.path.join(self.root, dataset_id), exist_ok=True)
        return {}

    def history(self, dataset_id: str) -> list[dict]:
        return self._meta(dataset_id).get("history", [])

    def vacuum(self, dataset_id: str, keep_last: int = 2) -> list[int]:
        """Delete snapshot directories older than the newest ``keep_last``
        versions (never the latest). Returns the versions removed.
        History entries stay (the commit log is cheap and auditable);
        their ``data_removed`` flag records the GC."""
        import shutil

        meta = self._meta(dataset_id)
        hist = meta.get("history", [])
        if not hist:
            return []
        keep_last = max(1, keep_last)
        keep = {h["version"] for h in hist[-keep_last:]}
        keep.add(int(meta.get("latest", hist[-1]["version"])))
        removed = []
        for h in hist:
            v = h["version"]
            if v in keep or h.get("data_removed"):
                continue
            vpath = os.path.join(self.root, dataset_id, "versions", f"v{v}")
            if os.path.isdir(vpath):
                shutil.rmtree(vpath)
            h["data_removed"] = True
            removed.append(v)
        if removed:
            tmp = os.path.join(self.root, dataset_id, "meta.json.tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, os.path.join(self.root, dataset_id, "meta.json"))
        return removed

    def _resolve(self, dataset_id: str, version: int | None) -> str:
        """Path of a dataset's data root: a pinned snapshot, the latest
        snapshot, or the legacy unversioned layout."""
        meta = self._meta(dataset_id)
        v = version if version is not None else meta.get("latest")
        if v is not None:
            vpath = os.path.join(self.root, dataset_id, "versions", f"v{int(v)}")
            if os.path.isdir(vpath):
                return vpath
            if version is not None:
                raise FileNotFoundError(f"{dataset_id} has no version v{version}")
        return os.path.join(self.root, dataset_id)

    # --- S6: load ---

    def load_points(self, dataset_id: str, version: int | None = None) -> DataFrame:
        # mergeSchema: long-lived datasets accrete metric columns across
        # appended batches; the union schema reads older files with nulls
        # backfilled instead of failing (footer merge costs one listing
        # pass — fine for a per-dataset load, would be a config on a
        # million-file table)
        return self.spark.read.option("mergeSchema", "true").parquet(
            os.path.join(self._resolve(dataset_id, version), "points")
        )

    def load_zoom_levels(self, dataset_id: str, version: int | None = None) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._resolve(dataset_id, version), "zoom_levels")
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
