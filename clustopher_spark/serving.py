"""Serving layer (reference S9/S10: gRPC runner + Gin REST facade,
runner/runner.go, cmd/api/main.go) — a thin stdlib-HTTP JSON API over
cached DataFrames. This is driver-side plumbing, not a Spark operator: each
request parameterizes a pre-materialized zoom-levels query and collects a
small result.

Parity notes:
* LRU of at most ``max_datasets`` loaded datasets with last-access eviction
  (reference runner/runner.go:157-203, W4 argmin-eviction);
* unlike the reference REST hop — which silently drops metadata
  (proto/cluster_service.proto:60-67 carries only metrics) — this API keeps
  metadata end-to-end;
* GET /metadata computes the summary from the SAME cached cluster set
  instead of re-clustering per request (the reference recomputes,
  runner/runner.go:294).
"""

from __future__ import annotations

import json
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clustopher_spark.engine import Clustopher
from clustopher_spark.operators.cluster import ClusterOptions
from clustopher_spark.sources.catalog import ClusterCatalog
from clustopher_spark.sources.generators import generate_test_points


class DatasetCache:
    """LRU of loaded (materialized) datasets, reference-default capacity 5.

    ``ttl_sec`` additionally enables the reference's idle-dataset sweeper
    (runner/runner.go:113-140 — a 30-min ticker unloads datasets nobody
    has touched for the TTL): a daemon thread evicts entries idle longer
    than the TTL, releasing their cached zoom frames. Capacity-based LRU
    alone bounds memory but holds the last ``max_datasets`` pyramids
    forever on an idle server; the TTL returns that memory to executors.
    Off by default (None) — serving tests and steady-traffic deployments
    rely on residency; the reference default is 30 min."""

    def __init__(self, max_datasets: int = 5, ttl_sec: float | None = None):
        self.max_datasets = max_datasets
        self.ttl_sec = ttl_sec
        self._entries: OrderedDict[str, Clustopher] = OrderedDict()
        self._last_access: dict[str, float] = {}
        self._lock = threading.Lock()
        # per-key load gate: concurrent misses for the same dataset share
        # ONE loader invocation (the load is a full pyramid read + serve
        # cache build — letting N requests race it N-plicates the most
        # expensive operation in the serving tier)
        self._loading: dict[str, threading.Event] = {}
        self._sweeper_stop: threading.Event | None = None
        if ttl_sec is not None:
            self._sweeper_stop = threading.Event()
            t = threading.Thread(
                target=self._sweep_loop, name="dataset-cache-ttl", daemon=True
            )
            t.start()

    def _sweep_loop(self) -> None:
        # sample at ttl/10 (min 1 s): an entry is evicted at most 10%
        # past its TTL, and the sweep itself is an O(entries) dict walk
        interval = max(1.0, (self.ttl_sec or 0) / 10.0)
        while not self._sweeper_stop.wait(interval):
            self.sweep_idle()

    def sweep_idle(self) -> int:
        """Evict every entry idle longer than the TTL; returns how many.
        Public so a deployment without the daemon (or a test) can drive
        the sweep explicitly."""
        if self.ttl_sec is None:
            return 0
        cutoff = time.monotonic() - self.ttl_sec
        doomed: list[Clustopher] = []
        with self._lock:
            for key in [
                k for k, ts in self._last_access.items() if ts <= cutoff
            ]:
                entry = self._entries.pop(key, None)
                self._last_access.pop(key, None)
                if entry is not None:
                    doomed.append(entry)
        # release outside the lock: unpersist is a JVM call and a slow
        # block-manager round-trip must not stall concurrent gets
        for entry in doomed:
            entry.release_caches()
        return len(doomed)

    def close(self) -> None:
        """Stop the TTL sweeper thread (tests / orderly shutdown)."""
        if self._sweeper_stop is not None:
            self._sweeper_stop.set()

    def get(self, dataset_id: str, loader) -> Clustopher:
        while True:
            with self._lock:
                if dataset_id in self._entries:
                    self._entries.move_to_end(dataset_id)  # refresh last-accessed
                    self._last_access[dataset_id] = time.monotonic()
                    return self._entries[dataset_id]
                gate = self._loading.get(dataset_id)
                if gate is None:
                    gate = threading.Event()
                    self._loading[dataset_id] = gate
                    owns_load = True
                else:
                    owns_load = False
            if owns_load:
                try:
                    engine = loader(dataset_id)
                except BaseException:
                    with self._lock:
                        self._loading.pop(dataset_id, None)
                    gate.set()  # wake waiters; one of them retries the load
                    raise
                with self._lock:
                    self._entries[dataset_id] = engine
                    self._entries.move_to_end(dataset_id)
                    self._last_access[dataset_id] = time.monotonic()
                    while len(self._entries) > self.max_datasets:
                        key, evicted = self._entries.popitem(last=False)
                        self._last_access.pop(key, None)
                        if evicted._zoom_levels is not None:
                            evicted._zoom_levels.unpersist()
                    self._loading.pop(dataset_id, None)
                gate.set()
                return engine
            # another request is loading this dataset — wait, then re-check
            # (cache hit on success, or take over the load on its failure)
            gate.wait()


class VectorService:
    """ANN search over persisted IVF-PQ indexes (LLM-pipeline extension
    surface — the reference has no vector queries). One root directory
    holds many indexes (``{root}/{index_id}/meta.json``); opened instances
    are cached — they hold only the small quantizers, the encoded lists
    stay on disk and every search partition-prunes to the probed lists.

    Query ids are synthetic negatives (``-(i+1)``), so the rerank's
    self-exclusion (``query_id != neighbor_id``) can never suppress a
    legitimate neighbor of a non-negative corpus id."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # index_id -> (IVFPQIndex, vec spark-type, dim)
        self._indexes: dict[str, tuple] = {}
        self._lock = threading.Lock()
        # ThreadingHTTPServer runs handlers concurrently, and append/delete
        # both read-modify-write the index's meta.json — without a
        # per-index writer lock, interleaved writers restore each other's
        # stale watermark snapshots (a committed append's batch dir would
        # fail the committed filter, or a delete's tombstone would be
        # silently un-applied). Same pattern as ClusterService._update_locks.
        self._write_locks: dict[str, threading.Lock] = {}
        # index_id -> (meta.json mtime, listing row) — list_indexes must
        # not re-parse the full quantizer arrays on every GET
        self._list_cache: dict[str, tuple[float, dict]] = {}

    def _write_lock(self, index_id: str) -> threading.Lock:
        with self._lock:
            return self._write_locks.setdefault(index_id, threading.Lock())

    def _index(self, index_id: str):
        import os

        with self._lock:
            hit = self._indexes.get(index_id)
        if hit is not None:
            return hit
        from clustopher_spark.sources.vector_index import IVFPQIndex

        path = os.path.join(self.root, index_id)
        if not os.path.isfile(os.path.join(path, "meta.json")):
            raise FileNotFoundError(index_id)
        idx = IVFPQIndex(self.spark, path)
        meta = idx._meta()
        # the stored vector type (array<float> vs array<double>) decides
        # what incoming JSON vectors are cast to; schema-only read
        vec_type = idx._table(meta).schema["vec"].dataType.simpleString()
        dim = len(meta["centroids"][0])
        entry = (idx, vec_type, dim)
        with self._lock:
            self._indexes[index_id] = entry
        return entry

    def _frame(self, ids, vectors, meta, vec_type, dim):
        bad = [i for i, v in enumerate(vectors) if len(v) != dim]
        if bad:
            raise ValueError(
                f"vector {bad[0]} has dim {len(vectors[bad[0]])}, index has {dim}"
            )
        df = self.spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, vectors)],
            f"{meta['id_col']} long, {meta['vec_col']} array<double>",
        )
        return df.withColumn(
            meta["vec_col"], F.col(meta["vec_col"]).cast(vec_type)
        )

    def list_indexes(self) -> list[dict]:
        import os

        out = []
        for d in sorted(os.listdir(self.root)) if os.path.isdir(self.root) else []:
            meta_path = os.path.join(self.root, d, "meta.json")
            if not os.path.isfile(meta_path):
                continue
            mtime = os.path.getmtime(meta_path)
            cached = self._list_cache.get(d)
            if cached is not None and cached[0] == mtime:
                out.append(cached[1])
                continue
            with open(meta_path) as f:
                meta = json.load(f)
            row = {
                "index_id": d,
                "n_lists": meta["n_lists"],
                "dim": len(meta["centroids"][0]),
                "last_batch": meta.get("last_batch", -1),
            }
            with self._lock:
                self._list_cache[d] = (mtime, row)
            out.append(row)
        return out

    def stats(self, index_id: str) -> dict:
        """List-occupancy balance (the IVF skew signal; see
        IVFPQIndex.list_stats)."""
        idx, _, _ = self._index(index_id)
        return idx.list_stats()

    def drift(self, index_id: str) -> list[dict]:
        """Per-batch quantization drift vs the bootstrap baseline (the
        rebuild-when signal from streaming maintenance); empty when the
        index has no drift log (built offline, never streamed into)."""
        import os

        idx, _, _ = self._index(index_id)
        if not os.path.isdir(os.path.join(idx.root, "drift")):
            return []
        from clustopher_spark.streaming.vector_index import drift_report

        return [r.asDict() for r in drift_report(self.spark, idx.root).collect()]

    def search(self, index_id: str, vectors, k: int = 5, n_probe: int = 4) -> dict:
        if not vectors:
            raise ValueError("vectors required")
        idx, vec_type, dim = self._index(index_id)
        meta = idx._meta()
        q = self._frame(
            [-(i + 1) for i in range(len(vectors))], vectors, meta, vec_type, dim
        )
        rows = idx.topk(q, k=int(k), n_probe=int(n_probe)).collect()
        return {
            "hits": [
                {
                    "query_idx": int(-r.query_id) - 1,
                    "neighbor_id": r.neighbor_id,
                    "cos_sim": r.cos_sim,
                    "rank": r.rank,
                }
                for r in rows
            ]
        }

    def append(self, index_id: str, ids, vectors, batch_id: int) -> dict:
        if not ids or len(ids) != len(vectors):
            raise ValueError("ids and vectors must be same-length and non-empty")
        idx, vec_type, dim = self._index(index_id)
        with self._write_lock(index_id):
            meta = idx._meta()
            batch = self._frame(ids, vectors, meta, vec_type, dim)
            ok = idx.append(batch, int(batch_id))
        return {"appended": bool(ok), "rows": len(ids) if ok else 0}

    def delete(self, index_id: str, ids, batch_id: int) -> dict:
        """Tombstone ids (idempotent per batch id); physically purged at
        the next compact — the serving right-to-be-forgotten."""
        if not ids:
            raise ValueError("ids required")
        idx, _, _ = self._index(index_id)
        with self._write_lock(index_id):
            ok = idx.delete([int(i) for i in ids], int(batch_id))
        return {"deleted": bool(ok), "rows": len(ids) if ok else 0}


def _json_row(row) -> dict:
    """Row -> JSON-safe dict (timestamps/dates to ISO strings)."""
    out = {}
    for k, v in row.asDict().items():
        out[k] = v.isoformat() if hasattr(v, "isoformat") else v
    return out


class TableService:
    """Copy-on-write MERGE tables over HTTP (/api/tables): listing,
    commit history, manifest-pruned point lookup, CDC feed reads, live
    merge commits, and MAINTAINED VIEWS (create/refresh/read — the CDC
    loop's serve leg: a dashboard GET reads a standing O(groups)
    aggregate kept current by draining the change stream, instead of
    recomputing per request). One root holds many tables
    (``{root}/{table_id}/meta.json``; views live under each table's
    ``_views/`` with a persisted spec) — the serving face of
    sources/merge_table.py, mirroring how /api/vectors fronts the ANN
    index and /api/clusters the pyramid."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._tables: dict[str, object] = {}
        self._lock = threading.Lock()
        # merges read-modify-write meta.json; concurrent HTTP writers on
        # one table need the same per-resource writer lock VectorService
        # uses (interleaved commits would restore each other's stale
        # watermark/version snapshots)
        self._write_locks: dict[str, threading.Lock] = {}

    def _write_lock(self, table_id: str) -> threading.Lock:
        with self._lock:
            return self._write_locks.setdefault(table_id, threading.Lock())

    def _table(self, table_id: str):
        import os

        with self._lock:
            hit = self._tables.get(table_id)
        if hit is not None:
            return hit
        from clustopher_spark.sources.merge_table import MergeTable

        path = os.path.join(self.root, table_id)
        if not os.path.isfile(os.path.join(path, "meta.json")):
            raise FileNotFoundError(table_id)
        t = MergeTable(self.spark, path)
        with self._lock:
            self._tables[table_id] = t
        return t

    def list_tables(self) -> list[dict]:
        import os

        out = []
        for d in sorted(os.listdir(self.root)) if os.path.isdir(self.root) else []:
            mp = os.path.join(self.root, d, "meta.json")
            if not os.path.isfile(mp):
                continue
            with open(mp) as f:
                meta = json.load(f)
            last = meta["history"][-1]
            out.append(
                {
                    "table_id": d,
                    "latest": meta["latest"],
                    "key_cols": meta["key_cols"],
                    "rows": last["rows"],
                    "files": last["files"],
                    "last_batch": meta.get("last_batch", -1),
                }
            )
        return out

    def history(self, table_id: str) -> list[dict]:
        return self._table(table_id).history()

    def stats(self, table_id: str) -> dict:
        """Layout-health telemetry (key-range overlap — the compact-when
        signal; see MergeTable.stats)."""
        return self._table(table_id).stats()

    def lookup(self, table_id: str, key, version=None) -> dict:
        """Point lookup by leading key: the manifest's key-range stats
        choose the files that can hold the key, so the read is
        O(files-holding-key) — the same pruning a merge uses, surfaced
        as the serving GET."""
        import os

        t = self._table(table_id)
        meta = t._meta()
        v = int(version) if version is not None else int(meta["latest"])
        entries = t._manifest(v)
        if not entries:
            return {"rows": [], "files_scanned": 0}
        typed = next((e for e in entries if e["min_key"] is not None), None)
        k = type(typed["min_key"])(key) if typed is not None else key
        # THE pruning predicate (MergeTable.prune_entries) — shared with
        # scan()/merge() so the serving path can never drift from it
        hits = type(t).prune_entries(entries, lo=k, hi=k)
        if not hits:
            return {"rows": [], "files_scanned": 0}
        # versioned-schema read: post-evolution manifests mix files with
        # different physical schemas; the explicit schema NULL-fills
        df = t._read_files(hits, v)
        rows = df.filter(F.col(meta["key_cols"][0]) == F.lit(k)).limit(100).collect()
        return {"rows": [_json_row(r) for r in rows], "files_scanned": len(hits)}

    def changes(self, table_id: str, since: int, to=None, limit: int = 1000) -> dict:
        """The recorded change feed for (since, to] — the CDC poll a
        downstream sync consumes. ``total`` is exact; rows are capped at
        ``limit`` (a JSON response is not the bulk path — read the
        changes/ parquet directly for that)."""
        t = self._table(table_id)
        cdf = t.changes(int(since), int(to) if to is not None else None)
        # one scan, not count()+collect(): fetch limit+1 rows — total is
        # exact when the feed fits, else reported as a lower bound with
        # has_more (the bulk path reads the changes/ parquet directly)
        limit = int(limit)
        rows = cdf.limit(limit + 1).collect()
        has_more = len(rows) > limit
        rows = rows[:limit]
        return {
            "total": len(rows) if not has_more else None,
            "has_more": has_more,
            "rows": [_json_row(r) for r in rows],
        }

    # --- maintained views (the CDC loop's serve leg) ---

    _VIEW_KINDS = ("sum", "minmax", "topk", "distinct")

    def _views_dir(self, table_id: str) -> str:
        import os

        self._table(table_id)  # 404 before any path is created
        return os.path.join(self.root, table_id, "_views")

    @staticmethod
    def _check_view_id(view_id: str) -> None:
        import re

        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9_-]{0,63}", view_id or ""):
            raise ValueError(
                "view_id must be 1-64 chars of [A-Za-z0-9_-] starting "
                "alphanumeric"
            )

    def _view_handle(self, table_id: str, view_id: str, spec: dict):
        import os

        from clustopher_spark.streaming.ivm_view import (
            MaintainedDistinctView,
            MaintainedMinMaxView,
            MaintainedTopKView,
            MaintainedView,
        )

        vroot = os.path.join(self._views_dir(table_id), view_id)
        kind = spec["kind"]
        if kind == "sum":
            return MaintainedView(
                self.spark, vroot, spec["group_cols"], spec["sum_cols"]
            )
        if kind == "minmax":
            return MaintainedMinMaxView(
                self.spark, vroot, spec["group_cols"], spec["value_col"]
            )
        if kind == "distinct":
            return MaintainedDistinctView(
                self.spark, vroot, spec["group_cols"], spec["value_col"]
            )
        return MaintainedTopKView(
            self.spark, vroot, spec["group_cols"], spec["value_col"],
            int(spec["k"]),
        )

    def _view_spec(self, table_id: str, view_id: str) -> dict:
        import os

        self._check_view_id(view_id)
        path = os.path.join(self._views_dir(table_id), view_id, "spec.json")
        if not os.path.isfile(path):
            raise FileNotFoundError(f"{table_id}/{view_id}")
        with open(path) as f:
            return json.load(f)

    def create_view(self, table_id: str, view_id: str, spec: dict) -> dict:
        """Create + bootstrap a durable maintained view over the table —
        kind 'sum' (count+sum per group), 'minmax' (count/MIN/MAX),
        'topk' (count + k largest values), or 'distinct' (count +
        COUNT(DISTINCT value), maintained through the invertible support
        relation). The spec persists next to the
        view so any later process can refresh it; refresh() drains the
        table's CDC stream exactly-once through the commit-version
        watermark, so a dashboard GET reads a standing aggregate instead
        of recomputing per request (the reference recomputes —
        cluster/helpers.go)."""
        import os

        self._check_view_id(view_id)
        t = self._table(table_id)
        kind = spec.get("kind")
        if kind not in self._VIEW_KINDS:
            raise ValueError(f"kind must be one of {list(self._VIEW_KINDS)}")
        cols = set(t._meta().get("columns") or t.read().columns)
        group_cols = spec.get("group_cols") or []
        if not group_cols or not set(group_cols) <= cols:
            raise ValueError(f"group_cols must be non-empty table columns ({sorted(cols)})")
        clean = {"kind": kind, "group_cols": list(group_cols)}
        if kind == "sum":
            sum_cols = spec.get("sum_cols") or {}
            if not sum_cols or not set(sum_cols) <= cols:
                raise ValueError("sum_cols must map existing table columns to view names")
            # validate the VALUES too (the view's output columns): a name
            # colliding with a group col, the count col, or another sum
            # col would bootstrap a view with duplicate/ambiguous columns
            # instead of 400-ing here; and a non-numeric source would
            # silently cast to NULL under the default decimal sum_cast —
            # both are create-time errors, not broken views
            outs = list(sum_cols.values())
            reserved = set(group_cols) | {"n_rows"}
            colliding = sorted(
                {o for o in outs if o in reserved or outs.count(o) > 1}
            )
            if colliding:
                raise ValueError(
                    f"sum_cols output name(s) {colliding} collide with "
                    "group_cols, the count column 'n_rows', or each other"
                )
            from pyspark.sql.types import NumericType

            sch = t._schema(int(t._meta()["latest"]))
            dtypes = {
                f.name: f.dataType
                for f in (sch.fields if sch is not None else t.read().schema.fields)
            }
            non_numeric = sorted(
                src
                for src in sum_cols
                if not isinstance(dtypes.get(src), NumericType)
            )
            if non_numeric:
                raise ValueError(
                    f"sum_cols source column(s) {non_numeric} are not "
                    "numeric — summing them would cast every value to NULL"
                )
            clean["sum_cols"] = dict(sum_cols)
        else:
            value_col = spec.get("value_col")
            if value_col not in cols:
                raise ValueError(f"value_col must be a table column ({sorted(cols)})")
            clean["value_col"] = value_col
            if kind == "topk":
                k = int(spec.get("k", 0))
                if k < 1:
                    raise ValueError("k must be >= 1")
                clean["k"] = k
        vroot = os.path.join(self._views_dir(table_id), view_id)
        with self._write_lock(f"{table_id}/_views/{view_id}"):
            # existence check under the lock: two concurrent creates of
            # the same id would otherwise both pass and the second would
            # silently overwrite the first's definition
            if os.path.isfile(os.path.join(vroot, "spec.json")):
                raise ValueError(f"view '{view_id}' already exists")
            view = self._view_handle(table_id, view_id, clean)
            view.bootstrap(t)
            with open(os.path.join(vroot, "spec.json"), "w") as f:
                json.dump(clean, f)
        return {"view_id": view_id, **clean, **view._meta()}

    def list_views(self, table_id: str) -> list[dict]:
        import os

        vd = self._views_dir(table_id)
        out = []
        for d in sorted(os.listdir(vd)) if os.path.isdir(vd) else []:
            sp = os.path.join(vd, d, "spec.json")
            if not os.path.isfile(sp):
                continue
            with open(sp) as f:
                spec = json.load(f)
            view = self._view_handle(table_id, d, spec)
            out.append({"view_id": d, **spec, **view._meta()})
        return out

    def refresh_view(self, table_id: str, view_id: str) -> dict:
        """Drain the table's CDC stream through the view (availableNow).
        Safe concurrent to merges (the stream reads only published
        feeds); per-view lock serializes concurrent refreshes of the
        same view (they would race its meta repoint)."""
        import os

        spec = self._view_spec(table_id, view_id)
        view = self._view_handle(table_id, view_id, spec)
        with self._write_lock(f"{table_id}/_views/{view_id}"):
            view.maintain(
                os.path.join(self.root, table_id),
                query_name=f"view_refresh_{table_id}_{view_id}",
            )
        return {"view_id": view_id, **view._meta()}

    def read_view(self, table_id: str, view_id: str, limit: int = 1000) -> dict:
        """The standing aggregate, served: O(groups) read of the view's
        current version — no table scan, no recompute."""
        from decimal import Decimal

        spec = self._view_spec(table_id, view_id)
        view = self._view_handle(table_id, view_id, spec)
        rows = view.read().limit(int(limit) + 1).collect()
        has_more = len(rows) > int(limit)
        out = []
        for r in rows[: int(limit)]:
            d = _json_row(r)
            out.append(
                {k: float(v) if isinstance(v, Decimal) else v for k, v in d.items()}
            )
        return {
            "view_id": view_id,
            **view._meta(),
            "has_more": has_more,
            "rows": out,
        }

    def merge(self, table_id: str, rows, batch_id: int, op_col: str | None = None) -> dict:
        """Live merge commit from JSON rows (idempotent per batch id).
        Rows are parsed as JSON then cast column-by-column to the table's
        types (timestamps arrive as ISO strings), so a type-mangled row
        fails loudly instead of committing corrupt data."""
        if not rows:
            raise ValueError("rows required")
        t = self._table(table_id)
        schema = t.read().schema
        raw = self.spark.read.json(
            self.spark.sparkContext.parallelize([json.dumps(r) for r in rows], 1)
        )
        cols = []
        for f in schema.fields:
            if f.name not in raw.columns:
                raise ValueError(f"missing column {f.name}")
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        # schema evolution is an engine-level operation (MergeTable.merge
        # with a widened source); over HTTP an unknown field is far more
        # likely a typo than an intentional new column — reject loudly
        # rather than silently dropping it (or silently widening the table)
        known = set(schema.fieldNames()) | ({op_col} if op_col else set())
        unknown = sorted(c for c in raw.columns if c not in known)
        if unknown:
            raise ValueError(
                f"unknown column(s) {unknown} — schema evolution is not "
                "supported over HTTP; use MergeTable.merge with a widened "
                "source"
            )
        if op_col is not None:
            if op_col not in raw.columns:
                raise ValueError(f"missing op column {op_col}")
            cols.append(F.col(op_col).cast("string").alias(op_col))
        batch = raw.select(*cols)
        # ONE aggregate job validates the whole request (the batch is
        # request-sized, but each Spark job pays the scheduling floor, so
        # per-request validation must not fan out into several):
        # * mangled values, loudly as a 400 with the offending columns
        #   named: probe with try_cast (ANSI mode's plain cast would throw
        #   a raw engine error mid-plan; non-ANSI clusters would silently
        #   null — this check is exact under both);
        # * MERGE's one-source-row-per-target-row precondition: a batch
        #   with two rows for the same key would commit duplicate keys and
        #   a corrupt change feed. HTTP carries no ordering column to
        #   break the tie, so reject rather than silently pick a winner.
        #   Checked post-cast ('5' and 5 are the same key once cast) via
        #   count - count_distinct over the CASTED key struct — a struct
        #   is non-null even when its fields are, so null-keyed rows
        #   count correctly (merge()'s own validation rejects them next).
        key_cols = t._meta()["key_cols"]
        types = {f.name: f.dataType for f in schema.fields}
        probe = raw.select(
            *[
                F.sum(
                    (F.col(f.name).isNotNull() & F.col(f.name).try_cast(f.dataType).isNull()).cast("int")
                ).alias(f.name)
                for f in schema.fields
            ],
            (
                F.count(F.lit(1))
                - F.count_distinct(
                    F.struct(*[F.col(k).try_cast(types[k]) for k in key_cols])
                )
            ).alias("_n_dup_keys"),
        ).collect()[0]
        bad = [c for c in schema.fieldNames() if (probe[c] or 0) > 0]
        if bad:
            raise ValueError(
                f"column(s) {bad} contain values that do not cast to the "
                "table's types — request rejected, nothing committed"
            )
        dup = int(probe["_n_dup_keys"] or 0)
        if dup:
            raise ValueError(
                f"batch contains {dup} duplicate row(s) for the same key "
                f"{key_cols} — MERGE requires one source row per target "
                "key; request rejected, nothing committed"
            )
        with self._write_lock(table_id):
            v = t.merge(batch, op_col=op_col, batch_id=int(batch_id))
        return {"merged": v is not None, "version": v}


class ClusterService:
    """The RPC surface (List/Create/Update/GetClusters/GetMetadata) minus
    HTTP. ``vector_root`` additionally exposes the ANN index surface
    (:class:`VectorService`) under /api/vectors; ``table_root`` the MERGE
    table surface (:class:`TableService`) under /api/tables."""

    def __init__(self, spark: SparkSession, catalog_root: str,
                 opts: ClusterOptions = ClusterOptions(radius=100.0, min_points=2, max_zoom=10),
                 vector_root: str | None = None,
                 table_root: str | None = None,
                 dataset_ttl_sec: float | None = None):
        self.spark = spark
        self.catalog = ClusterCatalog(spark, catalog_root)
        # dataset_ttl_sec enables the reference's idle-dataset sweeper
        # (30 min there); None keeps capacity-only LRU
        self.cache = DatasetCache(ttl_sec=dataset_ttl_sec)
        self.opts = opts
        self.vectors = (
            VectorService(spark, vector_root) if vector_root is not None else None
        )
        self.tables = (
            TableService(spark, table_root) if table_root is not None else None
        )
        self._update_locks: dict[str, threading.Lock] = {}
        self._update_locks_guard = threading.Lock()

    def _load(self, dataset_id: str) -> Clustopher:
        import os

        if not os.path.isfile(os.path.join(self.catalog.root, dataset_id, "meta.json")):
            raise FileNotFoundError(dataset_id)
        points = self.catalog.load_points(dataset_id)
        metric_cols = [c for c in points.columns if c in ("value", "size", "sales", "customers", "elevation")]
        meta_cols = [c for c in points.columns if c in ("category", "region", "city")]
        eng = Clustopher(points, metric_cols, meta_cols, self.opts)
        try:
            zl = self.catalog.load_zoom_levels(dataset_id)
            # the pyramid is the source of truth for which metrics were
            # materialized — the points table may carry MORE numeric
            # columns than the build used, and an update against a
            # mismatched metric set would reference absent sum_ columns
            eng.metric_cols = [c[4:] for c in zl.columns if c.startswith("sum_")]
            eng._zoom_levels = zl
            # per-zoom cached frames: deep zooms serve through the
            # driver-side tile LRU (first viewport touching a coarse tile
            # pays one Spark fetch; every later overlapping viewport is a
            # pandas mask, ~2 ms)
            zl = zl.cache()  # warm the two startup passes below
            eng.cache_zoom_frames()
            # coarse zooms into driver memory: sub-ms viewport serving
            eng.build_serve_cache()
            # the union cache fed the two passes above; serving reads the
            # per-zoom frames from here on — holding it too would pin a
            # second full copy of the pyramid in executor storage
            zl.unpersist()
        except Exception:
            pass  # no materialized pyramid; fall back to on-the-fly clustering
        return eng

    def list_clusters(self) -> list[dict]:
        return self.catalog.list_datasets()

    def create_cluster(self, num_points: int) -> dict:
        points = generate_test_points(self.spark, num_points)
        eng = Clustopher(points, ["value", "sales"], ["category", "region"], self.opts)
        t0 = time.perf_counter()
        zoom_levels = eng.materialize()
        dataset_id = self.catalog.save(points, zoom_levels=zoom_levels)
        return {
            "dataset_id": dataset_id,
            "num_points": num_points,
            "build_seconds": round(time.perf_counter() - t0, 2),
        }

    def update_cluster(
        self,
        dataset_id: str,
        add: list[dict] | None = None,
        delete: list[dict] | None = None,
        persist: bool = False,
    ) -> dict:
        """Live ingest through the serving tier: append/delete points on a
        loaded dataset via the engine's dispatching incremental update
        (the reference can only reload whole datasets). ``add`` rows carry
        the dataset's point columns (id/lng/lat required; absent columns
        become nulls); ``delete`` rows carry (id, lng, lat). With
        ``persist`` the advanced corpus + pyramid land as a new immutable
        catalog snapshot. Updates to one dataset serialize on a per-
        dataset lock; concurrent reads see either the old or new version
        (the engine swaps its pyramid reference atomically)."""
        add, delete = add or [], delete or []
        for r in add:
            if not {"id", "lng", "lat"} <= r.keys():
                raise ValueError("each added point needs id, lng, lat")
        for r in delete:
            if not {"id", "lng", "lat"} <= r.keys():
                raise ValueError("each deletion needs id, lng, lat")
        eng = self.cache.get(dataset_id, self._load)
        with self._update_locks_guard:
            lock = self._update_locks.setdefault(dataset_id, threading.Lock())
        with lock:
            if eng._zoom_levels is None:
                eng.materialize()
            schema = eng.points.schema
            import pandas as pd

            if add:
                raw = self.spark.createDataFrame(pd.DataFrame(add))
                adds = raw.select(
                    *[
                        (
                            F.col(f.name).cast(f.dataType)
                            if f.name in raw.columns
                            else F.lit(None).cast(f.dataType)
                        ).alias(f.name)
                        for f in schema.fields
                    ]
                )
            else:
                adds = self.spark.createDataFrame([], schema)
            dels = None
            if delete:
                dels = self.spark.createDataFrame(pd.DataFrame(delete)).select(
                    F.col("id").cast("long"),
                    F.col("lng").cast("double"),
                    F.col("lat").cast("double"),
                )
            stats: dict = {}
            eng.update(adds, points_deleted=dels, stats=stats)
            version = None
            if persist:
                version = self.catalog.save_snapshot(
                    dataset_id, eng.points, eng._zoom_levels
                )
            return {
                "dataset_id": dataset_id,
                "added": len(add),
                "deleted": len(delete),
                "plan": stats.get("path"),
                "num_points": eng.points.count(),
                "version": version,
            }

    def get_clusters(self, dataset_id: str, zoom: int, west, south, east, north) -> list[dict]:
        eng = self.cache.get(dataset_id, self._load)
        pdf = eng.get_clusters_local(west, south, east, north, zoom)
        metric_cols = [c for c in pdf.columns if c.startswith("sum_")]
        return [
            {
                "id": int(r["cluster_id"]),
                "lng": float(r["lng"]),
                "lat": float(r["lat"]),
                "count": int(r["point_count"]),
                "is_cluster": bool(r["is_cluster"]),
                "metrics": {c[4:]: float(r[c]) for c in metric_cols},
            }
            for _, r in pdf.iterrows()
        ]

    def get_metadata(self, dataset_id: str, zoom: int, west, south, east, north) -> dict:
        eng = self.cache.get(dataset_id, self._load)
        counts, stats, dist = eng.get_metadata_summary(west, south, east, north, zoom)
        c = counts.collect()[0]
        out = {
            "total_points": c.total_points,
            "num_clusters": c.num_clusters,
            "num_single_points": c.num_single_points,
            "metrics": {},
            "distributions": {},
        }
        if stats is not None:
            for r in stats.collect():
                out["metrics"][r.metric] = {
                    "min": r.min, "max": r.max, "sum": r.sum, "average": r.average
                }
        if dist is not None:
            for r in dist.collect():
                out["distributions"].setdefault(r.key, {})[r.value] = r.percentage
        return out


def make_handler(service: ClusterService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if parts == ["api", "clusters"]:
                    return self._json(service.list_clusters())
                if parts == ["api", "vectors"]:
                    if service.vectors is None:
                        return self._json(
                            {"error": "vector serving not configured"}, 404
                        )
                    return self._json(service.vectors.list_indexes())
                if (
                    len(parts) == 4
                    and parts[:2] == ["api", "vectors"]
                    and parts[3] in ("drift", "stats")
                ):
                    if service.vectors is None:
                        return self._json(
                            {"error": "vector serving not configured"}, 404
                        )
                    if parts[3] == "stats":
                        return self._json(service.vectors.stats(parts[2]))
                    return self._json(service.vectors.drift(parts[2]))
                if parts[:2] == ["api", "tables"]:
                    if service.tables is None:
                        return self._json(
                            {"error": "table serving not configured"}, 404
                        )
                    if parts == ["api", "tables"]:
                        return self._json(service.tables.list_tables())
                    if len(parts) == 4 and parts[3] == "history":
                        return self._json(service.tables.history(parts[2]))
                    if len(parts) == 4 and parts[3] == "stats":
                        return self._json(service.tables.stats(parts[2]))
                    if len(parts) == 4 and parts[3] == "lookup":
                        return self._json(
                            service.tables.lookup(
                                parts[2], q["key"], version=q.get("version")
                            )
                        )
                    if len(parts) == 4 and parts[3] == "changes":
                        return self._json(
                            service.tables.changes(
                                parts[2],
                                since=int(q.get("since", 0)),
                                to=q.get("to"),
                                limit=int(q.get("limit", 1000)),
                            )
                        )
                    if len(parts) == 4 and parts[3] == "views":
                        return self._json(service.tables.list_views(parts[2]))
                    if len(parts) == 5 and parts[3] == "views":
                        return self._json(
                            service.tables.read_view(
                                parts[2], parts[4],
                                limit=int(q.get("limit", 1000)),
                            )
                        )
                    return self._json({"error": "not found"}, 404)
                if len(parts) == 3 and parts[:2] == ["api", "clusters"]:
                    return self._json(
                        service.get_clusters(
                            parts[2], int(q["zoom"]), float(q["west"]),
                            float(q["south"]), float(q["east"]), float(q["north"]),
                        )
                    )
                if (
                    len(parts) == 4
                    and parts[:2] == ["api", "clusters"]
                    and parts[3] == "metadata"
                ):
                    return self._json(
                        service.get_metadata(
                            parts[2], int(q["zoom"]), float(q["west"]),
                            float(q["south"]), float(q["east"]), float(q["north"]),
                        )
                    )
                self._json({"error": "not found"}, 404)
            except (KeyError, ValueError) as e:
                self._json({"error": f"bad request: {e}"}, 400)
            except FileNotFoundError:
                self._json({"error": "dataset not found"}, 404)
            except Exception as e:  # surface engine errors as 500, keep serving
                self._json({"error": str(e)[:500]}, 500)

        def do_POST(self):
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError as e:
                return self._json({"error": f"bad request: {e}"}, 400)
            if parts == ["api", "clusters"]:
                try:
                    n = int(payload.get("numPoints", 10000))
                except (TypeError, ValueError) as e:
                    return self._json({"error": f"bad request: {e}"}, 400)
                return self._json(service.create_cluster(n))
            if (
                len(parts) == 4
                and parts[:2] == ["api", "clusters"]
                and parts[3] == "update"
            ):
                try:
                    return self._json(
                        service.update_cluster(
                            parts[2],
                            add=payload.get("add"),
                            delete=payload.get("delete"),
                            persist=bool(payload.get("persist", False)),
                        )
                    )
                except FileNotFoundError:
                    return self._json({"error": "not found"}, 404)
                except ValueError as e:
                    return self._json({"error": str(e)}, 400)
            if (
                len(parts) == 4
                and parts[:2] == ["api", "tables"]
                and parts[3] == "merge"
            ):
                if service.tables is None:
                    return self._json({"error": "table serving not configured"}, 404)
                # same contract as /api/vectors: 'batch' is the client's
                # idempotence token; replays of a committed batch are no-ops
                if "batch" not in payload:
                    return self._json(
                        {"error": "bad request: 'batch' is required — a "
                         "monotonically increasing id per table; replays "
                         "of a committed batch are no-ops"},
                        400,
                    )
                try:
                    return self._json(
                        service.tables.merge(
                            parts[2],
                            payload.get("rows") or [],
                            batch_id=int(payload["batch"]),
                            op_col=payload.get("op_col"),
                        )
                    )
                except FileNotFoundError:
                    return self._json({"error": "table not found"}, 404)
                except (TypeError, ValueError) as e:
                    return self._json({"error": f"bad request: {e}"}, 400)
                except Exception as e:
                    return self._json({"error": str(e)[:500]}, 500)
            if (
                len(parts) in (4, 6)
                and parts[:2] == ["api", "tables"]
                and parts[3] == "views"
            ):
                if service.tables is None:
                    return self._json({"error": "table serving not configured"}, 404)
                try:
                    if len(parts) == 4:
                        vid = payload.get("view_id")
                        return self._json(
                            service.tables.create_view(parts[2], vid, payload)
                        )
                    if parts[5] != "refresh":
                        return self._json({"error": "not found"}, 404)
                    return self._json(
                        service.tables.refresh_view(parts[2], parts[4])
                    )
                except FileNotFoundError as e:
                    return self._json({"error": f"not found: {e}"}, 404)
                except (TypeError, ValueError) as e:
                    return self._json({"error": f"bad request: {e}"}, 400)
                except Exception as e:
                    return self._json({"error": str(e)[:500]}, 500)
            if (
                len(parts) == 4
                and parts[:2] == ["api", "vectors"]
                and parts[3] in ("search", "append", "delete")
            ):
                if service.vectors is None:
                    return self._json(
                        {"error": "vector serving not configured"}, 404
                    )
                try:
                    if parts[3] == "search":
                        return self._json(
                            service.vectors.search(
                                parts[2],
                                payload.get("vectors") or [],
                                k=int(payload.get("k", 5)),
                                n_probe=int(payload.get("n_probe", 4)),
                            )
                        )
                    # batch is the client's idempotence token (monotonic
                    # per index) — a silent default of 0 would make every
                    # call after the first a watermark no-op
                    if "batch" not in payload:
                        return self._json(
                            {"error": "bad request: 'batch' is required — "
                             "a monotonically increasing id per index; "
                             "replays of a committed batch are no-ops"},
                            400,
                        )
                    if parts[3] == "delete":
                        return self._json(
                            service.vectors.delete(
                                parts[2],
                                payload.get("ids") or [],
                                batch_id=int(payload["batch"]),
                            )
                        )
                    return self._json(
                        service.vectors.append(
                            parts[2],
                            payload.get("ids") or [],
                            payload.get("vectors") or [],
                            batch_id=int(payload["batch"]),
                        )
                    )
                except FileNotFoundError:
                    return self._json({"error": "index not found"}, 404)
                except (TypeError, ValueError) as e:
                    return self._json({"error": f"bad request: {e}"}, 400)
                except Exception as e:
                    return self._json({"error": str(e)[:500]}, 500)
            self._json({"error": "not found"}, 404)

    return Handler


def serve(service: ClusterService, port: int = 8000) -> ThreadingHTTPServer:
    """Start the API server on a background thread; returns the server
    (call .shutdown() to stop)."""
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
