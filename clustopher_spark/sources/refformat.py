"""Reader (and fixture writer) for the reference's versioned ``.zst``
cluster files — the migration path from the native engine's saved
datasets into this one.

Format (reference cluster/storage.go:17-205 write side, :205-495 read
side; little-endian, one zstd stream):

    u32 version (=1)
    u32 numNodes, u32 numPoints
    options: i32 MinZoom, i32 MaxZoom, i32 MinPoints, f64 Radius,
             i32 NodeSize, i32 Extent, u8 Log
    numNodes x KD-node (37 B): i32 PointIdx, i32 Left, i32 Right,
             u8 Axis, u32 MinChild, u32 MaxChild, 4 x f32 bounds
    numPoints x point (16 B): f32 X (lng), f32 Y (lat), u32 ID,
             u32 NumPoints
    metadata dict: u32 numKeys, each { u32 len, bytes }
    point metadata: u32 n, each { u32 pointID, u32 numEntries,
             each { u32 keyID, u8 type, payload } } where payload is
             type 0: u32 len + utf8, type 1: f64, type 2: u8 bool
    metrics: u32 numMetricKeys, each { u32 len, bytes };
             per key { u32 colSize, colSize x f32 };
             u32 numMappings, each { u32 pointID, i32 rowIdx }

X/Y hold RAW lng/lat — the reference projects at query time
(cluster/cluster.go:977 ``projectFast(p.X, p.Y, zoom)``), so no
unprojection is needed on read. The KD-nodes are the reference's
in-memory index; this engine's physical layout is Z-ordered parquet
(sources/layout.py), so the node section is consumed and discarded.

Scale stance: one ``.zst`` file is, by the reference's own design, a
dataset that fit in a single process's RAM — so a driver-side parse is
the honest scale shape for migration (bounded by what the source engine
could hold). Decompression streams through pyarrow's zstd input stream
(no whole-file buffer); migrating a fleet of files is a loop of
read -> write_any/SaveCompressed-parquet per file.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

_POINT_DTYPE = np.dtype(
    [("x", "<f4"), ("y", "<f4"), ("id", "<u4"), ("np", "<u4")]
)
_NODE_BYTES = 4 + 4 + 4 + 1 + 4 + 4 + 16
_OPTS_STRUCT = struct.Struct("<iiidiiB")


def _read_exact(stream, n: int) -> bytes:
    out = stream.read(n)
    if len(out) != n:
        raise EOFError(f"truncated cluster file: wanted {n} bytes, got {len(out)}")
    return out


def _u32(stream) -> int:
    return struct.unpack("<I", _read_exact(stream, 4))[0]


def read_supercluster_zst(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Parse a reference ``SaveCompressed`` file into (points DataFrame,
    info dict). The DataFrame carries the engine's points schema — id,
    lng, lat, num_points, one double column per metric key, and typed
    metadata maps (meta_str / meta_num / meta_bool) — ready for
    ``Clustopher(...)`` or ``ClusterCatalog.save``. ``info`` returns the
    file's options plus section counts."""
    import pandas as pd

    with pa.input_stream(path, compression="zstd") as f:
        version = _u32(f)
        if version != 1:
            raise ValueError(f"unsupported cluster file version {version}")
        num_nodes, num_points = _u32(f), _u32(f)
        (min_zoom, max_zoom, min_points, radius, node_size, extent,
         log) = _OPTS_STRUCT.unpack(_read_exact(f, _OPTS_STRUCT.size))
        info = {
            "version": version, "num_nodes": num_nodes,
            "num_points": num_points, "min_zoom": min_zoom,
            "max_zoom": max_zoom, "min_points": min_points,
            "radius": radius, "node_size": node_size, "extent": extent,
            "log": bool(log),
        }
        # KD-node section: the source engine's in-memory index — skip
        # (streamed in chunks so a large file never buffers whole)
        remaining = num_nodes * _NODE_BYTES
        while remaining:
            chunk = min(remaining, 8 << 20)
            _read_exact(f, chunk)
            remaining -= chunk
        pts = np.frombuffer(
            _read_exact(f, num_points * _POINT_DTYPE.itemsize), _POINT_DTYPE
        )
        # metadata dictionary + per-point typed entries
        keys = [
            _read_exact(f, _u32(f)).decode("utf-8") for _ in range(_u32(f))
        ]
        meta_str: dict[int, dict] = {}
        meta_num: dict[int, dict] = {}
        meta_bool: dict[int, dict] = {}
        for _ in range(_u32(f)):
            pid = _u32(f)
            for _ in range(_u32(f)):
                key_id = _u32(f)
                typ = _read_exact(f, 1)[0]
                key = keys[key_id]
                if typ == 0:
                    meta_str.setdefault(pid, {})[key] = _read_exact(
                        f, _u32(f)
                    ).decode("utf-8")
                elif typ == 1:
                    meta_num.setdefault(pid, {})[key] = struct.unpack(
                        "<d", _read_exact(f, 8)
                    )[0]
                elif typ == 2:
                    meta_bool.setdefault(pid, {})[key] = bool(
                        _read_exact(f, 1)[0]
                    )
                else:
                    raise ValueError(f"unknown metadata value type {typ}")
        # metric columns + point -> row mapping
        metric_keys = [
            _read_exact(f, _u32(f)).decode("utf-8") for _ in range(_u32(f))
        ]
        cols = [
            np.frombuffer(_read_exact(f, _u32(f) * 4), "<f4")
            for _ in metric_keys
        ]
        n_map = _u32(f)
        mapping = np.frombuffer(
            _read_exact(f, n_map * 8), np.dtype([("pid", "<u4"), ("row", "<i4")])
        )

    pdf = pd.DataFrame(
        {
            "id": pts["id"].astype("int64"),
            "lng": pts["x"].astype("float64"),
            "lat": pts["y"].astype("float64"),
            "num_points": pts["np"].astype("int64"),
        }
    )
    if metric_keys:
        row_of = pd.Series(mapping["row"], index=mapping["pid"])
        rows = row_of.reindex(pts["id"]).to_numpy()
        ok = ~np.isnan(rows)
        idx = np.where(ok, rows, 0).astype(np.int64)
        for key, col in zip(metric_keys, cols):
            vals = col[idx].astype("float64")
            vals[~ok] = np.nan
            pdf[key] = vals
    has_meta = bool(meta_str or meta_num or meta_bool)
    if has_meta:
        ids = pdf["id"].to_numpy()
        pdf["meta_str"] = [meta_str.get(i) for i in ids]
        pdf["meta_num"] = [meta_num.get(i) for i in ids]
        pdf["meta_bool"] = [meta_bool.get(i) for i in ids]
    schema = "id long, lng double, lat double, num_points long"
    schema += "".join(f", `{k}` double" for k in metric_keys)
    if has_meta:
        schema += (
            ", meta_str map<string,string>, meta_num map<string,double>"
            ", meta_bool map<string,boolean>"
        )
    return spark.createDataFrame(pdf, schema=schema), info


def write_supercluster_zst(
    path: str,
    points,
    opts: dict | None = None,
    metadata: dict | None = None,
    metrics: dict | None = None,
    nodes: int = 0,
) -> None:
    """Go-faithful fixture/export writer (field-for-field the
    storage.go:17-205 byte layout, zstd-framed). ``points`` is an
    iterable of (id, lng, lat, num_points); ``metrics`` maps key ->
    {point_id: float}; ``metadata`` maps point_id -> {key: str|float|
    bool}. ``nodes`` KD-nodes are emitted zero-filled — the reference
    rebuilds its index in memory and this engine discards the section,
    so only the count must be consistent."""
    opts = opts or {}
    pts = list(points)
    meta = metadata or {}
    mets = metrics or {}
    with pa.output_stream(path, compression="zstd") as f:
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<II", nodes, len(pts)))
        f.write(_OPTS_STRUCT.pack(
            opts.get("min_zoom", 0), opts.get("max_zoom", 16),
            opts.get("min_points", 2), float(opts.get("radius", 100.0)),
            opts.get("node_size", 64), opts.get("extent", 512),
            int(bool(opts.get("log", False))),
        ))
        f.write(b"\x00" * (nodes * _NODE_BYTES))
        for pid, lng, lat, n in pts:
            f.write(struct.pack("<ffII", lng, lat, pid, n))
        # metadata dictionary: stable key order
        keys = sorted({k for entries in meta.values() for k in entries})
        key_id = {k: i for i, k in enumerate(keys)}
        f.write(struct.pack("<I", len(keys)))
        for k in keys:
            kb = k.encode("utf-8")
            f.write(struct.pack("<I", len(kb)) + kb)
        f.write(struct.pack("<I", len(meta)))
        for pid, entries in meta.items():
            f.write(struct.pack("<II", pid, len(entries)))
            for k, v in entries.items():
                if isinstance(v, bool):
                    f.write(struct.pack("<IBB", key_id[k], 2, int(v)))
                elif isinstance(v, (int, float)):
                    f.write(struct.pack("<IBd", key_id[k], 1, float(v)))
                else:
                    vb = str(v).encode("utf-8")
                    f.write(struct.pack("<IBI", key_id[k], 0, len(vb)) + vb)
        # metrics: columnar values + point->row mapping (shared row space)
        mkeys = sorted(mets)
        f.write(struct.pack("<I", len(mkeys)))
        for k in mkeys:
            kb = k.encode("utf-8")
            f.write(struct.pack("<I", len(kb)) + kb)
        row_ids = sorted({pid for k in mkeys for pid in mets[k]})
        row_of = {pid: i for i, pid in enumerate(row_ids)}
        for k in mkeys:
            col = np.zeros(len(row_ids), "<f4")
            for pid, val in mets[k].items():
                col[row_of[pid]] = val
            f.write(struct.pack("<I", len(col)))
            f.write(col.tobytes())
        f.write(struct.pack("<I", len(row_ids)))
        for pid, row in row_of.items():
            f.write(struct.pack("<Ii", pid, row))
