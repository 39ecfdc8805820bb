"""Round-9 parquet-spill materialization (plans/lineage.py::materialize_df).

The pyramid build/update paths materialize their largest intermediate as a
page-cache-backed parquet spill instead of a block-manager localCheckpoint;
these tests pin (a) bit-exact value round-trip including IEEE edge cases,
(b) schema fidelity including nullability, (c) empty-frame readability,
(d) the snapshot/release ledger, and (e) build-path equality between the
spill and checkpoint modes on real-shaped data.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from clustopher_spark.plans import lineage
from clustopher_spark.plans.lineage import (
    materialize_df,
    release_spills,
    spill_snapshot,
)


def test_spill_roundtrip_bit_exact(spark):
    df = spark.createDataFrame(
        [
            (1, 0.1 + 0.2, -0.0, True, 2**62, "a"),
            (2, float("inf"), 5e-324, False, -(2**62), None),
            (3, -1.7976931348623157e308, math.pi, True, 0, ""),
            (4, None, 2.2250738585072014e-308, None, None, "z"),
        ],
        "i int, d1 double, d2 double, b boolean, l long, s string",
    )
    out = materialize_df(df, label="t_roundtrip")
    # names/types identical; nullability may widen (file-source semantics)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    got = {r["i"]: r for r in out.collect()}
    for r in df.collect():
        g = got[r["i"]]
        for c in df.columns:
            a, b = r[c], g[c]
            if isinstance(a, float) and isinstance(b, float):
                # bit-level compare (NaN-safe, -0.0 vs 0.0 distinguishing)
                import struct

                assert struct.pack("<d", a) == struct.pack("<d", b), (c, a, b)
            else:
                assert a == b or (a is None and b is None), (c, a, b)


def test_spill_empty_frame_readable(spark):
    df = spark.range(0).selectExpr("id", "cast(id as double) as x")
    out = materialize_df(df.filter(F.col("id") < -1), label="t_empty")
    assert out.count() == 0
    # file-source readers widen every field to nullable; names/types hold
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]


def test_spill_ledger_release(spark):
    mark = spill_snapshot()
    out1 = materialize_df(spark.range(10), label="t_ledger1")
    out2 = materialize_df(spark.range(20), label="t_ledger2")
    d1, d2 = lineage._SPILL_DIRS[mark:]
    assert out1.count() == 10 and out2.count() == 20
    assert os.path.isdir(d1) and os.path.isdir(d2)
    release_spills(mark)
    assert not os.path.exists(d1) and not os.path.exists(d2)
    assert spill_snapshot() == mark


def test_checkpoint_mode_passthrough(spark, monkeypatch):
    monkeypatch.setenv("CLUSTOPHER_MATERIALIZE", "checkpoint")
    mark = spill_snapshot()
    out = materialize_df(spark.range(7), label="t_ck")
    assert out.count() == 7
    assert spill_snapshot() == mark  # no spill dir created


@pytest.mark.parametrize("n", [4_000])
def test_build_equal_across_modes(spark, monkeypatch, n):
    """materialize_zoom_levels output matches across spill and checkpoint
    modes: identical cluster structure (ids, counts, membership, zoom) and
    float aggregates equal to within 1 ULP. The modes may differ at ULP
    level in summed columns because the readback's partition splits feed
    downstream aggregations in a different row order (float addition is
    not associative); WITHIN a mode every path stays deterministic — the
    suite's fused-vs-level-at-a-time and incremental-vs-rebuild byte
    equality tests all run single-mode and stay exact."""
    import math

    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.operators.zoom import materialize_zoom_levels
    from clustopher_spark.sources.generators import generate_test_points

    pts = (
        generate_test_points(spark, n, seed=3)
        .select("id", "lng", "lat", "value")
        .localCheckpoint(eager=True)
    )
    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=10)
    outs = {}
    for mode in ("spill", "checkpoint"):
        monkeypatch.setenv("CLUSTOPHER_MATERIALIZE", mode)
        df = materialize_zoom_levels(pts, ["value"], opts)
        outs[mode] = sorted(
            df.collect(), key=lambda r: (r["zoom"], r["cluster_id"])
        )
    assert len(outs["spill"]) == len(outs["checkpoint"])
    for a, b in zip(outs["spill"], outs["checkpoint"]):
        for c in ("zoom", "cluster_id", "point_count", "num_members",
                  "is_cluster"):
            assert a[c] == b[c], (c, a, b)
        for c in ("lng", "lat", "sum_value"):
            assert math.isclose(a[c], b[c], rel_tol=1e-14, abs_tol=1e-300), (
                c, a, b,
            )
