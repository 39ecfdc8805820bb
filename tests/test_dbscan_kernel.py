"""Equivalence pins for the round-8 native DBSCAN pair kernel.

The kernel path (operators/native_dbscan.py via _dbscan_kernel) must
return EXACTLY the rows of the pure-relational plan (_dbscan_sql) — the
declared ``spatial_dbscan`` query is oracle-hash-checked, so any
divergence here is a correctness regression, not a performance note.
Shapes cover the failure modes that matter: exact eps- and 2eps-boundary
distances (a ``<`` vs ``<=`` divergence shows), duplicate coordinates,
negative coordinates (floor-cell sign handling), singleton handling at
min_pts<=1, and border ties resolved by min label.
"""

from __future__ import annotations

import numpy as np
import pytest


def _run_both(spark, monkeypatch, rows, eps, min_pts):
    from clustopher_spark.operators import native_dbscan
    from clustopher_spark.operators.dbscan import dbscan

    if native_dbscan.load() is None:
        pytest.skip("native dbscan kernel unavailable (no gcc?)")
    df = spark.createDataFrame(rows, "id long, x double, y double")
    df = df.localCheckpoint(eager=True)
    monkeypatch.setenv("CLUSTOPHER_DBSCAN_KERNEL", "0")
    sql_stats: dict = {}
    sql = sorted(
        tuple(r) for r in dbscan(df, eps=eps, min_pts=min_pts, cc_stats=sql_stats).collect()
    )
    monkeypatch.setenv("CLUSTOPHER_DBSCAN_KERNEL", "1")
    k_stats: dict = {}
    kern = sorted(
        tuple(r) for r in dbscan(df, eps=eps, min_pts=min_pts, cc_stats=k_stats).collect()
    )
    assert kern == sql
    assert "rounds" in k_stats and "driver_edges" in k_stats
    return sql


def _blobs_and_noise():
    rng = np.random.RandomState(42)
    rows = []
    nid = 0
    # three dense blobs, one of which touches a sparse bridge
    for bx, by in ((0.0, 0.0), (400.0, 120.0), (-350.0, -80.0)):
        for _ in range(60):
            rows.append(
                (nid, float(bx + rng.uniform(-40, 40)), float(by + rng.uniform(-40, 40)))
            )
            nid += 1
    # uniform scatter (mostly noise/border at eps=30)
    for _ in range(120):
        rows.append(
            (nid, float(rng.uniform(-600, 600)), float(rng.uniform(-300, 300)))
        )
        nid += 1
    return rows


@pytest.mark.parametrize("min_pts", [1, 2, 4, 8])
def test_kernel_matches_sql_blobs(spark, monkeypatch, min_pts):
    _run_both(spark, monkeypatch, _blobs_and_noise(), eps=30.0, min_pts=min_pts)


def test_kernel_matches_sql_boundary_lattice(spark, monkeypatch):
    """Integer lattice at pitch exactly eps: every 4-neighbor pair sits at
    distance == eps (the <= boundary), diagonals at eps*sqrt(2) just
    outside. Any comparison or cell-assignment divergence flips verdicts."""
    eps = 7.0
    rows = [
        (int(i * 100 + j), float(i * eps), float(j * eps))
        for i in range(12)
        for j in range(9)
    ]
    for min_pts in (3, 5, 6):
        _run_both(spark, monkeypatch, rows, eps=eps, min_pts=min_pts)


def test_kernel_matches_sql_duplicates_and_negative(spark, monkeypatch):
    rows = [
        (1, -10.0, -10.0), (2, -10.0, -10.0), (3, -10.0, -10.0),  # stacked
        (4, -10.0, -4.5), (5, 0.0, 0.0), (6, 3.0, 4.0),
        (7, 100.0, 100.0),
        (8, -0.0001, -0.0001),  # floor-cell sign boundary
    ]
    for min_pts in (1, 2, 3, 4):
        _run_both(spark, monkeypatch, rows, eps=6.0, min_pts=min_pts)


def test_kernel_matches_sql_tiny(spark, monkeypatch):
    _run_both(spark, monkeypatch, [(7, 1.0, 2.0)], eps=5.0, min_pts=2)
    _run_both(spark, monkeypatch, [(7, 1.0, 2.0), (9, 2.0, 2.0)], eps=5.0, min_pts=2)
    _run_both(spark, monkeypatch, [(7, 1.0, 2.0), (9, 2.0, 2.0)], eps=0.5, min_pts=1)


def test_kernel_matches_sql_border_min_label_tie(spark, monkeypatch):
    """A noncore point reachable from TWO clusters must take the MIN core
    label in both paths (the determinism contract the oracle replays)."""
    rows = [
        # cluster A (label 1) and cluster B (label 10), two 4-point
        # squares whose members are all core at min_pts=4; the bridge
        # point 50 sits at distance exactly eps from one core of each
        # side but has only 3 neighbors incl self (noncore at min_pts=4)
        (1, 0.0, 0.0), (2, 4.0, 0.0), (3, 0.0, 4.0), (4, 4.0, 4.0),
        (10, 24.0, 0.0), (11, 28.0, 0.0), (12, 24.0, 4.0), (13, 28.0, 4.0),
        (50, 14.0, 0.0),
    ]
    out = _run_both(spark, monkeypatch, rows, eps=10.0, min_pts=4)
    verdicts = {i: (lab, kind) for i, lab, kind in out}
    assert verdicts[50] == (1, "border")
    assert verdicts[1] == (1, "core") and verdicts[10] == (10, "core")
