"""Bit-identity of the native (C) greedy kernel against the numpy
reference loop — the optimization contract: the native path may only be
faster, never different (operators/native.py)."""

from __future__ import annotations

import numpy as np
import pytest

from clustopher_spark.operators import native
from clustopher_spark.operators.cluster import _greedy_assign


def _reference(ids, xs, ys, gx, gy, radius, min_points):
    """The pre-native per-supercell semantics: _greedy_assign per
    (gx, gy) segment over supercell-sorted arrays."""
    n = len(ids)
    order = np.lexsort((gy, gx))
    sgx, sgy = gx[order], gy[order]
    bounds = np.flatnonzero(
        np.concatenate(([True], (sgx[1:] != sgx[:-1]) | (sgy[1:] != sgy[:-1])))
    )
    bounds = np.append(bounds, n)
    out = np.empty(n, dtype=np.int64)
    ids_s, xs_s, ys_s = ids[order], xs[order], ys[order]
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s == 1:
            out[s] = ids_s[s]
        else:
            out[s:e] = _greedy_assign(
                ids_s[s:e], xs_s[s:e], ys_s[s:e], radius, min_points
            )
    return out, ids_s, xs_s, ys_s, bounds


def _native(ids_s, xs_s, ys_s, bounds, radius, min_points):
    return native.assign_sorted_segments(
        ids_s, xs_s, ys_s, bounds, radius, min_points
    )


@pytest.fixture(scope="module")
def lib():
    got = native.load()
    if got is None:
        pytest.skip("native kernel unavailable on this host")
    return got


RADIUS = 100.0
SIZE = RADIUS * 16


def _cases():
    rng = np.random.default_rng(23)
    out = []
    # uniform across densities: all-singleton, mixed, and clique regimes
    for n, cells in ((60_000, 2000), (60_000, 300), (60_000, 60), (4_000, 6)):
        world = cells * RADIUS
        out.append((
            f"uniform-{cells}",
            rng.permutation(n).astype(np.int64) * 3 + 1,
            rng.uniform(0, world, n),
            rng.uniform(0, world, n),
        ))
    # dense city blobs on a sparse background
    n = 60_000
    world = 2000 * RADIUS
    half = n // 2
    xs = np.concatenate([
        rng.uniform(0, world, half),
        rng.normal(world / 2, RADIUS * 3, n - half),
    ]).clip(0, world)
    ys = np.concatenate([
        rng.uniform(0, world, half),
        rng.normal(world / 2, RADIUS * 3, n - half),
    ]).clip(0, world)
    out.append(("mixed", rng.permutation(n).astype(np.int64) + 7, xs, ys))
    # integer lattice: exact r- and 2r-boundary distances (the skew bench
    # shape) — catches any <= vs < divergence between C and numpy
    n = 50_000
    out.append((
        "lattice",
        np.arange(1, n + 1, dtype=np.int64),
        (np.arange(n) % 447).astype(np.float64) * 33.445,
        ((np.arange(n) * 7) % 449).astype(np.float64) * 33.445,
    ))
    return out


@pytest.mark.parametrize("min_points", [1, 2, 3, 5])
def test_native_matches_reference(lib, min_points):
    for name, ids, xs, ys in _cases():
        gx = np.floor(xs / SIZE).astype(np.int64)
        gy = np.floor(ys / SIZE).astype(np.int64)
        ref, ids_s, xs_s, ys_s, bounds = _reference(
            ids, xs, ys, gx, gy, RADIUS, min_points
        )
        got = _native(ids_s, xs_s, ys_s, bounds, RADIUS, min_points)
        assert got is not None
        assert np.array_equal(ref, got), f"{name} min_points={min_points}"


def test_native_empty_and_degenerate(lib):
    # empty input
    got = _native(
        np.empty(0, np.int64), np.empty(0), np.empty(0),
        np.array([0], np.int64), RADIUS, 2,
    )
    assert got is not None and len(got) == 0
    # one point per segment
    ids = np.array([5, 9, 2], dtype=np.int64)
    xs = np.array([0.0, 5000.0, 90000.0])
    ys = np.array([0.0, 5000.0, 90000.0])
    bounds = np.array([0, 1, 2, 3], dtype=np.int64)
    got = _native(ids, xs, ys, bounds, RADIUS, 2)
    assert np.array_equal(got, ids)
    # coincident points (zero distance, one cluster)
    ids = np.array([4, 1, 8], dtype=np.int64)
    xs = np.array([10.0, 10.0, 10.0])
    ys = np.array([20.0, 20.0, 20.0])
    bounds = np.array([0, 3], dtype=np.int64)
    got = _native(ids, xs, ys, bounds, RADIUS, 2)
    assert np.array_equal(got, np.array([1, 1, 1]))


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("CLUSTOPHER_NATIVE", "0")
    monkeypatch.setattr(native, "_LIB", False)
    assert native.load() is None
    assert (
        native.assign_sorted_segments(
            np.array([1], np.int64), np.array([0.0]), np.array([0.0]),
            np.array([0, 1], np.int64), RADIUS, 2,
        )
        is None
    )
    monkeypatch.setattr(native, "_LIB", False)  # re-probe on next load()
