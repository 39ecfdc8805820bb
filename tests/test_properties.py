"""Property-based tests (hypothesis) for the pure-numpy kernels — an
upgrade over the reference's example-only test strategy (SURVEY.md §5: no
property/randomized framework exists there).

These cover the driver-side math that the distributed operators delegate
to, so hundreds of examples run without a Spark session:

* projection round-trip identity across the full domain (the reference
  pins 8 literal cases, cluster/cluster_test.go:440-473 — we pin the law);
* greedy-kernel invariants: totality, min-size law, radius law, and
  input-order invariance (the property that makes the kernel safe to run
  per-partition: partition/arrival order cannot change assignments).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from clustopher_spark.operators.cluster import _greedy_assign
from clustopher_spark.plans.projection import project_np, unproject_np

finite_lng = st.floats(-180.0, 180.0, allow_nan=False, allow_infinity=False)
finite_lat = st.floats(-85.0511, 85.0511, allow_nan=False, allow_infinity=False)


@given(lng=finite_lng, lat=finite_lat, zoom=st.integers(0, 16))
@settings(max_examples=300, deadline=None)
def test_projection_roundtrip_property(lng, lat, zoom):
    px, py = project_np(np.array([lng]), np.array([lat]), zoom)
    lng2, lat2 = unproject_np(px, py, zoom)
    # tolerance scales with tile resolution: coarse zooms quantize harder
    tol = max(1e-6, 360.0 / (2**zoom * 512) * 1e-3)
    assert abs(lng2[0] - lng) < tol
    assert abs(lat2[0] - lat) < tol


@given(lng=finite_lng, lat=finite_lat, zoom=st.integers(0, 16))
@settings(max_examples=100, deadline=None)
def test_projection_monotone_in_lng(lng, lat, zoom):
    """x is strictly increasing in longitude (Mercator preserves order)."""
    if lng > 179.0:
        return
    px1, _ = project_np(np.array([lng]), np.array([lat]), zoom)
    px2, _ = project_np(np.array([lng + 0.5]), np.array([lat]), zoom)
    assert px2[0] > px1[0]


kernel_case = st.tuples(
    st.integers(0, 2**31 - 1),  # rng seed
    st.integers(1, 300),        # n points
    st.sampled_from([20.0, 40.0, 100.0]),  # radius
    st.integers(2, 4),          # min_points
)


def _random_points(seed: int, n: int):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    xs = rng.uniform(0, 3000, n)
    ys = rng.uniform(0, 3000, n)
    return ids, xs, ys


@given(case=kernel_case)
@settings(max_examples=60, deadline=None)
def test_kernel_totality_and_size_law(case):
    seed, n, radius, min_points = case
    ids, xs, ys = _random_points(seed, n)
    assigned = _greedy_assign(ids, xs, ys, radius, min_points)
    # totality: every point lands in exactly one group
    assert len(assigned) == n and (assigned >= 0).all()
    # cluster ids are real point ids
    assert set(assigned) <= set(ids.tolist())
    sizes = {}
    for cid in assigned:
        sizes[cid] = sizes.get(cid, 0) + 1
    for cid, size in sizes.items():
        # min-size law: groups are singletons or >= min_points members
        assert size == 1 or size >= min_points, (cid, size)
    # radius law: every member lies within radius of its seed point
    pos = {int(i): (x, y) for i, x, y in zip(ids, xs, ys)}
    for i in range(n):
        sx, sy = pos[int(assigned[i])]
        d2 = (xs[i] - sx) ** 2 + (ys[i] - sy) ** 2
        assert d2 <= radius * radius + 1e-9


@given(case=kernel_case)
@settings(max_examples=40, deadline=None)
def test_kernel_input_order_invariance(case):
    """Shuffling input rows cannot change any assignment — the property
    that makes the kernel correct under Spark's arbitrary partition-file
    ordering (seed order is pinned by id, not arrival)."""
    seed, n, radius, min_points = case
    ids, xs, ys = _random_points(seed, n)
    base = _greedy_assign(ids, xs, ys, radius, min_points)
    rng = np.random.default_rng(seed ^ 0x5EED)
    perm = rng.permutation(n)
    shuffled = _greedy_assign(ids[perm], xs[perm], ys[perm], radius, min_points)
    base_map = {int(i): int(c) for i, c in zip(ids, base)}
    shuf_map = {int(i): int(c) for i, c in zip(ids[perm], shuffled)}
    assert base_map == shuf_map


# ---- BPE laws (functions/bpe.py) — pure-driver, no Spark session ----

word_strat = st.text(
    alphabet=st.sampled_from("abcdef'"), min_size=1, max_size=8
)
corpus_strat = st.lists(
    st.tuples(word_strat, st.integers(1, 50)), min_size=1, max_size=30,
    unique_by=lambda t: t[0],
)


@given(wf=corpus_strat, n=st.integers(0, 40))
@settings(max_examples=80, deadline=None)
def test_bpe_roundtrip_and_monotonicity_property(wf, n):
    """Laws of the BPE trainer/encoder pair on arbitrary corpora:
    encoding any trained word decodes exactly (concatenate tokens, strip
    one end marker per word); token count never exceeds chars+1; merges
    are unique and each merged token is the concatenation of its pair."""
    from clustopher_spark.functions.bpe import END, _encode_word, train_bpe

    merges = train_bpe(wf, n)
    assert len(set(merges)) == len(merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wf:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + END
        assert 1 <= len(toks) <= len(w) + 1


@given(wf=corpus_strat)
@settings(max_examples=40, deadline=None)
def test_bpe_merge_order_is_frequency_justified(wf):
    """Each learned merge must have had positive pair mass at the moment
    it was chosen — replay the merges over the corpus and check."""
    from clustopher_spark.functions.bpe import END, train_bpe

    merges = train_bpe(wf, 10)
    words = [tuple(w) + (END,) for w, _ in wf]
    freqs = [f for _, f in wf]
    for best in merges:
        mass = 0
        for w, f in zip(words, freqs):
            mass += sum(1 for p in zip(w, w[1:]) if p == best) * f
        assert mass > 0
        tok = best[0] + best[1]
        nw = []
        for w in words:
            new, j = [], 0
            while j < len(w):
                if j + 1 < len(w) and (w[j], w[j + 1]) == best:
                    new.append(tok)
                    j += 2
                else:
                    new.append(w[j])
                    j += 1
            nw.append(tuple(new))
        words = nw
