"""Native (C, via ctypes) pair kernel for DBSCAN's ε-grid stage.

Round-8 measurement (guide §1) of :func:`operators.dbscan.dbscan` showed
the remaining cost is not the plan shape (already broadcast-gated) but
the 24M-row candidate PAIR LIST itself: one localCheckpoint write+read
per consumer plus a 49M-row degree aggregation, all to derive three
aggregate-sized outputs (per-point degrees, distinct contracted-cell
edges, border-candidate pairs). The pairs are only ever an intermediate.

This module computes those three outputs directly from the cell-grouped
points in two C passes, so the pair list is never materialized:

* pass 1 (``dbscan_degrees``): enumerate qualifying pairs per ε-cell
  (same base x forward-probe structure as the SQL join, same ``<=``
  IEEE comparisons, each unordered pair exactly once) and count both
  endpoints — the shuffle then carries per-partition partial degree
  counts (≤ points) instead of 2x pairs.
* pass 2 (``dbscan_pass2``): re-enumerate with the global core flags in
  hand and emit (a) locally-deduped directed contracted-cell edges
  (eps/sqrt(2) grid, the exact cell-code expression of the SQL path),
  (b) border-candidate pairs (noncore id, core neighbor id) — bounded
  by min_pts-2 per noncore point, since a noncore point by definition
  has fewer than min_pts-1 neighbors — and (c) (core id, cell) rows for
  the contraction vertices.

Enumeration is O(candidate combos) per cell — identical to the join's
output before the distance filter — at ~1-2 ns per check in C, so two
passes are far cheaper than one materialization. Compilation follows
operators/native.py: gcc at first use into a content-addressed .so
cache, no binary in the repo, no build step; ``load()`` returns None
when unavailable and the caller keeps the pure-SQL plan (which is also
the at-scale plan past the driver-size gate — see dbscan.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_C_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

/* Rows of one task partition arrive cell-sorted; seg_bounds marks the
 * epsilon-cell segments. tag: 0 = base row, 1 = same-cell probe copy,
 * 2 = forward-neighbor probe copy. A qualifying pair is (base, probe)
 * with squared distance <= eps2, where same-cell probes additionally
 * require probe id > base id (exactly the SQL join's filter, so each
 * unordered pair is generated exactly once across the cluster). */

typedef struct {
    int64_t cap;
    int64_t *bi, *pi;
} Scratch;

static int scratch_ensure(Scratch *s, int64_t n) {
    if (n <= s->cap) return 0;
    int64_t c = s->cap ? s->cap : 1024;
    while (c < n) c *= 2;
    free(s->bi); free(s->pi);
    s->bi = malloc(c * sizeof(int64_t));
    s->pi = malloc(c * sizeof(int64_t));
    if (!s->bi || !s->pi) return -1;
    s->cap = c;
    return 0;
}

int dbscan_degrees(
    int64_t n_seg, const int64_t *seg_bounds,
    const int64_t *ids, const double *xs, const double *ys,
    const int8_t *tags, double eps2,
    int64_t *cnt)
{
    int64_t n_total = seg_bounds[n_seg];
    memset(cnt, 0, n_total * sizeof(int64_t));
    Scratch s; memset(&s, 0, sizeof(s));
    for (int64_t g = 0; g < n_seg; g++) {
        int64_t lo = seg_bounds[g], hi = seg_bounds[g + 1], n = hi - lo;
        if (scratch_ensure(&s, n)) { free(s.bi); free(s.pi); return -1; }
        int64_t nb = 0, np = 0;
        for (int64_t r = lo; r < hi; r++) {
            if (tags[r] == 0) s.bi[nb++] = r; else s.pi[np++] = r;
        }
        if (!nb || !np) continue;
        for (int64_t a = 0; a < nb; a++) {
            int64_t i = s.bi[a];
            double xi = xs[i], yi = ys[i];
            int64_t idi = ids[i];
            for (int64_t b = 0; b < np; b++) {
                int64_t j = s.pi[b];
                if (tags[j] == 1 && ids[j] <= idi) continue;
                double dx = xs[j] - xi, dy = ys[j] - yi;
                if (dx * dx + dy * dy <= eps2) { cnt[i]++; cnt[j]++; }
            }
        }
    }
    free(s.bi); free(s.pi);
    return 0;
}

/* open-addressing set of directed (a, b) int64 pairs, grow-on-load */
typedef struct {
    int64_t *ka, *kb;
    uint8_t *used;
    uint64_t mask;
    int64_t n;
} ESet;

static uint64_t mix64(uint64_t x) {
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33; return x;
}

static int eset_init(ESet *s, uint64_t cap) {
    s->ka = malloc(cap * sizeof(int64_t));
    s->kb = malloc(cap * sizeof(int64_t));
    s->used = calloc(cap, 1);
    s->mask = cap - 1;
    s->n = 0;
    return (s->ka && s->kb && s->used) ? 0 : -1;
}

static void eset_free(ESet *s) { free(s->ka); free(s->kb); free(s->used); }

static int eset_grow(ESet *s);

/* returns 1 newly inserted, 0 already present, -1 alloc failure */
static int eset_insert(ESet *s, int64_t a, int64_t b) {
    if ((uint64_t)s->n * 2 >= s->mask + 1) {
        if (eset_grow(s)) return -1;
    }
    uint64_t h = mix64(mix64((uint64_t)a) + (uint64_t)b) & s->mask;
    while (s->used[h]) {
        if (s->ka[h] == a && s->kb[h] == b) return 0;
        h = (h + 1) & s->mask;
    }
    s->used[h] = 1; s->ka[h] = a; s->kb[h] = b; s->n++;
    return 1;
}

static int eset_grow(ESet *s) {
    ESet bigger;
    if (eset_init(&bigger, (s->mask + 1) * 2)) { eset_free(&bigger); return -1; }
    for (uint64_t i = 0; i <= s->mask; i++) {
        if (!s->used[i]) continue;
        int64_t a = s->ka[i], b = s->kb[i];
        uint64_t h = mix64(mix64((uint64_t)a) + (uint64_t)b) & bigger.mask;
        while (bigger.used[h]) h = (h + 1) & bigger.mask;
        bigger.used[h] = 1; bigger.ka[h] = a; bigger.kb[h] = b;
    }
    bigger.n = s->n;
    eset_free(s);
    *s = bigger;
    return 0;
}

int dbscan_pass2(
    int64_t n_seg, const int64_t *seg_bounds,
    const int64_t *ids, const double *xs, const double *ys,
    const int8_t *tags, const int8_t *core, double eps2, double scell,
    int64_t *edges, int64_t edge_cap, int64_t *n_edges,
    int64_t *cands, int64_t cand_cap, int64_t *n_cands,
    int64_t *ccells, int64_t ccell_cap, int64_t *n_ccells)
{
    int64_t n_total = seg_bounds[n_seg];
    int64_t ne = 0, nc = 0, ncc = 0;
    int rc = 0;
    int64_t *sc = malloc(n_total ? n_total * sizeof(int64_t) : 8);
    Scratch s; memset(&s, 0, sizeof(s));
    ESet seen; memset(&seen, 0, sizeof(seen));
    if (!sc || eset_init(&seen, 1 << 14)) { rc = -1; goto done; }
    for (int64_t r = 0; r < n_total; r++) {
        /* the SQL path's contraction cell code, bit for bit:
         * floor(x/s) cast long * 2^32 + floor(y/s) cast long */
        sc[r] = (int64_t)floor(xs[r] / scell) * 4294967296LL
              + (int64_t)floor(ys[r] / scell);
        if (tags[r] == 0 && core[r]) {
            if (ncc >= ccell_cap) { rc = -2; goto done; }
            ccells[2 * ncc] = ids[r]; ccells[2 * ncc + 1] = sc[r]; ncc++;
        }
    }
    for (int64_t g = 0; g < n_seg; g++) {
        int64_t lo = seg_bounds[g], hi = seg_bounds[g + 1], n = hi - lo;
        if (scratch_ensure(&s, n)) { rc = -1; goto done; }
        int64_t nb = 0, np = 0;
        for (int64_t r = lo; r < hi; r++) {
            if (tags[r] == 0) s.bi[nb++] = r; else s.pi[np++] = r;
        }
        if (!nb || !np) continue;
        for (int64_t a = 0; a < nb; a++) {
            int64_t i = s.bi[a];
            double xi = xs[i], yi = ys[i];
            int64_t idi = ids[i];
            int corei = core[i];
            for (int64_t b = 0; b < np; b++) {
                int64_t j = s.pi[b];
                if (tags[j] == 1 && ids[j] <= idi) continue;
                double dx = xs[j] - xi, dy = ys[j] - yi;
                if (dx * dx + dy * dy > eps2) continue;
                if (corei && core[j]) {
                    if (sc[i] != sc[j]) {
                        int ins = eset_insert(&seen, sc[i], sc[j]);
                        if (ins < 0) { rc = -1; goto done; }
                        if (ins) {
                            if (ne >= edge_cap) { rc = -2; goto done; }
                            edges[2 * ne] = sc[i]; edges[2 * ne + 1] = sc[j]; ne++;
                        }
                    }
                } else if (corei || core[j]) {
                    if (nc >= cand_cap) { rc = -2; goto done; }
                    if (corei) { cands[2 * nc] = ids[j]; cands[2 * nc + 1] = idi; }
                    else { cands[2 * nc] = idi; cands[2 * nc + 1] = ids[j]; }
                    nc++;
                }
            }
        }
    }
done:
    *n_edges = ne; *n_cands = nc; *n_ccells = ncc;
    free(sc); free(s.bi); free(s.pi); eset_free(&seen);
    return rc;
}
"""

_LIB: object = False  # False = not attempted, None = unavailable


def _cache_dir() -> str:
    base = os.environ.get("CLUSTOPHER_NATIVE_DIR")
    if base:
        return base
    return os.path.join(
        tempfile.gettempdir(), f"clustopher_native-{os.getuid()}"
    )


# -ffp-contract=off / -fno-fast-math: keep dx*dx + dy*dy un-fused so the
# <= eps2 boundary matches the JVM's and numpy's (never-fused) rounding on
# every target — see operators/native.py::_GCC_FLAGS.
_GCC_FLAGS = ["-O3", "-ffp-contract=off", "-fno-fast-math", "-shared", "-fPIC"]


def _build() -> object | None:
    # digest covers source AND flags (a flag change invalidates the cache)
    digest = hashlib.sha256(
        (_C_SOURCE + "\n//" + " ".join(_GCC_FLAGS)).encode()
    ).hexdigest()[:16]
    cache = _cache_dir()
    so_path = os.path.join(cache, f"dbscan_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache, exist_ok=True)
        src = os.path.join(cache, f"dbscan_{digest}.c")
        tmp = f"{so_path}.{os.getpid()}.tmp"
        with open(f"{src}.{os.getpid()}.tmp", "w") as f:
            f.write(_C_SOURCE)
        os.replace(f"{src}.{os.getpid()}.tmp", src)
        subprocess.run(
            ["gcc", *_GCC_FLAGS, "-o", tmp, src, "-lm"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so_path)  # atomic: concurrent builders just race
    lib = ctypes.CDLL(so_path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.dbscan_degrees.restype = ctypes.c_int
    lib.dbscan_degrees.argtypes = [
        ctypes.c_int64, i64p, i64p, f64p, f64p, i8p, ctypes.c_double, i64p,
    ]
    lib.dbscan_pass2.restype = ctypes.c_int
    lib.dbscan_pass2.argtypes = [
        ctypes.c_int64, i64p, i64p, f64p, f64p, i8p, i8p,
        ctypes.c_double, ctypes.c_double,
        i64p, ctypes.c_int64, i64p,
        i64p, ctypes.c_int64, i64p,
        i64p, ctypes.c_int64, i64p,
    ]
    return lib


def load() -> object | None:
    """The compiled kernel library, building it on first call; None when
    native is disabled or unavailable (callers then keep the SQL plan)."""
    global _LIB
    if _LIB is False:
        if os.environ.get("CLUSTOPHER_NATIVE", "1") == "0":
            _LIB = None
        else:
            try:
                _LIB = _build()
            except Exception as e:  # no compiler / RO tmp / exotic platform
                print(
                    f"# clustopher dbscan kernel unavailable ({e!r}); "
                    "using the SQL pair plan",
                    file=sys.stderr,
                )
                _LIB = None
    return _LIB


def _as_i64(a):
    import numpy as np

    return np.ascontiguousarray(a, dtype=np.int64)


def degrees(ids, xs, ys, tags, bounds, eps2):
    """Pair-endpoint counts aligned with the (cell-sorted) input rows, or
    None when the native kernel is unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    ids_c, bounds_c = _as_i64(ids), _as_i64(bounds)
    xs_c = np.ascontiguousarray(xs, dtype=np.float64)
    ys_c = np.ascontiguousarray(ys, dtype=np.float64)
    tags_c = np.ascontiguousarray(tags, dtype=np.int8)
    cnt = np.empty(len(ids_c), dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.dbscan_degrees(
        len(bounds_c) - 1,
        bounds_c.ctypes.data_as(i64p),
        ids_c.ctypes.data_as(i64p),
        xs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ys_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tags_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        float(eps2),
        cnt.ctypes.data_as(i64p),
    )
    if rc != 0:
        return None
    return cnt


def pass2(ids, xs, ys, tags, core, bounds, eps2, s, min_pts):
    """(directed contracted-cell edges, border candidate pairs, core
    (id, cell) rows) as three (n, 2) int64 arrays, or None when the
    kernel is unavailable or a capacity proof was violated (callers then
    keep the SQL plan)."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    ids_c, bounds_c = _as_i64(ids), _as_i64(bounds)
    xs_c = np.ascontiguousarray(xs, dtype=np.float64)
    ys_c = np.ascontiguousarray(ys, dtype=np.float64)
    tags_c = np.ascontiguousarray(tags, dtype=np.int8)
    core_c = np.ascontiguousarray(core, dtype=np.int8)
    n = len(ids_c)
    # capacity proofs (see module docstring): a contracted cell reaches at
    # most 24 directed neighbor cells within eps; a noncore point has at
    # most min_pts-2 neighbors total; base rows per partition <= rows.
    edge_cap = 25 * n + 1024
    cand_cap = max(int(min_pts), 1) * n + 1024
    ccell_cap = n + 16
    edges = np.empty(2 * edge_cap, dtype=np.int64)
    cands = np.empty(2 * cand_cap, dtype=np.int64)
    ccells = np.empty(2 * ccell_cap, dtype=np.int64)
    ne = ctypes.c_int64(0)
    nc = ctypes.c_int64(0)
    ncc = ctypes.c_int64(0)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i8p = ctypes.POINTER(ctypes.c_int8)
    rc = lib.dbscan_pass2(
        len(bounds_c) - 1,
        bounds_c.ctypes.data_as(i64p),
        ids_c.ctypes.data_as(i64p),
        xs_c.ctypes.data_as(f64p),
        ys_c.ctypes.data_as(f64p),
        tags_c.ctypes.data_as(i8p),
        core_c.ctypes.data_as(i8p),
        float(eps2), float(s),
        edges.ctypes.data_as(i64p), edge_cap, ctypes.byref(ne),
        cands.ctypes.data_as(i64p), cand_cap, ctypes.byref(nc),
        ccells.ctypes.data_as(i64p), ccell_cap, ctypes.byref(ncc),
    )
    if rc != 0:
        return None
    return (
        edges[: 2 * ne.value].reshape(-1, 2),
        cands[: 2 * nc.value].reshape(-1, 2),
        ccells[: 2 * ncc.value].reshape(-1, 2),
    )
