"""Native (C, via ctypes) twin of the greedy clustering kernel.

The greedy sweep in :mod:`clustopher_spark.operators.cluster` is an
inherently sequential per-supercell loop: each seed's member set depends
on which points earlier seeds consumed, so it cannot be expressed as
vectorized numpy (every vectorization attempt either changes the
semantics or re-introduces a per-seed Python iteration whose
interpreter + numpy-call overhead is ~10 us/seed). At the bench scales
that loop IS the pyramid build: a 30M-point corpus crosses it once per
chained zoom level, ~150M Python-loop iterations per build
(spark_optimization_guide.md §1.2 step 2 — per-task work — and §4.2: do
the heavy lifting in native code inside the UDF).

This module compiles a ~150-line C implementation of the *identical*
algorithm at first use (gcc is a base toolchain on the target hosts;
there is no build step and no binary is checked in — the .so is
content-addressed by source hash and cached, so every process after the
first just dlopens it). Per-seed cost drops from ~10 us to ~50 ns;
measured 12-75x per partition on the bench shapes, bit-identical output
(same IEEE doubles, same floor/comparison semantics, same seed order —
pinned by tests/test_native_kernel.py across densities including exact
r- and 2r-boundary lattices).

Fallback contract: if compilation or loading fails for any reason (no
compiler, read-only tmp, exotic platform), ``load()`` returns None and
callers keep using the numpy reference loop — behavior is unchanged,
only slower. ``CLUSTOPHER_NATIVE=0`` forces the fallback (used by the
equivalence tests to exercise both paths).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_C_SOURCE = r"""
/* Greedy epsilon-radius clustering kernel - C twin of the numpy
 * _greedy_assign loop (operators/cluster.py). Points of one task
 * partition arrive supercell-sorted; seg_bounds marks the supercell
 * segments. Per segment: r-sized grid, seeds in ascending id order;
 * the seed collects every unprocessed point within radius (squared
 * Euclidean, <=) in its 3x3 cell neighborhood; groups of >= min_points
 * become a cluster labeled with the seed id, otherwise the seed alone
 * becomes a singleton and its neighbours stay available. */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

typedef struct { int64_t id; int64_t idx; } IdIdx;

static int cmp_idid(const void *a, const void *b) {
    const IdIdx *x = (const IdIdx *)a, *y = (const IdIdx *)b;
    if (x->id < y->id) return -1;
    if (x->id > y->id) return 1;
    return (x->idx < y->idx) ? -1 : (x->idx > y->idx);
}

typedef struct {
    int64_t cap;
    int64_t *cx, *cy, *cell, *bucket, *members;
    IdIdx *order;
    unsigned char *processed;
    int64_t grid_cap;
    int64_t *grid_starts, *grid_cursor;
} Scratch;

static int ensure(Scratch *s, int64_t n, int64_t ncells) {
    if (n > s->cap) {
        int64_t c = s->cap ? s->cap : 1024;
        while (c < n) c *= 2;
        free(s->cx); free(s->cy); free(s->cell); free(s->bucket);
        free(s->members); free(s->order); free(s->processed);
        s->cx = malloc(c * sizeof(int64_t));
        s->cy = malloc(c * sizeof(int64_t));
        s->cell = malloc(c * sizeof(int64_t));
        s->bucket = malloc(c * sizeof(int64_t));
        s->members = malloc(c * sizeof(int64_t));
        s->order = malloc(c * sizeof(IdIdx));
        s->processed = malloc(c);
        if (!s->cx || !s->cy || !s->cell || !s->bucket || !s->members ||
            !s->order || !s->processed) return -1;
        s->cap = c;
    }
    if (ncells + 1 > s->grid_cap) {
        int64_t c = s->grid_cap ? s->grid_cap : 1024;
        while (c < ncells + 1) c *= 2;
        free(s->grid_starts); free(s->grid_cursor);
        s->grid_starts = malloc(c * sizeof(int64_t));
        s->grid_cursor = malloc(c * sizeof(int64_t));
        if (!s->grid_starts || !s->grid_cursor) return -1;
        s->grid_cap = c;
    }
    return 0;
}

static void release(Scratch *s) {
    free(s->cx); free(s->cy); free(s->cell); free(s->bucket);
    free(s->members); free(s->order); free(s->processed);
    free(s->grid_starts); free(s->grid_cursor);
}

int greedy_assign_segments(
    int64_t n_seg, const int64_t *seg_bounds,
    const int64_t *ids, const double *xs, const double *ys,
    double radius, int64_t min_points,
    int64_t *out)
{
    Scratch s;
    memset(&s, 0, sizeof(s));
    double r2 = radius * radius;
    for (int64_t g = 0; g < n_seg; g++) {
        int64_t lo = seg_bounds[g], hi = seg_bounds[g + 1];
        int64_t n = hi - lo;
        if (n <= 0) continue;
        if (n == 1) { out[lo] = ids[lo]; continue; }
        int64_t minx = INT64_MAX, miny = INT64_MAX;
        int64_t maxx = INT64_MIN, maxy = INT64_MIN;
        if (ensure(&s, n, 0)) { release(&s); return -1; }
        for (int64_t i = 0; i < n; i++) {
            int64_t cx = (int64_t)floor(xs[lo + i] / radius);
            int64_t cy = (int64_t)floor(ys[lo + i] / radius);
            s.cx[i] = cx; s.cy[i] = cy;
            if (cx < minx) minx = cx;
            if (cx > maxx) maxx = cx;
            if (cy < miny) miny = cy;
            if (cy > maxy) maxy = cy;
        }
        int64_t width = maxx - minx + 1, height = maxy - miny + 1;
        int64_t ncells = width * height;
        /* a supercell spans <= supercell_radii+1 r-cells per axis so the
         * grid is tiny; exotic callers (huge radius ratios) fall back to
         * the gridless scan below, same candidate set by cell distance */
        int gridless = (ncells > 16 * n + 1024);
        if (gridless) ncells = 0;
        if (ensure(&s, n, ncells)) { release(&s); return -1; }
        for (int64_t i = 0; i < n; i++) {
            s.cx[i] -= minx;
            s.cy[i] -= miny;
            if (!gridless) s.cell[i] = s.cx[i] * height + s.cy[i];
            s.order[i].id = ids[lo + i];
            s.order[i].idx = i;
            s.processed[i] = 0;
        }
        qsort(s.order, n, sizeof(IdIdx), cmp_idid);
        if (!gridless) {
            int64_t *starts = s.grid_starts, *cur = s.grid_cursor;
            memset(starts, 0, (ncells + 1) * sizeof(int64_t));
            for (int64_t i = 0; i < n; i++) starts[s.cell[i] + 1]++;
            for (int64_t c = 0; c < ncells; c++) starts[c + 1] += starts[c];
            memcpy(cur, starts, (ncells + 1) * sizeof(int64_t));
            for (int64_t i = 0; i < n; i++) s.bucket[cur[s.cell[i]]++] = i;
            for (int64_t oi = 0; oi < n; oi++) {
                int64_t seed = s.order[oi].idx;
                if (s.processed[seed]) continue;
                double sx = xs[lo + seed], sy = ys[lo + seed];
                int64_t scx = s.cx[seed], scy = s.cy[seed];
                int64_t y0 = scy > 0 ? scy - 1 : 0;
                int64_t y1 = scy + 1 < height ? scy + 1 : height - 1;
                int64_t nm = 0;
                for (int64_t x = scx - 1; x <= scx + 1; x++) {
                    if (x < 0 || x >= width) continue;
                    int64_t b0 = starts[x * height + y0];
                    int64_t b1 = starts[x * height + y1 + 1];
                    for (int64_t b = b0; b < b1; b++) {
                        int64_t j = s.bucket[b];
                        if (s.processed[j]) continue;
                        double dx = xs[lo + j] - sx, dy = ys[lo + j] - sy;
                        if (dx * dx + dy * dy <= r2) s.members[nm++] = j;
                    }
                }
                if (nm >= min_points) {
                    int64_t cid = ids[lo + seed];
                    for (int64_t m = 0; m < nm; m++) {
                        out[lo + s.members[m]] = cid;
                        s.processed[s.members[m]] = 1;
                    }
                } else {
                    out[lo + seed] = ids[lo + seed];
                    s.processed[seed] = 1;
                }
            }
        } else {
            for (int64_t oi = 0; oi < n; oi++) {
                int64_t seed = s.order[oi].idx;
                if (s.processed[seed]) continue;
                double sx = xs[lo + seed], sy = ys[lo + seed];
                int64_t scx = s.cx[seed], scy = s.cy[seed];
                int64_t nm = 0;
                for (int64_t j = 0; j < n; j++) {
                    if (s.processed[j]) continue;
                    int64_t ddx = s.cx[j] - scx, ddy = s.cy[j] - scy;
                    if (ddx < -1 || ddx > 1 || ddy < -1 || ddy > 1) continue;
                    double dx = xs[lo + j] - sx, dy = ys[lo + j] - sy;
                    if (dx * dx + dy * dy <= r2) s.members[nm++] = j;
                }
                if (nm >= min_points) {
                    int64_t cid = ids[lo + seed];
                    for (int64_t m = 0; m < nm; m++) {
                        out[lo + s.members[m]] = cid;
                        s.processed[s.members[m]] = 1;
                    }
                } else {
                    out[lo + seed] = ids[lo + seed];
                    s.processed[seed] = 1;
                }
            }
        }
    }
    release(&s);
    return 0;
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


# -ffp-contract=off: gcc defaults to contracting a*a + b*b into FMA where
# the target allows it (aarch64, x86 with -march), which rounds once
# instead of twice and can flip a <= r2 boundary comparison relative to
# the JVM's (never-fused) evaluation — silently breaking the bit-equality
# contract with the numpy/SQL twins on such hosts. -fno-fast-math pins
# the rest of IEEE semantics explicitly.
_GCC_FLAGS = ["-O3", "-ffp-contract=off", "-fno-fast-math", "-shared", "-fPIC"]


def _build() -> object | None:
    # the digest covers source AND flags: a flag change must invalidate
    # the cached .so, or stale kernels with different FP semantics survive
    digest = hashlib.sha256(
        (_C_SOURCE + "\n//" + " ".join(_GCC_FLAGS)).encode()
    ).hexdigest()[:16]
    cache = _cache_dir()
    so_path = os.path.join(cache, f"greedy_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache, exist_ok=True)
        src = os.path.join(cache, f"greedy_{digest}.c")
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
    lib.greedy_assign_segments.restype = ctypes.c_int
    lib.greedy_assign_segments.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def load() -> object | None:
    """The compiled kernel library, building it on first call; None when
    native is disabled or unavailable (callers then use the numpy loop)."""
    global _LIB
    if _LIB is False:
        if os.environ.get("CLUSTOPHER_NATIVE", "1") == "0":
            _LIB = None
        else:
            try:
                _LIB = _build()
            except Exception as e:  # no compiler / RO tmp / exotic platform
                print(
                    f"# clustopher native kernel unavailable ({e!r}); "
                    "using the numpy fallback",
                    file=sys.stderr,
                )
                _LIB = None
    return _LIB


def assign_sorted_segments(ids, xs, ys, bounds, radius, min_points):
    """Native greedy assignment over supercell-sorted arrays.

    ``bounds`` is the segment-boundary index array (len = n_segments + 1).
    Returns the cluster-id array aligned with the sorted input, or None
    when the native kernel is unavailable.
    """
    import numpy as np

    lib = load()
    if lib is None:
        return None
    ids_c = np.ascontiguousarray(ids, dtype=np.int64)
    xs_c = np.ascontiguousarray(xs, dtype=np.float64)
    ys_c = np.ascontiguousarray(ys, dtype=np.float64)
    bounds_c = np.ascontiguousarray(bounds, dtype=np.int64)
    out = np.empty(len(ids_c), dtype=np.int64)
    rc = lib.greedy_assign_segments(
        len(bounds_c) - 1,
        bounds_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ids_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        xs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ys_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(radius), int(min_points),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:  # allocation failure inside the kernel
        return None
    return out
