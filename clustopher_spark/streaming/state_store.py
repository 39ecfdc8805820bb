"""Shared atomic-commit plumbing for the streaming state stores.

The sketch stores (heavy_hitters.py, quantiles.py) fold non-idempotent
merges per micro-batch, so their replay-skip bookkeeping (last folded
batch id) must commit ATOMICALLY with the folded state — two separate
parquet commits leave a crash window where a restart refolds a batch and
silently voids the stores' error bounds (round-3 advice). The fix is the
PyramidStore pattern (streaming/pyramid.py): every fold writes its state
under a fresh immutable ``versions/v{N}`` directory, then repoints ONE
``meta.json`` with a single atomic rename carrying both the version
pointer and the fold counters. A crash anywhere leaves the previous
(state, meta) pair fully consistent; the replayed batch refolds against
exactly the state it originally saw.
"""

from __future__ import annotations

import json
import os
import shutil


def read_meta(root: str) -> dict | None:
    path = os.path.join(root, "meta.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def commit_meta(root: str, meta: dict) -> None:
    """Single-file atomic repoint (rename within one directory)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, default=str)
    os.replace(tmp, path)


def version_dir(root: str, version: int) -> str:
    return os.path.join(root, "versions", f"v{version}")


def prune_versions(root: str, keep: set[int]) -> None:
    """Best-effort removal of version directories not in ``keep`` — called
    AFTER the meta repoint, so a crash mid-prune only leaves garbage, never
    dangling references."""
    vroot = os.path.join(root, "versions")
    if not os.path.isdir(vroot):
        return
    for d in os.listdir(vroot):
        if d.startswith("v") and int(d[1:]) not in keep:
            shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)
