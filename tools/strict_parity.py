"""Strict driver-replica parity: value-level compare at sf0.01.

The local pytest harness (`tests/test_oracle_parity.py`) normalizes cells
leniently (1 == 1.0, dates ~ timestamps), which let a driver hash mismatch
through in round 1. This tool compares each oracle STRICTLY the way the
driver plausibly hashes: sort columns by name, sort rows, then compare the
stringified cell values with floats rounded to a fixed precision — an
int64 1 and a float64 1.0 do NOT match.

Usage: python tools/strict_parity.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NULL"
        # floats: 9 significant-ish digits (queries round outputs to <= 4
        # decimals by policy, so this only needs to absorb binary repr noise)
        return f"f:{float(v):.9g}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"s:{v}"


def canon_frame(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    prefixes = tuple(args) if args else None

    import duckdb

    import __spark_entry__ as entrymod
    from clustopher_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in oracles if prefixes is None or n.startswith(prefixes)]
    bad = []
    for i, name in enumerate(names):
        try:
            spd = qs[name](spark, sf_dir).toPandas()
            for c in spd.columns:  # tz-naive both sides (session tz is UTC)
                if str(spd[c].dtype).startswith("datetime64") and getattr(spd[c].dt, "tz", None):
                    spd[c] = spd[c].dt.tz_localize(None)
            dpd = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"[{i + 1}/{len(names)}] ERROR {name}: {exc}")
            continue
        sc, sr = canon_frame(spd)
        dc, dr = canon_frame(dpd)
        if sc != dc:
            bad.append(name)
            print(f"[{i + 1}/{len(names)}] FAIL {name}: columns {sc} vs {dc}")
            continue
        if sr != dr:
            bad.append(name)
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:2]
            extra = abs(len(sr) - len(dr))
            print(f"[{i + 1}/{len(names)}] FAIL {name}: {len(sr)} vs {len(dr)} rows"
                  f" (len diff {extra}); first diffs: {diff}")
            continue
        print(f"[{i + 1}/{len(names)}] ok {name} ({len(sr)} rows)")
    print(f"\n{len(names) - len(bad)}/{len(names)} strict-match")
    if bad:
        print("FAILING:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
