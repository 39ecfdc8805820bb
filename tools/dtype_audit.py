"""Driver-fidelity dtype audit.

The round-1 `window_gaps_islands` hash failure was a *dtype* mismatch the
lenient local parity harness couldn't see: DuckDB returns SUM(int) as
HUGEINT, which `fetchdf()` materializes as float64, while Spark emits
bigint.  `_norm_cell`-style compares treat 1 == 1.0 so the local replica
passed while the driver's value hash failed.

This audit mimics the driver more faithfully: for every oracle-backed
query it fetches both sides as pandas and requires each column to have the
same *kind* (integer / float / boolean / datetime / object).  Run at
sf0.001 for speed — dtypes don't depend on scale.

Usage:  python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def kind(dtype) -> str:
    s = str(dtype)
    if s.startswith("datetime64"):
        return "datetime"
    import pandas.api.types as pt

    if pt.is_bool_dtype(dtype):
        return "bool"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import duckdb

    import __spark_entry__ as entrymod
    from clustopher_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, sql in oracles.items():
        try:
            spark_pd = qs[name](spark, sf_dir).toPandas()
            duck_pd = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            print(f"FAIL {name}: {exc}")
            continue
        s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
        if s_cols != d_cols:
            bad.append((name, f"columns {s_cols} vs {d_cols}"))
            print(f"FAIL {name}: column sets differ")
            continue
        for c in s_cols:
            ks, kd = kind(spark_pd[c].dtype), kind(duck_pd[c].dtype)
            if ks != kd:
                bad.append((name, f"col {c}: spark {ks}({spark_pd[c].dtype}) vs duckdb {kd}({duck_pd[c].dtype})"))
                print(f"FAIL {name}.{c}: spark={spark_pd[c].dtype} duckdb={duck_pd[c].dtype}")
    print(f"\n{len(oracles) - len({n for n, _ in bad})}/{len(oracles)} clean")
    for name, why in bad:
        print(f"  {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
