"""Replicates the driver's correctness gate locally: run every registered
query on Spark AND its DuckDB oracle over the same parquet, compare
row-count, sorted column names, and values (order-insensitive).

Strictly stronger than a value-hash: we compare actual values with exact
equality for non-floats and tiny-epsilon for floats (queries are written to
be bit-identical after their declared rounding, so epsilon ~0 in practice).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("CLUSTOPHER_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle_result(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, row in df_pandas[cols].iterrows():
        rows.append(tuple(_norm_cell(v) for v in row))
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _pairs():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, oracle):
    sdf = fn(spark, SF_DIR)
    spark_pd = sdf.toPandas()
    # normalize timestamp columns to naive datetimes for compare
    for c in spark_pd.columns:
        if str(spark_pd[c].dtype).startswith("datetime64"):
            spark_pd[c] = spark_pd[c].dt.tz_localize(None) if spark_pd[c].dt.tz else spark_pd[c]
    if oracle is None:
        # rows-only contract: query must run and be deterministic
        again = fn(spark, SF_DIR).toPandas()
        assert _canon(spark_pd) == _canon(again), f"{name} not deterministic"
        return
    duck_pd = _oracle_result(oracle)
    s_cols, s_rows = _canon(spark_pd)
    d_cols, d_rows = _canon(duck_pd)
    assert s_cols == d_cols, f"{name} schema mismatch: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name} rowcount {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches, first: {mismatches[:3]}"
