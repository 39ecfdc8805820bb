"""Persisted IVF-PQ index: build/query/append lifecycle.

Contract: a built index answers exactly like the one-shot
``ann_ivf_pq_topk`` under the same quantizers; appended rows are
queryable without retraining; replayed appends are no-ops; and the
probed query reads ONLY the probed list partitions (directory-level
pruning, asserted on the physical plan)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clustopher_spark.functions.similarity import (
    ann_ivf_pq_topk,
    cosine_topk_bruteforce,
)
from clustopher_spark.sources.vector_index import IVFPQIndex


def _embeddings(spark, n=300, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    base[1] = base[0] + rng.normal(scale=0.01, size=dim)  # planted near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_vector_index_matches_oneshot_and_appends(spark, tmp_path):
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 5)
    idx = IVFPQIndex(spark, str(tmp_path / "idx"), n_lists=8,
                     m_subvectors=4, n_codes=32)
    n = idx.build(e)
    assert n == 300

    got = idx.topk(q, k=5, n_probe=3, refine=4).collect()
    # same quantizers -> identical answers to the one-shot operator
    cents, books, _ = idx._quantizers()
    want = ann_ivf_pq_topk(
        e, q, k=5, n_lists=8, n_probe=3, m_subvectors=4, n_codes=32,
        refine=4, centroids=cents, codebooks=books,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the planted near-dup surfaces
    assert any(r.query_id == 0 and r.neighbor_id == 1 for r in got)

    # a REOPENED instance (fresh object, stored quantizers) answers the same
    idx2 = IVFPQIndex(spark, str(tmp_path / "idx"))
    got2 = idx2.topk(q, k=5, n_probe=3, refine=4).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))

    # append a new planted near-dup of query 2 with FROZEN quantizers
    target = e.filter(F.col("vec_id") == 2).first().embedding
    new = spark.createDataFrame(
        [(1000, [float(x) + 0.001 for x in target])],
        "vec_id long, embedding array<double>",
    )
    assert idx.append(new, 0) is True
    assert idx.append(new, 0) is False  # committed replay skipped
    got3 = idx.topk(q, k=5, n_probe=3, refine=4).collect()
    assert any(r.query_id == 2 and r.neighbor_id == 1000 and r.rank == 1
               for r in got3)

    # recall sanity vs brute force on the base corpus
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk_bruteforce(e, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in got}
    assert len(approx & brute) / len(brute) >= 0.5


def test_vector_index_partition_prunes(spark, tmp_path):
    e = _embeddings(spark, seed=11)
    idx = IVFPQIndex(spark, str(tmp_path / "idx"), n_lists=8,
                     m_subvectors=4, n_codes=32)
    idx.build(e)
    q = e.filter(F.col("vec_id") < 2)
    plan = idx.topk(q, k=3, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    # the probed list ids must reach the scan as a partition filter
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]
