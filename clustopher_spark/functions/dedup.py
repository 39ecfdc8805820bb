"""Deduplication operators for training-data pipelines, at five fidelity
levels (exact -> n-gram Jaccard -> MinHash+LSH -> SimHash -> winnowing
substring spans). Designed for the 100 TB regime: every
candidate-generation step is a hash-bucket equi-join (shuffle on a small
key), never an O(n^2) comparison; exact pairwise similarity is only
computed within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# 2^31-1: keeps a*h+b within int64 under ANSI overflow checking
# (a, h < 2^31 -> a*h < 2^62)
MERSENNE_PRIME = (1 << 31) - 1


def portable_hash60(col: Column) -> Column:
    """60-bit hash reproducible across engines: first 15 hex digits of md5,
    read base-16. Spark's ``conv`` and DuckDB's ``('0x' || hex)::BIGINT``
    agree exactly, so pipelines built on it (minhash/simhash ``portable``
    mode) can be replayed verbatim by the SQL oracle. xxhash64 stays the
    default for production (faster, codegen'd); the hash only has to be
    *uniform*, not any particular function, for LSH guarantees to hold.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# --- exact -------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact content hash (hash-groupBy:
    one shuffle on the 128-bit digest, no full-text comparison)."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        df.withColumn("content_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of a row-exploding stage: document tables often
    arrive as one small parquet file (one partition), which would serialize
    the 30-60x shingle/token fan-out onto a single core. Scale-adaptive
    (round 8, guide §2): only widens — an input that already has >=
    defaultParallelism partitions (any real-scale scan) passes through
    untouched instead of paying a full-corpus shuffle down to core count."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parts:
        return df
    return df.repartition(parts)


# --- shingles ----------------------------------------------------------------

def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array (empty-safe)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs with word-k-gram Jaccard >= threshold.

    Inverted-index join: explode shingles, equi-join on the shingle, count
    common shingles per pair, then |A∩B| / (|A| + |B| - |A∩B|). The only
    O(pairs) work happens on pairs that share at least one shingle.

    ``max_shingle_df``: drop shingles occurring in more than this many
    documents before the join. At corpus scale a handful of boilerplate
    shingles otherwise generate O(df^2) join rows (the classic hot-key
    blowup); capping document frequency bounds the worst key at
    max_shingle_df^2 while leaving Jaccard for near-dup pairs essentially
    unchanged (dropped shingles are shared by *everything*). Exact Jaccard
    requires None (the default).
    """
    df = _spread(df)
    sh = df.select(
        F.col(id_col).alias("id"), F.size(shingles(F.col(text_col), k)).alias("n_sh"),
        F.explode(shingles(F.col(text_col), k)).alias("sh"),
    )
    if max_shingle_df is not None:
        doc_freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        hot = doc_freq.filter(F.col("_df") > max_shingle_df).select("sh")
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        # exact int/int double division — deterministic across engines, no
        # rounding (rounding INTRODUCES half-up-vs-half-even mismatches)
        .select("id_a", "id_b", F.col("jaccard"))
    )


# --- MinHash + LSH -----------------------------------------------------------

def _perm_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutations."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_PRIME), rng.randrange(0, MERSENNE_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes]) MinHash signatures.

    One explode + one groupBy: each shingle is hashed once with xxhash64
    (JVM-side), then the num_hashes permutations are affine transforms of
    that single hash — min-aggregated per document. No UDFs.
    ``portable=True`` swaps the base hash for :func:`portable_hash60` so a
    DuckDB oracle can reproduce the signatures bit-for-bit.
    """
    params = _perm_params(num_hashes, seed)
    df = _spread(df)
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k)).alias("sh")
    )
    base = portable_hash60(F.col("sh")) if portable else F.xxhash64("sh")
    h = F.pmod(base, F.lit(MERSENNE_PRIME))
    hashed = sh.select("id", h.alias("h"))
    # one F.expr per permutation instead of five Column-API calls each:
    # the Column chain cost ~200 py4j round trips per construction
    # (measured as real per-rep wall time — queries build fresh frames
    # every execution); the SQL text parses to the IDENTICAL
    # Multiply/Add/Pmod AST, so values are unchanged
    mins = [
        F.expr(
            f"min(pmod({a}L * h + {b}L, {MERSENNE_PRIME}L))"
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """LSH banding: two docs are candidates if any band of their signatures
    matches exactly. Explode to (band_idx, band_hash) keys and self-join —
    the standard bucket-join pattern; shuffle key cardinality ~ n * bands.
    ``portable=True`` keys bands on the comma-joined signature values
    (engine-neutral string) instead of xxhash64 of the slice.
    """

    def band_key(b):
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        if portable:
            return F.concat_ws(",", F.transform(sl, lambda x: x.cast("string")))
        return F.xxhash64(sl)

    banded = signatures.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidates ->
    signature-estimated Jaccard filter. Estimated Jaccard = fraction of
    matching signature positions."""
    # signatures feed three plan branches (banding + both sides of the
    # estimate join) — cache so the shingle explosion runs once
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k, portable=portable).cache()
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands, portable=portable)
    a = sigs.alias("sa")
    b = sigs.alias("sb")
    joined = (
        cands.join(a, cands.id_a == F.col("sa.id"))
        .join(b, cands.id_b == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sa.sig", "sb.sig", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
    )
    return joined.filter(F.col("est_jaccard") >= threshold)


# --- SimHash -------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id, simhash BIGINT): per-token xxhash64, bitwise weighted majority.

    Explode tokens -> per-bit +/-1 contributions summed in one groupBy
    (64 conditional-sum expressions, all codegen'd) -> sign bits packed.
    ``portable=True`` uses the 60-bit cross-engine hash (pass ``bits<=60``)
    so the DuckDB oracle can replay the exact simhash values.
    """
    if portable and bits > 60:
        raise ValueError("portable simhash is limited to 60 bits (15 hex digits)")
    toks = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    base = portable_hash60(F.col("tok")) if portable else F.xxhash64("tok")
    h = toks.select("id", base.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = h.groupBy("id").agg(*bit_sums)
    packed = F.lit(0).cast("long")
    for i in range(bits):
        packed = packed.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("id", packed.alias("simhash"))


def simhash_near_pairs(
    sim_df: DataFrame, max_hamming: int = 8, bits: int = 64
) -> DataFrame:
    """Candidate pairs with Hamming distance <= max_hamming.

    Pigeonhole banding: split the hash into 4 equal chunks and equi-join on
    (chunk_idx, chunk_value). Recall is exact for pairs within distance
    <= 3 (pigeonhole: <4 differing bits leave one chunk untouched); beyond
    that it is the standard LSH trade — pairs whose >=4 diffs spread across
    all 4 chunks are missed, and raising recall means more/narrower chunks
    at quadratically hotter join keys. Precision is exact either way: the
    popcount filter runs on every candidate."""
    chunks = 4
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    banded = sim_df.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * chunk_bits).bitwiseAND(F.lit(mask))
                    for i in range(chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def _unionfind_min_roots(a, b):
    """Vectorized min-root union-find over two id arrays (driver tail).

    Compacts ids to dense indices (``np.unique`` sorts, so index order ==
    value order and the min index is the min id), then alternates
    edge-relaxation (push the min endpoint label across every edge) with
    pointer jumping (``parent = parent[parent]``) until fixpoint — each
    pass is O(E) numpy, and the jump makes chains converge in O(log
    diameter) passes. Returns (ids, roots) as numpy arrays.
    """
    import numpy as np

    uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    parent = np.arange(len(uniq))
    while True:
        prev = parent.copy()
        m = np.minimum(parent[ia], parent[ib])
        np.minimum.at(parent, ia, m)
        np.minimum.at(parent, ib, m)
        parent = np.minimum(parent, parent[parent])
        if np.array_equal(parent, prev):
            break
    return uniq, uniq[parent]


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """Group near-duplicate pairs into components: (id, group_id) with
    group_id = the minimum member id — the canonical-document selection
    step after any pairwise dedup (keep ``id == group_id``, drop the rest).

    Two-phase star CC (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) with a bounded driver finisher:

    * While the edge list is larger than ``driver_edge_limit``, alternate
      **large-star** (every vertex u points each LARGER neighbor v at
      m(u) = min of u's closed neighborhood) and **small-star** (every
      vertex u points its SMALLER neighbors and itself at the minimum of
      those) — each a groupBy + self-join edge rewrite that preserves
      connectivity, emits only (larger, smaller) edges, and provably
      converges to per-component stars around the component minimum in
      O(log^2 n) rounds. Unlike fixed-edge min-label propagation (O(
      diameter) rounds over the FULL edge list every round), the edge
      set here collapses geometrically — dup-group cliques flatten in
      one round, long cell-chains (the DBSCAN contraction shape) halve
      per round.
    * Once the edge list fits under ``driver_edge_limit`` it is pulled
      to the driver and finished exactly with a vectorized min-root
      union-find (the same bounded driver-tail pattern as the zoom
      pyramid's <=100k-row numpy tail; 2M edges = ~32 MB via Arrow).
      Star rounds never drop a non-isolated vertex from the edge list,
      so the finisher sees every vertex that still needs a label.

    Every loop-carried checkpoint goes through ``truncate_lineage`` (not
    a bare ``localCheckpoint``): checkpoints inherit the origin plan's
    multiplicative join-size estimate, and carrying that through an
    iterative multi-join round makes the driver's BigInteger stats
    arithmetic the bottleneck by round ~8 (see plans/lineage.py).

    ``vertices``: optional (id) DataFrame of ALL ids (isolated ids come
    out as their own group); defaults to ids present in ``pairs``.
    ``stats`` (out): distributed ``rounds`` run and ``driver_edges``
    handled by the union-find finisher.
    """
    from clustopher_spark.plans.lineage import truncate_lineage

    # canonical undirected edges (hi, lo); star rounds keep this invariant
    e = truncate_lineage(
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("a"),
            F.least(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if vertices is None:
        vertices = (
            e.select(F.col("a").alias("id"))
            .unionAll(e.select(F.col("b").alias("id")))
            .distinct()
        )
    labels = vertices.select("id", F.col("id").alias("label"))
    spark = labels.sparkSession
    id_type = labels.schema["label"].dataType
    if stats is not None:
        stats.setdefault("rounds", 0)
        stats.setdefault("driver_edges", 0)
    prev_n = -1
    for _ in range(max_iter):
        n_e = e.count()
        if n_e == 0:
            return labels.select("id", F.col("label").alias("group_id"))
        if n_e <= driver_edge_limit:
            break
        # converged distributively (star form reached while still above
        # the driver limit): second element of every edge is the
        # component min, so the edge list IS the label map
        if n_e == prev_n and e.exceptAll(prev_e).count() == 0:
            # defensive reduce (round-3 advice): the Kiveris star-convergence
            # theorem says the fixpoint is a perfect star (one outgoing edge
            # per non-root vertex), but this exit is only exercised above
            # driver_edge_limit where that is effectively untested — if a
            # fixpoint ever retained a vertex with edges to two labels, the
            # label join would fan out and emit conflicting group_ids. One
            # groupBy(min) is O(edge-list), preserves the min-label
            # semantics either way, and makes the exit safe by construction.
            star = (
                e.groupBy(F.col("a").alias("v"))
                .agg(F.min("b").alias("root"))
            )
            labels = labels.join(star, labels.label == star.v, "left").select(
                "id", F.coalesce("root", "label").alias("label")
            )
            return labels.select("id", F.col("label").alias("group_id"))
        prev_n, prev_e = n_e, e
        # joins broadcast the per-vertex min table when the graph is small
        # enough; above that they fall back to shuffle joins — the correct
        # huge-graph plan (both sides co-partitioned on the vertex key)
        hint = F.broadcast if n_e <= 8_000_000 else (lambda df: df)
        # large-star: u -> edges (v, m(u)) for neighbors v > u,
        # m(u) = min(closed neighborhood of u)
        adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = adj.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        e = truncate_lineage(
            adj.filter(F.col("v") > F.col("u"))
            .join(hint(m), "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # small-star: u -> edges (v, m) for smaller neighbors v plus
        # (u, m), m = min of u's smaller neighbors
        adj2 = e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        m2 = adj2.groupBy("u").agg(F.min("v").alias("m"))
        e = truncate_lineage(
            adj2.join(hint(m2), "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionAll(
                m2.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .select(
                F.greatest(F.col("a"), F.col("b")).alias("a"),
                F.least(F.col("a"), F.col("b")).alias("b"),
            )
            .distinct()
        )
        if stats is not None:
            stats["rounds"] = stats.get("rounds", 0) + 1
    else:
        raise RuntimeError(
            f"connected_components did not contract under "
            f"{driver_edge_limit} edges in {max_iter} rounds — raise "
            f"max_iter or driver_edge_limit"
        )
    # driver finisher: exact union-find over the shrunken edge list
    import pandas as pd

    pdf = e.toPandas()  # bounded by driver_edge_limit rows
    ids, roots = _unionfind_min_roots(pdf["a"].to_numpy(), pdf["b"].to_numpy())
    moved = ids != roots
    mapping = spark.createDataFrame(
        pd.DataFrame({"v": ids[moved], "root": roots[moved]}),
        schema=T.StructType(
            [T.StructField("v", id_type), T.StructField("root", id_type)]
        ),
    )
    labels = labels.join(
        F.broadcast(mapping), labels.label == mapping.v, "left"
    ).select("id", F.coalesce("root", "label").alias("label"))
    if stats is not None:
        stats["driver_edges"] = int(len(pdf))
    return labels.select("id", F.col("label").alias("group_id"))


# --- substring-level (winnowing) ---------------------------------------------

def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    segment_chars: int = 1 << 16,
    portable: bool = True,
    distinct: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every k-char gram (stride 1), keep the minimum hash of each
    window of w consecutive gram hashes. Returns DISTINCT (id_col, fp).

    Guarantee: any substring of length >= w + k - 1 chars shared verbatim
    by two documents yields at least one common fingerprint in both,
    regardless of the span's offset in either document — the property
    strided shingles lack at any stride > 1. Density 2/(w+1).

    Plan shape (round-8 optimization, guide §2.3/§2.4): the winnow min
    is PER-DOCUMENT — no cross-document work exists until fingerprints
    emerge — so the whole computation runs MAP-SIDE with array
    higher-order functions: slice the text into overlapping segments
    (each owns ``segment_chars`` fingerprint positions and carries the
    ``w + k - 2`` extra chars its last windows need, so every global
    winnow min is computed locally and exactly once), then per segment
    gram-hash array -> sliding ``array_min`` -> ``array_distinct`` ->
    explode. ONE scan, ZERO window sorts; the only exchange is the
    final DISTINCT's, which carries unique fingerprints (density
    2/(w+1) of gram positions) instead of every gram hash — ~9x fewer
    rows than the previous exchange+running-window plan, which shuffled
    and sorted all ~len(text) gram hashes per document just to express
    a running min relationally. Segmenting bounds the in-flight arrays
    at ~``segment_chars`` longs per row — the same memory rationale the
    exploded-position plan had — while the per-segment text slices sum
    to the document (+ overlap), so no payload amplification.

    ``portable=True`` (default) hashes grams with :func:`portable_hash60`
    so the DuckDB oracle can replay the pipeline verbatim; ``False`` is
    the production twin on ``xxhash64`` (codegen'd, no md5 round-trip per
    gram — the hash only has to be uniform for the winnowing guarantee,
    which is positional, to hold). Same flag contract as MinHash/SimHash.

    ``distinct=False`` skips the final global DISTINCT (its exchange is
    this function's only shuffle) for consumers that immediately
    re-aggregate by ``fp`` with a set semantic anyway (e.g. the
    inverted-index pair join's ``collect_set``): per-segment
    ``array_distinct`` still applies, so the only possible duplicates
    are the same fingerprint surfacing in two segments of one document.
    """
    gram_hash = (
        portable_hash60 if portable else (lambda c: F.xxhash64(c))
    )
    # the per-char gram hashing below is the heavy stage and it now runs
    # entirely map-side — spread a single-file input across cores first
    # (the old exchange+window plan hashed in the pre-exchange map stage
    # too, so it serialized the same way without this)
    d = _spread(df.filter(F.length(text_col) >= k + w - 1))
    n_pos = (F.length(text_col) - F.lit(k - 1)).cast("long")  # grams: 1..n_pos
    n_fp = n_pos - F.lit(w - 1)  # fingerprint positions: 1..n_fp
    seg = F.lit(int(segment_chars)).cast("long")
    # segment j owns fp positions j*seg+1 .. min((j+1)*seg, n_fp); its text
    # slice starts at char j*seg+1 and spans segment_chars + k + w - 2 chars
    # (substring clamps at end-of-string), so grams j*seg+1 .. j*seg+cnt+w-1
    # — everything its cnt winnow windows read — are local to the slice
    seg_texts = F.transform(
        F.sequence(F.lit(0), F.floor((n_fp - F.lit(1)) / seg).cast("int")),
        lambda j: F.substring(
            F.col(text_col),
            (j.cast("long") * seg + F.lit(1)).cast("int"),
            int(segment_chars) + k + w - 2,
        ),
    )
    l_pos = (F.length("_seg") - F.lit(k - 1)).cast("int")  # local grams
    hs = F.transform(
        F.sequence(F.lit(1), l_pos),
        lambda p: gram_hash(F.substring(F.col("_seg"), p, k)),
    )
    fps_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), l_pos - F.lit(w - 1)),
            lambda i: F.array_min(F.slice(F.col("_hs"), i, w)),
        )
    )
    out = (
        d.select(id_col, F.explode(seg_texts).alias("_seg"))
        .select(id_col, F.col("_seg"), hs.alias("_hs"))
        .select(id_col, F.explode(fps_arr).alias("fp"))
    )
    return out.distinct() if distinct else out


def substring_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    min_common: int = 2,
    max_fp_df: int = 64,
    portable: bool = True,
) -> DataFrame:
    """Candidate pairs of documents sharing >= ``min_common`` winnowing
    fingerprints — i.e. sharing that many (not necessarily contiguous)
    verbatim spans of >= w + k - 1 chars. Returns (id_a, id_b,
    n_common_fps) with id_a < id_b; feed to ``connected_components`` to
    group boilerplate/template families.

    Scale: inverted-index on the fingerprint, never all-pairs. A
    fingerprint held by m docs contributes m(m-1)/2 pairs, so
    fingerprints with document frequency > ``max_fp_df`` are dropped —
    ubiquitous boilerplate is not a near-dup signal; the cap is a stated
    recall trade (same pattern as ngram_jaccard_pairs' hot-shingle cap).

    Plan (round-8 optimization, guide §2.4/§3.3): previously this was a
    window (fp document frequency) + equi-self-join on fp — which
    recomputed the whole winnow pipeline for BOTH join inputs (Spark
    does not share subtrees across a self-join) and paid a window sort.
    Now ONE ``groupBy(fp).collect_set(id)`` inverts the index (the df
    cap becomes a ``size() <= max_fp_df`` filter on aggregate-sized
    rows), and the pairs are emitted map-side from each fingerprint's
    sorted id array with array higher-order functions — the fingerprint
    pipeline runs once, no self-join, no window sort, and the capped
    group size bounds the in-flight pair arrays at m(m-1)/2 <= 2016
    structs. The upstream DISTINCT is skipped (``distinct=False``):
    ``collect_set`` already has set semantics per fingerprint.
    """
    fps = winnow_fingerprints(
        df, text_col, id_col, k=k, w=w, portable=portable, distinct=False
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_set(id_col)).alias("_ids"))
        .filter(F.size("_ids").between(2, max_fp_df))
        .select(F.explode(pairs_arr).alias("_p"))
        .select("_p.id_a", "_p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common_fps"))
        .filter(F.col("n_common_fps") >= min_common)
    )
