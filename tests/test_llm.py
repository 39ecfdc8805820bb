"""Dedup / similarity / text-analysis / multimodal unit tests with planted
duplicates and measured ANN recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clustopher_spark.functions.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from clustopher_spark.functions.multimodal import (
    decode_images,
    extract_audio_features,
    sample_video_frames,
)
from clustopher_spark.functions.similarity import (
    ann_lsh_topk,
    cosine_topk_bruteforce,
    embedding_cosine_near_dups,
)
from clustopher_spark.functions.text import lang_id, quality_score, token_count

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into "
    "the deep green forest to find some food for the long cold winter"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("quick", "swift")),  # near dup of 1
        (4, "completely different text about spark sql engines and shuffles"),
        (5, "der hund und die katze sind gute freunde und das ist schön"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    d = _docs(spark)
    kept = exact_dedup(d).select("doc_id").collect()
    ids = {r.doc_id for r in kept}
    assert ids == {1, 3, 4, 5}  # doc 2 dropped, lowest id kept


def test_ngram_jaccard_finds_near_dup(spark):
    d = _docs(spark)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(d, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_dups(spark):
    d = _docs(spark)
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_dedup_pairs(d, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0  # identical signatures
    assert (1, 3) in pairs  # near dup caught by at least one band
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_simhash_near_pairs(spark):
    d = _docs(spark)
    sim = simhash(d)
    vals = {r.id: r.simhash for r in sim.collect()}
    assert vals[1] == vals[2]
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(sim, max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 16
    assert (1, 4) not in pairs


def test_text_functions(spark):
    d = _docs(spark)
    out = {r.doc_id: r for r in d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        F.round(quality_score(F.col("text")), 4).alias("q"),
        lang_id(F.col("text")).alias("lang"),
    ).collect()}
    assert out[1].n_tok == len(BASE.split())
    assert out[1].lang == "en"
    assert out[5].lang == "de"
    assert 0.0 <= out[4].q <= 1.0


def _embeddings(spark, n=200, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs[1] = vecs[0] + rng.standard_normal(dim).astype(np.float32) * 0.01  # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_topk_exact(spark):
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") == 0)
    top = cosine_topk_bruteforce(e, q, k=3, vec_col="embedding").collect()
    assert top[0].neighbor_id == 1  # the planted near-dup ranks first
    assert top[0].cos_sim > 0.99
    assert [r.rank for r in top] == [1, 2, 3]


def test_ann_lsh_recall(spark):
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 10)
    brute = cosine_topk_bruteforce(e, q, k=5, vec_col="embedding")
    ann = ann_lsh_topk(e, q, k=5, bits=4, dim=16, vec_col="embedding")
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    recall = len(a & b) / len(b)
    # 4-bit single-probe LSH on random gaussians: expect moderate recall,
    # and the planted near-dup (same bucket w.h.p.) must be found
    assert recall >= 0.3, f"ANN recall {recall}"
    assert (0, 1) in a


def test_embedding_near_dup_pairs(spark):
    e = _embeddings(spark)
    pairs = {(r.id_a, r.id_b) for r in
             embedding_cosine_near_dups(e, threshold=0.95, bits=4, dim=16).collect()}
    assert (0, 1) in pairs


def test_multimodal_stubs(spark):
    rows = [(i, bytes([i % 256] * 64)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, content binary")

    imgs = decode_images(df).collect()
    assert len(imgs) == 10
    assert all(64 <= r.width < 256 and len(r.features) == 16 for r in imgs)
    # determinism: same bytes -> same decoded properties
    again = {r.id: (r.width, r.height, r.format) for r in decode_images(df).collect()}
    assert all(again[r.id] == (r.width, r.height, r.format) for r in imgs)

    audio = extract_audio_features(df).collect()
    assert len(audio) == 10 and all(r.sample_rate in (8000, 16000, 44100) for r in audio)

    frames = sample_video_frames(df, frames_per_video=3).collect()
    assert len(frames) == 30
    assert {r.frame_idx for r in frames} == {0, 1, 2}

    from clustopher_spark.functions.multimodal import resize_images

    resized = resize_images(df, target=(224, 224)).collect()
    assert len(resized) == 10
    assert all(r.width == 224 and r.height == 224 for r in resized)
    assert all(isinstance(r.content, (bytes, bytearray)) and len(r.content) > 0 for r in resized)
    # determinism + target-sensitivity of the stub re-encode
    again = {r.id: bytes(r.content) for r in resize_images(df, target=(224, 224)).collect()}
    other = {r.id: bytes(r.content) for r in resize_images(df, target=(64, 64)).collect()}
    for r in resized:
        assert again[r.id] == bytes(r.content)
        assert other[r.id] != bytes(r.content)


def test_bpe_ish_token_count(spark):
    from clustopher_spark.functions.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(1, "hello, world! 42"), (2, "a"), (3, "x.y")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n for r in df.select(
        "doc_id", bpe_ish_token_count(F.col("text")).alias("n")
    ).collect()}
    # "hello" "," "world" "!" "42" = 5 pieces; "a" = 1; "x" "." "y" = 3
    assert out[1] == 5 and out[2] == 1 and out[3] == 3


def test_ngram_jaccard_df_cap(spark):
    from clustopher_spark.functions.dedup import ngram_jaccard_pairs

    d = _docs(spark)
    # with an aggressive cap the exact-dup pair must survive (its shingles
    # are shared by only 2-3 docs), and no spurious pairs appear
    pairs = {(r.id_a, r.id_b) for r in
             ngram_jaccard_pairs(d, threshold=0.3, max_shingle_df=3).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs


def test_ann_ivf_recall(spark):
    from clustopher_spark.functions.similarity import ann_ivf_topk

    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 10)
    brute = cosine_topk_bruteforce(e, q, k=5, vec_col="embedding")
    ann = ann_ivf_topk(e, q, k=5, n_lists=8, n_probe=3, vec_col="embedding")
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    recall = len(a & b) / len(b)
    # data-adaptive lists with 3/8 probed: expect clearly better recall
    # than single-probe LSH, and the planted near-dup must be found
    assert recall >= 0.6, f"IVF recall {recall}"
    assert (0, 1) in a


def test_ann_ivf_deterministic(spark):
    from clustopher_spark.functions.similarity import ann_ivf_topk

    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 3)
    r1 = ann_ivf_topk(e, q, k=3, n_lists=8, n_probe=2, vec_col="embedding").collect()
    r2 = ann_ivf_topk(e, q, k=3, n_lists=8, n_probe=2, vec_col="embedding").collect()
    assert r1 == r2


def test_ann_ivfpq_recall_and_codes(spark):
    """IVF-PQ: exact re-rank over the ADC shortlist must reach recall at
    least as good as plain IVF's bound on the same data, the planted
    near-dup must surface, and the PQ codes must honor the compression
    contract (M small-int codes per vector, all < n_codes)."""
    from clustopher_spark.functions.similarity import (
        ann_ivf_pq_topk,
        ivf_lists_udf,
        pq_encode_udf,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 10)
    brute = cosine_topk_bruteforce(e, q, k=5, vec_col="embedding")
    ann = ann_ivf_pq_topk(
        e, q, k=5, n_lists=8, n_probe=3, m_subvectors=4, n_codes=32,
        refine=4, vec_col="embedding",
    )
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.6, f"IVF-PQ recall {recall}"
    assert (0, 1) in a

    cents = train_ivf_centroids(e, 8, "embedding")
    books = train_pq_codebooks(e, cents, m_subvectors=4, n_codes=32,
                               vec_col="embedding")
    assert books.shape[0] == 4 and books.shape[2] == 4  # M x n_k x dsub
    enc = pq_encode_udf(books, cents)
    assign = ivf_lists_udf(cents, 1)
    codes = (
        e.select(
            "vec_id",
            assign(F.col("embedding"))[0].alias("list_id"),
            F.col("embedding"),
        )
        .select("vec_id", enc(F.col("embedding"), F.col("list_id")).alias("c"))
        .collect()
    )
    n_k = books.shape[1]
    assert all(len(r.c) == 4 and all(0 <= x < n_k for x in r.c) for r in codes)


def test_ann_ivfpq_deterministic(spark):
    from clustopher_spark.functions.similarity import ann_ivf_pq_topk

    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 3)
    kw = dict(k=3, n_lists=8, n_probe=2, m_subvectors=4, n_codes=32,
              vec_col="embedding")
    r1 = ann_ivf_pq_topk(e, q, **kw).collect()
    r2 = ann_ivf_pq_topk(e, q, **kw).collect()
    assert r1 == r2


def test_lloyd_distributed_bit_identical(spark):
    """Round-8 optimization equivalence pin: the Spark-distributed
    (matrix, restart) k-means runs must reproduce the sequential
    _lloyd_kmeans outputs BIT-exactly — coarse centroids and every PQ
    codebook — so quantizers (and therefore every downstream ANN
    answer) are unchanged by the parallelization."""
    import numpy as np

    from clustopher_spark.functions.similarity import (
        _lloyd_kmeans,
        _lloyd_kmeans_many,
    )

    rng = np.random.default_rng(11)
    mats = [rng.normal(size=(300, 6)) for _ in range(5)]
    ks = [16, 8, 4, 16, 32]
    seeds = [42, 43, 44, 45, 46]
    seq = [_lloyd_kmeans(m, k, s) for m, k, s in zip(mats, ks, seeds)]
    dist = _lloyd_kmeans_many(mats, ks, seeds, spark.sparkContext)
    for a, b in zip(seq, dist):
        assert a.shape == b.shape
        assert np.array_equal(a, b)  # bitwise, not allclose


def test_fused_assign_encode_matches_chained(spark):
    """Round-8 optimization equivalence pin: the fused one-boundary
    assign+encode UDF must emit exactly the (list_id, codes) pairs the
    chained ivf_lists_udf -> pq_encode_udf pair produced."""
    from clustopher_spark.functions.similarity import (
        ivf_lists_udf,
        ivf_pq_assign_encode_udf,
        pq_encode_udf,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    e = _embeddings(spark)
    cents = train_ivf_centroids(e, 8, "embedding")
    books = train_pq_codebooks(e, cents, m_subvectors=4, n_codes=32,
                               vec_col="embedding")
    assign = ivf_lists_udf(cents, 1)
    encode = pq_encode_udf(books, cents)
    chained = {
        r.vec_id: (r.list_id, tuple(r.codes))
        for r in e.select(
            "vec_id",
            assign(F.col("embedding"))[0].alias("list_id"),
            F.col("embedding"),
        )
        .select(
            "vec_id",
            "list_id",
            encode(F.col("embedding"), F.col("list_id")).alias("codes"),
        )
        .collect()
    }
    enc = ivf_pq_assign_encode_udf(books, cents)
    fused = {
        r.vec_id: (r.e.list_id, tuple(r.e.codes))
        for r in e.select("vec_id", enc(F.col("embedding")).alias("e")).collect()
    }
    assert fused == chained


def test_connected_components_chain(spark):
    """a-b, b-c, d-e: two components with min-id canonicals; isolated f."""
    from clustopher_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "id long")
    got = {
        r.id: r.group_id
        for r in connected_components(pairs, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_random_graphs(spark):
    """10 random graphs: distributed label propagation must equal a
    union-find reference on every one."""
    import numpy as np
    from clustopher_spark.functions.dedup import connected_components

    rng = np.random.default_rng(123)
    for _ in range(10):
        n = int(rng.integers(5, 60))
        m = int(rng.integers(0, n * 2))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1 % n)] if n > 1 else []
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for v in range(n):
            want.setdefault(find(v), []).append(v)
        canonical = {v: min(members) for members in want.values() for v in members}

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
        got = {
            r.id: r.group_id
            for r in connected_components(pairs, vertices=verts).collect()
        }
        assert got == canonical, f"n={n} edges={edges}"


def test_connected_components_random_graphs_distributed(spark):
    """The star-contraction prefix (not just the driver finisher) must be
    exact: random graphs with driver_edge_limit=0 — so only distributed
    convergence to star form can terminate — vs a union-find reference."""
    import numpy as np
    from clustopher_spark.functions.dedup import connected_components

    rng = np.random.default_rng(7)
    for _ in range(4):
        n = int(rng.integers(10, 40))
        m = int(rng.integers(5, n * 2))
        edges = list(
            {
                (int(a), int(b))
                for a, b in rng.integers(0, n, size=(m, 2))
                if a != b
            }
        )
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in range(n)}

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
        got = {
            r.id: r.group_id
            for r in connected_components(
                pairs, vertices=verts, driver_edge_limit=0, max_iter=30
            ).collect()
        }
        assert got == want, f"n={n} edges={edges}"


def test_connected_components_distributed_rounds(spark):
    """Force the distributed contraction prefix (driver_edge_limit=0 bars
    the union-find finisher except via contraction to nothing): a
    400-vertex chain plus two cliques must still produce exact min-id
    components, with the edge list shrinking geometrically per round
    (pointer jump), not O(diameter) rounds."""
    from clustopher_spark.functions.dedup import connected_components

    chain = [(i, i + 1) for i in range(400)]
    cliques = [(1000 + a, 1000 + b) for a in range(8) for b in range(a + 1, 8)]
    cliques += [(2000 + a, 2000 + b) for a in range(5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(chain + cliques, "id_a long, id_b long")
    stats: dict = {}
    got = {
        r.id: r.group_id
        for r in connected_components(
            pairs, stats=stats, driver_edge_limit=0, max_iter=25
        ).collect()
    }
    want = {i: 0 for i in range(401)}
    want.update({1000 + i: 1000 for i in range(8)})
    want.update({2000 + i: 2000 for i in range(5)})
    assert got == want
    # geometric contraction: a 400-edge chain under plain min-propagation
    # needs ~400 rounds; the jump+contract loop must stay well under that
    assert 0 < stats["rounds"] <= 25


def test_truncate_lineage_resets_stats(spark):
    """Loop-carried checkpoints must not inherit multiplicative join-size
    estimates: after 4 rounds of a 3-join loop, the plain localCheckpoint
    estimate has hundreds of digits while truncate_lineage keeps it flat
    (the BigInteger arithmetic on those digits was the driver-side hang
    the round-3 DBSCAN profile caught via jstack)."""
    from pyspark.sql import functions as F

    from clustopher_spark.plans.lineage import truncate_lineage

    def digits(df):
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return len(str(stats.sizeInBytes()))

    edges = spark.range(0, 100).selectExpr("id as src", "id+1 as dst")
    lab = spark.range(0, 101).selectExpr("id", "id as label")
    base_digits = None
    for _ in range(4):
        nm = (
            edges.join(lab, edges.dst == lab.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        nxt = lab.join(nm, lab.id == nm.src, "left").select(
            "id", F.coalesce("nmin", F.col("label")).alias("label")
        )
        lab = truncate_lineage(nxt)
        if base_digits is None:
            base_digits = digits(lab)
    assert digits(lab) <= base_digits + 2
    assert lab.count() == 101


def test_stratified_sample_rebalances(spark):
    from clustopher_spark.queries import QUERIES

    out = {
        r.lang: r.n_kept
        for r in QUERIES["llm_stratified_sample"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    totals = {
        r.lang: r.n
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # non-en classes kept whole; en downsampled to roughly a quarter
    for lang in ("de", "es", "fr", "zh"):
        assert out[lang] == totals[lang]
    assert 0.1 * totals["en"] < out["en"] < 0.45 * totals["en"]


def test_bmp_codec_roundtrip():
    """Real BMP encode/decode: exact pixel round-trip incl. row padding
    (odd widths), plus nearest-neighbor resize semantics."""
    import numpy as np

    from clustopher_spark.functions.codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    for w, h in [(8, 8), (7, 5), (1, 1), (33, 2)]:  # odd widths exercise padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all(), f"roundtrip failed at {w}x{h}"
    # resize: solid color stays solid; 2x upscale duplicates pixels exactly
    solid = np.full((4, 4, 3), 200, dtype=np.uint8)
    assert (resize_nearest(solid, 16, 16) == 200).all()
    quad = np.zeros((2, 2, 3), dtype=np.uint8)
    quad[0, 0] = 255
    up = resize_nearest(quad, 4, 4)
    assert (up[:2, :2] == 255).all() and (up[2:, 2:] == 0).all()


def test_wav_codec_roundtrip():
    """Real WAV encode/decode: sample-exact round-trip, chunk-walk
    tolerance, and RMS of a known full-scale sine = 1/sqrt(2)."""
    import numpy as np

    from clustopher_spark.functions.codecs import (
        decode_wav,
        encode_wav,
        wav_audio_decode,
    )

    t = np.arange(16000)
    sine = (32767 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    blob = encode_wav(sine, 16000)
    sr, pcm = decode_wav(blob)
    assert sr == 16000 and pcm.shape == (16000, 1)
    assert (pcm[:, 0] == sine).all()
    sr2, n, rms = wav_audio_decode(blob)
    assert sr2 == 16000 and n == 16000
    assert abs(rms - 1 / np.sqrt(2)) < 1e-3, f"sine RMS {rms}"
    # stereo round-trip
    stereo = np.stack([sine, -sine], axis=1)
    sr3, pcm3 = decode_wav(encode_wav(stereo, 44100))
    assert sr3 == 44100 and (pcm3 == stereo).all()


def test_multimodal_with_real_codecs(spark):
    """The multimodal operators over REAL bytes: BMP decode/resize and WAV
    feature extraction through the same mapInPandas plumbing the stubs use
    — decode_fn pluggability is the production contract."""
    import numpy as np

    from clustopher_spark.functions.codecs import (
        bmp_image_decode,
        bmp_resize,
        decode_bmp,
        encode_bmp,
        encode_wav,
        wav_audio_decode,
    )
    from clustopher_spark.functions.multimodal import resize_images

    rng = np.random.default_rng(11)
    img_rows = [
        (i, bytes(encode_bmp(rng.integers(0, 256, size=(16 + i, 12 + i, 3), dtype=np.uint8))))
        for i in range(6)
    ]
    imgs = spark.createDataFrame(img_rows, "id long, content binary")
    decoded = {r.id: r for r in decode_images(imgs, decode_fn=bmp_image_decode).collect()}
    assert all(decoded[i].width == 12 + i and decoded[i].height == 16 + i for i in range(6))
    assert all(decoded[i].format == "bmp" for i in range(6))
    assert all(0.0 <= f <= 1.0 for i in range(6) for f in decoded[i].features)

    resized = resize_images(
        imgs, target=(8, 8), resize_fn=bmp_resize
    ).collect()
    for r in resized:
        px = decode_bmp(bytes(r.content))
        assert px.shape == (8, 8, 3)

    t = np.arange(8000)
    wav_rows = [
        (i, bytes(encode_wav(((3000 * (i + 1)) * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int16), 8000)))
        for i in range(4)
    ]
    wavs = spark.createDataFrame(wav_rows, "id long, content binary")
    feats = {r.id: r for r in extract_audio_features(wavs, decode_fn=wav_audio_decode).collect()}
    assert all(feats[i].sample_rate == 8000 and feats[i].n_samples == 8000 for i in range(4))
    # louder sine -> higher RMS, in the right ballpark
    rms = [feats[i].rms for i in range(4)]
    assert rms == sorted(rms) and abs(rms[0] - 3000 / 32768 / np.sqrt(2)) < 1e-3


def test_video_frames_with_real_avi_codec(spark):
    """sample_video_frames over REAL AVI bytes: encode synthetic videos,
    decode + evenly-sample through the mapInPandas fan-out, and check each
    emitted frame hash against the source frame's pixels."""
    import hashlib

    import numpy as np

    from clustopher_spark.functions.codecs import avi_video_frames, encode_avi

    rng = np.random.default_rng(23)
    videos = {
        vid: [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8) for _ in range(4 + vid)]
        for vid in range(3)
    }
    rows = [(vid, bytes(encode_avi(fr, fps=5))) for vid, fr in videos.items()]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = sample_video_frames(df, frames_per_video=3, decode_fn=avi_video_frames).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.id, []).append(r)
    for vid, frames in videos.items():
        got = sorted(by_vid[vid], key=lambda r: r.frame_idx)
        assert len(got) == 3
        assert got[0].frame_idx == 0 and got[-1].frame_idx == len(frames) - 1
        for r in got:
            assert r.frame_hash == hashlib.md5(frames[r.frame_idx].tobytes()).hexdigest()
            assert abs(r.frame_ts - r.frame_idx / 5.0) < 1e-9


def test_redact_pii_fixtures(spark):
    from clustopher_spark.functions.text import pii_counts, redact_pii

    rows = [
        ("contact jane.doe+spam@mail.example.co or 555-0199 x2",),
        ("no pii here at all",),
        ("two mails a@b.io c.d@e.org and 123-4567",),
    ]
    df = spark.createDataFrame(rows, ["t"])
    n_e, n_p = pii_counts(F.col("t"))
    out = df.select(
        redact_pii(F.col("t")).alias("r"), n_e.alias("ne"), n_p.alias("np")
    ).collect()
    assert out[0].r == "contact [EMAIL] or [PHONE] x2"
    assert (out[0].ne, out[0].np) == (1, 1)
    assert out[1].r == "no pii here at all" and out[1].ne == 0 and out[1].np == 0
    assert out[2].r == "two mails [EMAIL] [EMAIL] and [PHONE]"
    assert (out[2].ne, out[2].np) == (2, 1)


def test_portable_hash_matches_duckdb(spark):
    """The 60-bit md5 hash — the one cross-engine primitive every portable
    pipeline (minhash/simhash oracles) rests on — must agree with DuckDB."""
    import duckdb

    from clustopher_spark.functions.dedup import portable_hash60

    words = ["table", "scan window", "a", "", "batch join merge", "号"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r.w: r.h for r in df.select("w", portable_hash60(F.col("w")).alias("h")).collect()}
    con = duckdb.connect()
    for w in words:
        (exp,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [w]
        ).fetchone()
        assert got[w] == exp, w


def test_sequence_packing_conserves_tokens(spark):
    from clustopher_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    packs = QUERIES["llm_sequence_packing"](spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("s")
    ).collect()[0].s
    assert sum(p.n_docs for p in packs) == n_docs
    assert sum(p.n_tokens for p in packs) == total_tokens
    # packs fill in doc order: within a source, first_doc ranges never overlap
    by_src = {}
    for p in packs:
        by_src.setdefault(p.source, []).append(p)
    for src, ps in by_src.items():
        ps.sort(key=lambda p: p.pack_id)
        for a, b in zip(ps, ps[1:]):
            assert a.last_doc < b.first_doc


def test_embedding_quantization_error_bound(spark):
    """int8 symmetric quantization must satisfy the half-step error bound
    |x - x_hat| <= scale/254 (+ float slack) for every in-range value —
    the semantic guarantee behind the oracle's reconstruction numbers."""
    import numpy as np

    from clustopher_spark.queries import QUERIES
    from clustopher_spark.queries.base import table as _table

    sf = "/root/testdata/sf0.001"
    out = QUERIES["llm_embedding_quantization"](spark, sf).collect()
    assert len(out) > 0
    embs = _table(spark, sf, "embeddings").select("embedding").collect()
    scale = max(abs(float(v)) for r in embs for v in r.embedding)
    half_step = scale / 254.0
    for r in out:
        # output is rounded to 6 decimals -> allow half-ulp rounding slack
        assert r.max_abs_err <= half_step + 5.1e-7, (r.label, r.max_abs_err, half_step)
        assert 0.0 <= r.mean_l2_err <= half_step * 9  # sqrt(64) * half_step envelope


def test_binary_file_source_to_image_decode(spark, tmp_path):
    """Files-on-disk -> binaryFile source -> real BMP decode: the full
    multimodal ingestion path with no driver-side byte handling."""
    import numpy as np

    from clustopher_spark.functions.codecs import bmp_image_decode, encode_bmp
    from clustopher_spark.sources.binary import load_binary_files

    rng = np.random.default_rng(31)
    for i in range(5):
        (tmp_path / f"img_{i}.bmp").write_bytes(
            encode_bmp(rng.integers(0, 256, size=(10 + i, 9, 3), dtype=np.uint8))
        )
    (tmp_path / "notes.txt").write_text("not an image")

    df = load_binary_files(spark, str(tmp_path), glob="*.bmp")
    assert df.count() == 5
    # decode_images contract: numeric id column (join key); map the stem
    from pyspark.sql import functions as SF

    with_ids = df.select(
        SF.regexp_extract("id", r"(\d+)$", 1).cast("long").alias("id"), "content"
    )
    decoded = {
        r.id: r for r in decode_images(with_ids, decode_fn=bmp_image_decode).collect()
    }
    assert set(decoded) == set(range(5))
    for i in range(5):
        r = decoded[i]
        assert (r.width, r.height, r.format) == (9, 10 + i, "bmp")


def _semdedup_fixture(spark, n_noise=60, dim=16, seed=11):
    """Noise vectors + three planted groups of near-identical vectors.

    Group ids: {200, 201, 202}, {210, 211}, {220, 221, 222, 223} — each
    member is its group base + tiny jitter, so within-group cosine > 0.99
    while noise-to-anything stays far below any sane threshold."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_noise):
        rows.append((i, [float(x) for x in rng.standard_normal(dim)]))
    groups = {200: 3, 210: 2, 220: 4}
    for base_id, size in groups.items():
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for j in range(size):
            v = base + rng.standard_normal(dim) * 0.005
            rows.append((base_id + j, [float(x) for x in v]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        groups,
    )


def test_semdedup_planted_groups(spark):
    from clustopher_spark.functions.similarity import semdedup

    e, groups = _semdedup_fixture(spark)
    out = semdedup(e, threshold=0.95, n_lists=4).toPandas().set_index("id")
    # every planted group collapses to exactly its min-id representative
    for base_id, size in groups.items():
        members = list(range(base_id, base_id + size))
        kept = [m for m in members if out.loc[m, "keep"]]
        assert kept == [base_id], f"group {base_id}: kept {kept}"
        for m in members[1:]:
            assert out.loc[m, "dup_of"] == base_id
    # noise vectors all survive (nothing near them)
    noise = out.loc[[i for i in range(60)]]
    assert noise["keep"].all()
    # verdict totality: one row per input, kept rows have null dup_of
    assert len(out) == 60 + sum(groups.values())
    assert out[out["keep"]]["dup_of"].isna().all()


def test_semdedup_deterministic(spark):
    from clustopher_spark.functions.similarity import semdedup

    e, _ = _semdedup_fixture(spark)
    r1 = sorted(map(tuple, semdedup(e, threshold=0.95, n_lists=4).collect()))
    r2 = sorted(map(tuple, semdedup(e, threshold=0.95, n_lists=4).collect()))
    assert r1 == r2


def test_winnowing_detects_unaligned_shared_span(spark, tmp_path):
    """The winnowing guarantee (Schleimer et al. 2003): a verbatim span of
    length >= w + k - 1 = 27 chars shared between two documents yields at
    least one common fingerprint REGARDLESS of the span's offset in each
    document — the property strided shingles lack. Also pins the negative:
    documents with no shared 27-char span produce no shared fingerprints."""
    import random

    from clustopher_spark.queries.llm import llm_substring_dedup

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    rand = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    span = "the quick brown fox jumps over the lazy dog tonight"  # 51 chars
    rows = [
        # span at offset 13 in doc 0, offset 37 in doc 1 (unaligned mod any stride)
        (0, rand(13) + span + rand(40), "en", "web", 0),
        (1, rand(37) + span + rand(18), "en", "web", 0),
        # doc 2: no shared content with anything
        (2, rand(120), "en", "web", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in llm_substring_dedup(spark, str(tmp_path)).collect()}
    assert 0 in out and 1 in out, "both span-sharing docs must be flagged"
    assert out[0].n_shared >= 1 and out[1].n_shared >= 1
    assert 2 not in out, "doc without shared spans must not be flagged"


def test_substring_neardup_pairs_and_groups(spark):
    """Winnow-fingerprint pairs + connected components group documents
    sharing verbatim spans: two planted template families must come out
    as two groups, noise docs unpaired, and the hot-fingerprint df cap
    must drop a boilerplate span shared by every document."""
    import random

    from clustopher_spark.functions.dedup import (
        connected_components,
        substring_neardup_pairs,
    )

    rng = random.Random(23)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    rand = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    fam_a = "all your base are belong to us said the ancient cabinet"
    fam_b = "colorless green ideas sleep furiously under the harvest moon"
    rows = [
        (0, rand(11) + fam_a + rand(30)),
        (1, rand(29) + fam_a + rand(12)),
        (2, rand(5) + fam_a + rand(55)),
        (10, rand(17) + fam_b + rand(25)),
        (11, rand(33) + fam_b + rand(9)),
        (20, rand(150)),  # noise
        (21, rand(150)),  # noise
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = substring_neardup_pairs(df, min_common=1)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (10, 11)}
    groups = connected_components(pairs, id_a="id_a", id_b="id_b")
    by_group = {}
    for r in groups.collect():
        by_group.setdefault(r.group_id, set()).add(r.id)
    assert sorted(by_group.values(), key=min) == [{0, 1, 2}, {10, 11}]

    # boilerplate cap: a span in EVERY doc (df 7 > cap 3) must not pair
    boiler = "this message was generated automatically do not reply"
    rows2 = [(i, t[:20] + boiler + t[20:]) for i, t in rows]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    pairs2 = substring_neardup_pairs(df2, min_common=1, max_fp_df=3)
    got2 = {(r.id_a, r.id_b) for r in pairs2.collect()}
    assert (20, 21) not in got2, "boilerplate-only pair must be capped away"
    assert {(0, 1), (0, 2), (1, 2), (10, 11)} <= got2


def test_winnowing_guarantee_sweep_random_offsets(spark):
    """Batched sweep of the winnowing guarantee: 12 document pairs, each
    sharing one distinct 27-char span (the exact w + k - 1 threshold) at
    seeded-random offsets in each member, all in one DataFrame / one
    Spark job. Every planted pair must be detected; no cross-family pair
    may appear (distinct span content per family, random filler)."""
    import random

    from clustopher_spark.functions.dedup import substring_neardup_pairs

    rng = random.Random(41)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    rand = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    rows, want = [], set()
    for fam in range(12):
        span = rand(27)  # exactly the w + k - 1 guarantee threshold
        a_id, b_id = 100 * fam, 100 * fam + 1
        rows.append((a_id, rand(rng.randint(0, 60)) + span + rand(rng.randint(0, 60))))
        rows.append((b_id, rand(rng.randint(0, 60)) + span + rand(rng.randint(0, 60))))
        want.add((a_id, b_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in substring_neardup_pairs(df, min_common=1).collect()
    }
    assert want <= got, f"missed planted pairs: {want - got}"
    assert got == want, f"spurious pairs: {got - want}"


def test_winnowing_production_xxhash_twin_equivalent(spark):
    """portable=False swaps the gram hash from md5-derived portable_hash60
    to codegen'd xxhash64 (the deployment path benched as
    llm_winnow_production_xxhash). The winnowing guarantee is positional,
    not hash-specific, so BOTH modes must detect every planted shared span
    and nothing else — same planted-span corpus as the sweep above."""
    import random

    from clustopher_spark.functions.dedup import substring_neardup_pairs

    rng = random.Random(59)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    rand = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    rows, want = [], set()
    for fam in range(8):
        span = rand(27)
        a_id, b_id = 100 * fam, 100 * fam + 1
        rows.append((a_id, rand(rng.randint(0, 50)) + span + rand(rng.randint(0, 50))))
        rows.append((b_id, rand(rng.randint(0, 50)) + span + rand(rng.randint(0, 50))))
        want.add((a_id, b_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_prod = {
        (r.id_a, r.id_b)
        for r in substring_neardup_pairs(df, min_common=1, portable=False).collect()
    }
    got_port = {
        (r.id_a, r.id_b)
        for r in substring_neardup_pairs(df, min_common=1, portable=True).collect()
    }
    assert got_prod == want, f"production-hash mismatch: {got_prod ^ want}"
    assert got_port == want
    # and the production plan carries no md5: the gram hash is xxhash64
    import re as _re

    plan = substring_neardup_pairs(df, min_common=1, portable=False)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and not _re.search(r"\bmd5\b", plan)


def test_winnow_fingerprints_segmented_generation_identical(spark):
    """The two-level (segment, offset) position generation — which bounds
    the in-flight sequence array for multi-MB documents — must emit the
    exact same fingerprint set as near-unsegmented generation, including
    when segments cut through winnow windows (segment_chars far below
    the document length)."""
    from clustopher_spark.functions.dedup import winnow_fingerprints

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(d, segment_chars=1 << 20).collect()
    }
    tiny_seg = {
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(d, segment_chars=37).collect()
    }
    assert base == tiny_seg and len(base) > 0


def test_quantizer_sample_unbiased_on_sorted_corpus(spark):
    """Round-3 verdict/advice: quantizer training used limit(100k), which
    takes the FIRST partitions — on a corpus sorted by source, the coarse
    quantizer only ever saw the head and tail recall silently degraded.
    Train on a 4-cluster corpus laid out so each cluster fills a
    contiguous partition range; with sample_rows smaller than one
    cluster, the uniform sample must still surface every cluster (the
    old limit() path trained exclusively on cluster 0)."""
    import numpy as np
    from pyspark.sql import functions as F

    from clustopher_spark.functions.similarity import train_ivf_centroids

    n, k = 40_000, 4
    # partition i holds exactly cluster i: range is split evenly in order
    df = (
        spark.range(0, n, 1, k)
        .withColumn("label", (F.col("id") * k / n).cast("int"))
        .selectExpr(
            "id as vec_id",
            "transform(sequence(1, 8), j -> cast(label * 10.0 + pmod(id * j, 97) / 970.0 as double))"
            " as embedding",
        )
    )
    cents = train_ivf_centroids(df, k, "embedding", sample_rows=2_000, seed=7)
    # each planted cluster lives near label*10 in every coordinate; map
    # each centroid to its nearest planted cluster and demand full cover
    got = {int(round(float(np.mean(c)) / 10.0)) for c in cents}
    assert got == set(range(k)), f"sampled quantizer missed clusters: {got}"
    # determinism: same seed, same corpus -> identical centroids
    again = train_ivf_centroids(df, k, "embedding", sample_rows=2_000, seed=7)
    assert np.allclose(cents, again)


def test_shared_sample_training_bit_identical(spark):
    """Round-8 resumed-session equivalence pin: training both IVF-PQ
    quantizers from ONE shared bounded-sample collect (the construction
    fusion in ann_ivf_pq_topk / IVFPQIndex.build) must reproduce the
    own-draw trainings bit-exactly — the draw is deterministic in
    (projection, rows, seed), so sharing it can only remove a job."""
    import numpy as np

    from clustopher_spark.functions.similarity import (
        _as_double,
        _bounded_uniform_sample,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    e = _embeddings(spark)
    shared = _bounded_uniform_sample(
        e.select(_as_double(F.col("embedding")).alias("v")), 100_000, 42, None
    )
    c_own = train_ivf_centroids(e, 8, "embedding", None, 42)
    c_shared = train_ivf_centroids(
        e, 8, "embedding", None, 42, sample_pdf=shared
    )
    assert np.array_equal(c_own, c_shared)
    b_own = train_pq_codebooks(e, c_own, 4, 32, "embedding", seed=42)
    b_shared = train_pq_codebooks(
        e, c_own, 4, 32, "embedding", seed=42, sample_pdf=shared
    )
    assert np.array_equal(b_own, b_shared)
