"""BPE tokenizer induction: hand-verifiable merges, determinism, the
encode contract, and the corpus queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from clustopher_spark.functions.bpe import (
    END,
    bpe_encode_udf,
    learn_bpe,
    train_bpe,
    word_frequencies,
)


def test_train_bpe_hand_verifiable():
    """The classic low/lower/newest/widest example (Sennrich et al. §3.2
    shape): merge order follows pair mass with lexicographic ties."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, num_merges=4)
    # 'es' appears in newest+widest = 9, 'st</w>' likewise 9 but ('e','s')
    # < ('s','t') lexicographically only matters on equal counts; first
    # merge must be ('e','s') or ('s','t') with count 9 — tie broken to
    # the smaller pair
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    # 'lo' appears in low+lower = 7: next
    assert merges[3] == ("l", "o")


def test_train_bpe_incremental_counts_match_recount():
    """The inverted-index incremental update must agree with a naive
    recount-per-merge reference on a messier corpus (overlapping pairs,
    repeated symbols)."""
    wf = [("aaaa", 4), ("aaab", 3), ("abab", 2), ("banana", 5)]

    def naive(word_freqs, n):
        words = [tuple(w) + (END,) for w, _ in word_freqs]
        freqs = [f for _, f in word_freqs]
        out = []
        for _ in range(n):
            counts: dict = {}
            for w, f in zip(words, freqs):
                for p in zip(w, w[1:]):
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            mx = max(counts.values())
            best = min(p for p, c in counts.items() if c == mx)
            out.append(best)
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
        return out

    assert train_bpe(wf, 8) == naive(wf, 8)


def test_bpe_encode_round_trip_and_frequent_word_token(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog the end") for i in range(20)]
        + [(100 + i, "an unrelated sentence with other words") for i in range(3)],
        "doc_id long, text string",
    )
    merges = learn_bpe(docs, num_merges=60, max_words=100)
    enc = bpe_encode_udf(merges)
    out = docs.select("text", enc(F.col("text")).alias("toks")).collect()
    for r in out:
        # decode: concatenating tokens and splitting on the end marker
        # reproduces the original words exactly
        words = "".join(r.toks).split(END)[:-1]
        assert words == r.text.lower().split()
    # the most frequent word collapses to a single token
    the_row = next(r for r in out if "quick" in r.text)
    assert "the" + END in the_row.toks


def test_bpe_determinism_and_word_frequencies(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    wf = word_frequencies(docs, max_words=10)
    assert len(wf) == 10 and wf[0][1] >= wf[-1][1]
    assert ("alpha", 50) in wf
    m1 = learn_bpe(docs, num_merges=30, max_words=10)
    m2 = learn_bpe(docs, num_merges=30, max_words=10)
    assert m1 == m2


def test_bpe_corpus_queries(spark):
    """The registry entries run on real testdata: the vocab is non-empty
    and rank-ordered; token stats satisfy the compression sanity bounds
    (>= 1 char per token; tokens <= chars)."""
    from clustopher_spark.queries import QUERIES

    vocab = QUERIES["llm_bpe_vocab"](spark, "/root/testdata/sf0.001").collect()
    assert len(vocab) > 50
    assert [r.rank for r in vocab] == list(range(len(vocab)))
    assert all(r.token == r.left + r.right for r in vocab)

    stats = QUERIES["llm_bpe_token_stats"](spark, "/root/testdata/sf0.001").collect()
    assert stats
    for r in stats:
        assert r.total_tokens > 0 and r.chars_per_token >= 1.0
