"""BPE tokenizer induction over a document corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the GPT-2
trainer pipeline shape).

The scale split mirrors the original trainers exactly:

1. **corpus -> word-frequency summary** (distributed): one explode +
   groupBy over the documents — the ONLY pass over corpus bytes, with
   map-side combine, bounded by the distinct-word vocabulary rather than
   corpus size. The summary is capped to the ``max_words`` most frequent
   words (deterministic tie-break), which carries almost all pair mass —
   the same bounded-summary-to-driver envelope as the ANN quantizer and
   PQ codebook trainers.
2. **summary -> merge table** (driver, exact): classic BPE over
   (word, freq) with an inverted pair->words index so each merge touches
   only the words containing the merged pair. Deterministic: ties on pair
   frequency break lexicographically.
3. **merge table -> encoder** (distributed): the learned merges broadcast
   into an Arrow-batched UDF that encodes documents word-by-word — a pure
   map stage, no shuffle.

At 100 TB step 1 is the only corpus-sized term and it is one aggregation;
steps 2-3 are invariant to corpus size (driver work bounded by
``max_words``; encoding is embarrassingly parallel).
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END = "</w>"


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 20_000,
) -> list[tuple[str, int]]:
    """The corpus word-frequency summary: one distributed aggregation,
    capped to the ``max_words`` most frequent words (ties broken by word,
    so the summary — and every merge learned from it — is deterministic).
    Returns a driver-side list; at 20k words x ~16 B this is the bounded
    envelope the trainer needs, independent of corpus size."""
    # [^\w']+ with Java's ASCII \w — the encoder's python splitter uses
    # re.ASCII so both sides segment identically (non-ASCII codepoints are
    # separators on BOTH sides; widen both together for unicode corpora)
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    rows = (
        docs.select(F.explode(F.split(col, r"[^\w']+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(max_words)
        .collect()
    )
    return [(r.w, r.freq) for r in rows]


def train_bpe(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE over a (word, freq) summary. Each word is a symbol
    sequence (characters + a terminal ``</w>`` marker, so merges never
    cross word boundaries and end-of-word variants get their own tokens).
    Per merge: pick the most frequent adjacent pair (lexicographic
    tie-break), rewrite ONLY the words containing it (inverted index),
    and update pair counts incrementally. Returns merges in rank order."""
    words = [tuple(w) + (END,) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (w, f) in enumerate(zip(words, freqs)):
        for p in zip(w, w[1:]):
            pair_counts[p] += f
            pair_words[p].add(i)

    def word_pairs(w):
        return zip(w, w[1:])

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts = {p: c for p, c in pair_counts.items() if c > 0}
        if not pair_counts:
            break
        mx = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == mx)
        merges.append(best)
        tok = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            w, f = words[i], freqs[i]
            # remove the old word's pair contributions entirely, then add
            # the merged form's — simpler than tracking the merge site and
            # immune to overlapping-occurrence edge cases
            for p in word_pairs(w):
                pair_counts[p] = pair_counts.get(p, 0) - f
                pair_words[p].discard(i)
            new = []
            j = 0
            while j < len(w):
                if j + 1 < len(w) and (w[j], w[j + 1]) == best:
                    new.append(tok)
                    j += 2
                else:
                    new.append(w[j])
                    j += 1
            words[i] = tuple(new)
            for p in word_pairs(words[i]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words[p].add(i)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 20_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """End-to-end induction: distributed word-frequency summary + exact
    driver BPE. Returns the rank-ordered merge table."""
    wf = word_frequencies(docs, text_col, lowercase, max_words)
    return train_bpe(wf, num_merges)


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(w) + [END]
    while len(sym) > 1:
        best_rank, best_idx = None, -1
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, j
        if best_idx < 0:
            break
        sym[best_idx : best_idx + 2] = [sym[best_idx] + sym[best_idx + 1]]
    return sym


def bpe_encode_udf(merges: list[tuple[str, str]], lowercase: bool = True):
    """Arrow-batched encoder: text -> array of BPE tokens. Merges are
    applied in rank order per word (the standard greedy BPE application);
    the merge table broadcasts with the closure."""
    import re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    splitter = re.compile(r"[^\w']+", re.ASCII)  # matches the trainer's Java \w

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            if t:
                for w in splitter.split(t.lower() if lowercase else t):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return encode
