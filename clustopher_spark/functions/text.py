"""Text-analysis column expressions for training-data pipelines: token
counting, quality scoring, language ID, fingerprinting. All pure Catalyst
built-ins (JVM-side, codegen'd) — no Python in the hot path, so these run
at parquet-scan speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker sets for the n-gram/stopword heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "que"],
}

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: word pieces + digits + punctuation each count.

    Splits on word/non-word boundaries like a byte-pair pretokenizer would.
    """
    return F.size(
        F.filter(
            F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda s: (s != "") & (s != " "),
        )
    )


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.,;:!?]")) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text: Column) -> Column:
    pattern = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern)) / F.greatest(
        token_count(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation sanity +
    stopword presence (the classic C4/Gopher-style filters, simplified)."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) > 0.01, 1.0).otherwise(0.5)
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    lowered = F.lower(text)
    return {
        lang: F.regexp_count(lowered, F.lit(r"\b(" + "|".join(words) + r")\b"))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax over marker-word hit counts; deterministic tie-break by the
    fixed language order en > de > fr > es; 'und' (undetermined) when no
    marker hits at all."""
    scores = lang_scores(text)
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed so earlier languages win ties (last when() wins in a chain
    # built outside-in)
    for lang in reversed(list(scores)):
        result = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(result)
    return F.when(best_score == 0, F.lit("und")).otherwise(result)


# PII patterns: conservative syntax (char classes, bounded repeats, \b) that
# Java regex and RE2/DuckDB interpret identically — no lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def redact_pii(text: Column) -> Column:
    """Replace emails then phone numbers with typed placeholders — the
    scrubbing pass a training pipeline runs before publishing a corpus.
    Pure JVM ``regexp_replace``: runs at scan speed, no Python."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over whitespace-normalized,
    lowercased text (stands in for the reference-free rolling hash)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))
