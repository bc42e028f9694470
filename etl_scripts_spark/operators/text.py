"""Text-analysis operators for the training-data pipeline extensions.

All pure Catalyst expressions (no Python in the hot path): tokenization,
token counting (whitespace + BPE-ish regex), document quality scoring,
n-gram language-ID heuristic, and content fingerprinting.  Hashes use md5 so
the DuckDB oracle reproduces them bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny marker-word lists for the n-gram language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def normalize_text(text: Column) -> Column:
    """lower → strip non-alnum → collapse whitespace (dedup-canonical form)."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def words(text: Column) -> Column:
    return F.split(normalize_text(text), " ")


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_REGEX), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alnum/space, 4 decimals."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.round(F.length(stripped) / F.greatest(F.length(text), F.lit(1)), 4)


def stopword_ratio(text: Column) -> Column:
    toks = words(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 4)


def mean_word_length(text: Column) -> Column:
    toks = words(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation,
    non-degenerate stopword rate.  Deterministic; 4 decimals."""
    length_term = F.least(F.length(text) / F.lit(400.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop = stopword_ratio(text)
    stop_term = F.when((stop > 0.01) & (stop < 0.5), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((length_term * 0.4 + punct_term * 0.3 + stop_term * 0.3), 4)


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-word hit counts per language over a distinct-token array."""

    def marker_pred(markers: list[str]):
        # single-arg lambda on purpose: a 2-param lambda becomes (element, index)
        return lambda t: t.isin(markers)

    return {
        lang: F.size(F.filter(toks, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(words(text))


def lang_id_from_tokens(toks: Column) -> Column:
    """argmax language by marker hits; ties broken by fixed lang order; 'und'
    when nothing matches.  Pass a pre-materialized token column — HOF lambdas
    defeat CSE, so deriving tokens here 4× would re-tokenize 4×."""
    scores = lang_scores(toks)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in ("en", "de", "fr", "es"):
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def lang_id(text: Column) -> Column:
    return lang_id_from_tokens(distinct_tokens(text))


#: PII patterns (shared dialect subset of Java regex and RE2 so the DuckDB
#: oracle matches byte-for-byte): emails, and digit runs long enough to be
#: phone/account numbers.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_REGEX = r"[0-9]{7,}"


def word_repetition_ratio(toks: Column) -> Column:
    """Fraction of tokens that repeat an earlier token (Gopher-style
    repetition quality signal): 1 - distinct/total, 4 decimals.  Pass a
    materialized token array (see :func:`lang_id_from_tokens` for why)."""
    n = F.size(toks)
    return F.round(
        (n - F.size(F.array_distinct(toks))) / F.greatest(n, F.lit(1)), 4
    )


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_long_numbers) found in the raw text."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_REGEX), 0)),
        F.size(F.regexp_extract_all(text, F.lit(LONG_NUMBER_REGEX), 0)),
    )


def mask_pii(text: Column) -> Column:
    """Replace emails with <EMAIL> and long digit runs with <NUM>.

    Email masking runs first so an address's digits are not half-eaten by
    the number rule.  Pure regexp_replace — at 100 TB this is a map-only
    projection with no shuffle.
    """
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_REGEX, "<EMAIL>"),
        LONG_NUMBER_REGEX,
        "<NUM>",
    )


def fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def simhash16(text: Column) -> Column:
    return simhash16_from_tokens(distinct_tokens(text))


def simhash16_from_tokens(toks: Column) -> Column:
    """16-bit SimHash over distinct normalized tokens.

    Bit j (1-based nibble of each token's md5): lowest bit of hex digit j.
    simhash bit j is set iff the signed vote sum over tokens is positive.
    Cross-engine reproducible: md5 hex is identical in Spark and DuckDB.
    Pass a materialized token column — 16 votes over a recomputed-token
    expression would tokenize 16×.
    """
    out = F.lit(0)
    odd = ["1", "3", "5", "7", "9", "b", "d", "f"]

    def vote_merge(nibble_pos: int):
        # exactly-2-arg lambda: F.aggregate's merge signature is (acc, x)
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), nibble_pos, 1).isin(odd), F.lit(1)
        ).otherwise(F.lit(-1))

    for j in range(16):
        vote = F.aggregate(toks, F.lit(0), vote_merge(j + 1))
        out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out
