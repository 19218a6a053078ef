"""Text-analysis function library (training-data pipeline ops).

Everything here is built from JVM-side ``pyspark.sql.functions`` —
split/regexp/transform/aggregate — so it runs inside whole-stage
codegen on the scan. The reference's equivalents are Python string ops
(helpers.py:149-173 word counts, 21-37 key parsing) which we generalize
to the standard large-corpus toolkit: tokenization, quality scoring,
language ID, fingerprinting, shingling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens; empty/blank string → empty array.

    Edge-strip uses a regex, NOT ``trim`` — Spark's (and SQL's) trim
    removes only ASCII spaces, so tab/newline-edged text would
    otherwise produce phantom empty tokens (Python ``str.split()``
    semantics are the contract here)."""
    t = F.regexp_replace(_c(text), r"^\s+|\s+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, WS))


def token_count(text: Column | str) -> Column:
    """Whitespace token count — the reference's word_count
    (helpers.py:153 ``len(text.split())``)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Cheap BPE-proxy token estimate: word-piece-ish segments =
    alphanumeric runs + isolated punctuation, scaled for long words
    (a stand-in for the HF tokenizer at helpers.py:90-98 that keeps the
    plan JVM-side; pluggable with a real pandas_udf tokenizer)."""
    t = _c(text)
    n_words = token_count(t)
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?'\"\(\)]", ""))
    n_chars = F.length(t)
    # ~4 chars/token heuristic for the residual of long words; floor()
    # (not int-cast) so the SQL oracle reproduces it exactly
    long_word_extra = F.greatest(
        F.lit(0).cast("bigint"), F.floor((n_chars - n_words * 5) / F.lit(4.0))
    )
    return (n_words + n_punct + long_word_extra).cast("bigint")


def avg_word_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return total.cast("double") / F.nullif(F.size(toks), F.lit(0))


STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ein", "ist", "zu", "den"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    """Count of whitespace tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(_c(text))), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return stopword_count(text, lang).cast("double") / F.nullif(
        token_count(text), F.lit(0)
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: length band,
    mean word length band, stopword presence — the standard pretraining
    corpus filters (C4/Gopher-style), all codegen expressions."""
    t = _c(text)
    n_tok = token_count(t)
    awl = avg_word_length(t)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    wl_ok = F.when((awl >= 2.0) & (awl <= 12.0), 1.0).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(t, "en") > 0.05, 1.0).otherwise(0.0)
    return (len_ok + wl_ok + sw_ok) / 3.0


def lang_stopword_count(text: Column | str, code: str) -> Column:
    """Count of tokens matching ``code``'s stopword list."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
    return F.size(F.filter(tokens(F.lower(_c(text))), lambda t: F.array_contains(sw, t)))


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language ID: the language whose stopword list
    matches the most tokens wins; ties break by code order (de < en <
    es < fr < zh); zero matches → 'und'. Pure codegen expressions, and
    directly expressible as a SQL CASE chain for oracle parity."""
    t = _c(text)
    counts = {code: lang_stopword_count(t, code) for code in sorted(STOPWORDS)}
    mx = F.greatest(*counts.values())
    out = F.lit("und")
    expr = F.when(mx == 0, out)
    for code in sorted(STOPWORDS):
        expr = expr.when(counts[code] == mx, F.lit(code))
    return expr


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text — the exact-dedup key.

    Edge-strips with a regex (all whitespace classes), not F.trim
    (ASCII space only), so texts edged with tabs/newlines fingerprint
    identically to their space-trimmed duplicates — same rationale as
    tokens()."""
    stripped = F.regexp_replace(F.lower(_c(text)), r"^\s+|\s+$", "")
    return F.md5(F.regexp_replace(stripped, WS, " "))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (MinHash/Jaccard input).

    Documents with 1..n-1 words yield a single shingle of the whole
    text so they still participate in dedup. Zero-token documents
    (NULL or whitespace-only text) yield an EMPTY array — they have no
    content to dedup on, and letting them through would pair every
    null/blank document with every other at similarity 1.0: an n²
    pair bomb at corpus scale, and a divergence from any SQL oracle
    whose unnest drops them.
    """
    toks = tokens(F.lower(_c(text)))
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        F.when(k >= n, grams)
        .when(k > 0, F.array(F.array_join(toks, " ")))
        .otherwise(F.array().cast("array<string>"))
    )
