"""Text-analysis column builders (training-data-pipeline extensions).

All pure Spark built-ins (JVM-side, whole-stage codegen) — no Python in the
hot path. Each builder has a matching DuckDB-SQL rendering in
plans/extensions.py; only constructs verified cross-engine-exact are used
(replace/length occurrence counts, md5, simple regex character classes,
sequential array folds — see tools/oracle_check.py history).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword language-ID heuristic;
# scored by literal-occurrence counting, argmax with fixed tie-break order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " and ", " of "],
    "de": [" der ", " und ", " die ", " ist "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " y ", " los ", " que "],
}
LANG_ORDER = ["en", "de", "fr", "es"]

TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish: runs of letters/digits/punct


def occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via replace/length — identical in every SQL engine."""
    return ((F.length(text) - F.length(F.replace(text, F.lit(needle))))
            / len(needle)).cast("long")


def word_count(text: Column) -> Column:
    return F.size(F.split(text, " ")).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace-agnostic BPE-ish token count (letters/digits/punct runs)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0)).cast("long")


def lang_score(text: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    score = F.lit(0).cast("long")
    for marker in LANG_MARKERS[lang]:
        score = score + occurrences(padded, marker)
    return score


def lang_id(text: Column) -> Column:
    """argmax over language scores, ties resolved in LANG_ORDER; 'und' if
    every score is zero (undetermined)."""
    scores = {lg: lang_score(text, lg) for lg in LANG_ORDER}
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lg in reversed(LANG_ORDER):  # earlier languages win ties
        cond = scores[lg] >= F.greatest(*[scores[o] for o in LANG_ORDER if o != lg],
                                        F.lit(1).cast("long"))
        best = F.when(cond, F.lit(lg)).otherwise(best)
    return best


def quality_score(text: Column) -> Column:
    """Rational-arithmetic quality heuristic in [0,1]: rewards word count up
    to 100, penalizes non-alpha density and very short words. No
    transcendentals (cross-engine exactness)."""
    text = F.coalesce(text, F.lit(""))   # NULL text ≡ empty text (r8)
    nw = word_count(text)
    nc = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^a-z]", ""))
    alpha_ratio = alpha / F.greatest(nc, F.lit(1))
    wc_term = F.least(nw, F.lit(100)).cast("double") / 100.0
    avg_wlen = nc.cast("double") / F.greatest(nw, F.lit(1))
    len_term = F.when(avg_wlen >= 3.0, F.lit(1.0)).otherwise(avg_wlen / 3.0)
    return (wc_term * alpha_ratio * len_term).alias("quality")


def fingerprint_poly(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash of the full text (mod 1e9+7),
    folded char-by-char — the classic Rabin-Karp document fingerprint."""
    return F.aggregate(
        F.split(F.coalesce(text, F.lit("")), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % 1_000_000_007)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (the dedup feature set)."""
    words = F.split(text, " ")
    if n == 1:
        return F.array_distinct(words)
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    gram = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(words, i + k) for k in range(n)]))
    # guard: Spark's sequence(1, x) DESCENDS for x < 1 (it would fabricate
    # grams); short docs have no n-grams at all
    return F.when(F.size(words) < n, F.array().cast("array<string>")) \
            .otherwise(F.array_distinct(gram))


def md5_hash60(col: Column) -> Column:
    """60-bit integer hash from the md5 hex prefix — cross-engine exact
    (DuckDB: CAST('0x' || substring(md5(x),1,15) AS UBIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
