"""Text-analysis column functions for the documents pipeline.

All native expressions (regexp/split/length) — at 100 TB these run in
whole-stage codegen over the parquet scan with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = r"[a-z]+"
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9 ]"
STOPWORDS = ("the", "a", "of", "to", "and", "in")

# marker-word regexes per language for the n-gram/stopword language-ID
# heuristic; precedence order breaks ties
LANG_MARKERS = (
    ("en", r"\b(the|and|of)\b"),
    ("fr", r"\b(le|la|et)\b"),
    ("de", r"\b(der|die|und)\b"),
    ("es", r"\b(el|los|y)\b"),
    ("zh", r"[一-鿿]"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Whitespace word split (the documents fixture is single-spaced)."""
    return F.split(_c(col), " ", -1)


def word_count(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and lone symbols."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_RE), 0))


def word_shingles(col: Column | str, n: int = 3, sep: str = "_") -> Column:
    """Distinct n-word shingles; callers must filter word_count >= n."""
    ws = words(col)
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    parts = F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(parts)


def alpha_ratio(col: Column | str) -> Column:
    """Share of [a-z ] characters — a quality-score component."""
    c = _c(col)
    kept = F.regexp_replace(c, "[^a-z ]", "")
    return F.length(kept).cast("double") / F.length(c)


def avg_word_len(col: Column | str) -> Column:
    c = _c(col)
    n = word_count(c)
    return (F.length(c) - (n - F.lit(1))).cast("double") / n


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))
    return F.md5(norm.cast("binary"))


def marker_hits(col: Column | str, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), 0))


def langid(col: Column | str) -> Column:
    """Argmax over marker-hit counts; earlier LANG_MARKERS entry wins ties.

    A cascade: lang_i is chosen iff its hits >= hits of every later lang
    (earlier langs already failed their own test). Deterministic and
    trivially mirrored in ANSI SQL for the oracle.
    """
    c = _c(col)
    hits = [marker_hits(c, pat) for _, pat in LANG_MARKERS]
    langs = [lang for lang, _ in LANG_MARKERS]
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            c_ij = hits[i] >= hits[j]
            cond = c_ij if cond is None else cond & c_ij
        expr = F.when(cond, langs[i]).otherwise(expr)
    return expr
