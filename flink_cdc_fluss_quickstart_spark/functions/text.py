"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen) -- no Python UDFs. At 100 TB these run embarrassingly
parallel per-row with zero shuffle; only downstream grouping shuffles.

Cross-engine determinism: every regex/normalization has an exactly equivalent
DuckDB spelling (note DuckDB regexp_replace needs the 'g' flag to match
Spark's replace-all behavior).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# token = maximal run of non-whitespace (whitespace split after trim)
TOKEN_SPLIT_RE = r"\s+"

PUNCT_CLASS = r"[^.,;:!?]"  # negated: everything that is NOT punctuation

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
)

# marker vocabularies for the n-gram/stopword language-ID heuristic;
# scored by token hits, argmax with fixed precedence for ties
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "les", "une", "est", "dans", "pour", "que"),
    "es": ("el", "los", "una", "es", "por", "para", "con"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break precedence


#: DuckDB spelling of tokens() -- the guarded whitespace split every oracle
#: interpolates verbatim. ONE canonical form, enforced by
#: tests/test_registry_guard.py::test_oracle_token_split_is_the_canonical_guard:
#: an oracle spelling the split differently (or bare) fails CI, so the two
#: engines' tokenizers cannot drift. Mirrors tokens() below exactly,
#: including the blank-text empty-array branch.
DUCK_TOKENS = (
    "(CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END)"
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (BPE-ish regex split). A token is a maximal
    run of non-whitespace, so empty or whitespace-only text yields an EMPTY
    array -- bare split(trim(''), ...) returns [''] (one phantom token that
    would pass min-token gates and pad budget counts); the guard and its
    DuckDB mirror (the CASE around every oracle's regexp_split_to_array)
    keep both engines at 0. NULL text stays NULL through either branch."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, TOKEN_SPLIT_RE)
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def stopword_count(text: Column) -> Column:
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def normalized_text(text: Column) -> Column:
    """Lowercase, collapse all non-alphanumeric runs to single spaces, trim --
    the canonical form used by near-dup fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    (md5 hex output is identical across Spark and DuckDB, which makes the
    fingerprint oracle-checkable; a rolling/polynomial hash would be faster on
    a real cluster but is not cross-engine stable.)"""
    return F.md5(normalized_text(text))


def _marker_filter(markers: tuple[str, ...]):
    # factory, not a default-arg lambda: pyspark reads lambda arity to decide
    # whether the second parameter is the array index
    return lambda t: t.isin(*markers)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, _marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language over marker-token hit counts, with the CJK-character
    check taking precedence (any han character -> zh); 'und' if no hits."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate lowest precedence first with >=, so on ties the later
    # (higher-precedence) language takes the slot
    for lang in reversed(LANG_ORDER):
        s = scores[lang]
        take = (s >= best_score) & (s > 0)
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    has_cjk = F.regexp_count(text, F.lit(r"[一-鿿]")) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(best)
