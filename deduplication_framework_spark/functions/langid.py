"""N-gram / stopword-profile language identification (text-analysis op).

The reference pipeline carries a language tag on its page records but never
derives one (`text/`: the corpus arrives pre-tagged); a training-data
pipeline at ingest scale needs the derivation itself. This is the classic
function-word-profile reduction of Cavnar & Trenkle '94 n-gram text
categorization: score each candidate language by how many of the document's
tokens (with multiplicity) fall in that language's closed-class
function-word list, predict the argmax, tie-break in fixed alphabetical
language order, and fall back to ``"und"`` (BCP-47 undetermined) when the
best score is below ``min_hits``.

Scale posture: pure JVM column expressions — ``split`` + higher-order
``filter`` + ``greatest`` + a CASE chain. No Python in the loop, no
shuffle, linear scan, whole-stage-codegen friendly, and SQL-expressible
verbatim (the driver oracle rebuilds it in DuckDB from the SAME profile
constants). Tokenization is ``lower(text)`` split on ``[^a-z]+``, so the
profiles below deliberately contain only accent-free forms: accented
function words (fur/esta/etc. in their native spellings) would tokenize
with the accent as a separator, and locale-dependent lowercasing must
never change a prediction.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Insertion order is irrelevant — prediction ties break in sorted(lang)
# order. Words are chosen high-frequency AND cross-profile distinctive
# (shared Romance words like "que" may appear in two profiles; they then
# score both, which is the honest behavior for a profile method).
PROFILES: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "is", "that", "it", "with", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "les", "des", "une", "est", "que", "pas", "dans", "pour", "avec"),
    "es": ("el", "los", "las", "una", "que", "por", "con", "para", "como", "pero"),
}

UNDETERMINED = "und"


def tokens_expr(text_col: Column) -> Column:
    """``lower(text)`` split on runs of non-[a-z]. Compute ONCE and reuse
    across the per-language score expressions — Catalyst does not always
    CSE a repeated split inside sibling lambda filters."""
    return F.split(F.lower(text_col), "[^a-z]+")


def profile_hits_expr(tokens_col: Column, words: Sequence[str]) -> Column:
    """Token hits WITH multiplicity (``filter``+``size``, not
    ``array_intersect`` — set semantics would undercount repeated function
    words, exactly the signal this heuristic relies on)."""
    wl = list(words)
    return F.size(F.filter(tokens_col, lambda t: t.isin(wl)))


def lang_id_expr(
    tokens_col: Column,
    profiles: Dict[str, Sequence[str]] = None,
    min_hits: int = 1,
) -> Column:
    """Predicted language code; ``"und"`` when max score < ``min_hits``.
    Ties break to the alphabetically FIRST language — the DuckDB oracle's
    CASE chain evaluates in the identical order."""
    profiles = PROFILES if profiles is None else profiles
    langs = sorted(profiles)
    scores = {lang: profile_hits_expr(tokens_col, profiles[lang]) for lang in langs}
    best = (
        F.greatest(*scores.values())
        if len(langs) > 1
        else scores[langs[0]]
    )
    pred = None
    for lang in langs:
        pred = (
            F.when(scores[lang] == best, F.lit(lang))
            if pred is None
            else pred.when(scores[lang] == best, F.lit(lang))
        )
    pred = pred.otherwise(F.lit(UNDETERMINED))
    return F.when(best < F.lit(min_hits), F.lit(UNDETERMINED)).otherwise(pred)


def lang_id_sql(
    text_expr: str = "text",
    profiles: Dict[str, Sequence[str]] = None,
    min_hits: int = 1,
) -> Dict[str, str]:
    """The SAME classifier as ANSI/DuckDB SQL fragments, generated from the
    same profile constants so Spark and oracle can never drift. Returns
    ``{"toks": ..., "scores": {lang: ...}, "pred": ...}`` where `scores`
    and `pred` reference a column ``toks`` and columns ``s_<lang>``."""
    profiles = PROFILES if profiles is None else profiles
    langs = sorted(profiles)
    toks = f"string_split_regex(lower({text_expr}), '[^a-z]+')"
    scores = {
        lang: (
            "len(list_filter(toks, t -> t IN ("
            + ", ".join(f"'{w}'" for w in profiles[lang])
            + ")))"
        )
        for lang in langs
    }
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    pred = (
        f"CASE WHEN {best} < {min_hits} THEN '{UNDETERMINED}' {case} "
        f"ELSE '{UNDETERMINED}' END"
    )
    return {"toks": toks, "scores": scores, "pred": pred}
