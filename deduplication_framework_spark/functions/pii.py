"""PII redaction — training-data hygiene over web text.

Common-Crawl-derived corpora redact personally identifying strings
before training (CCNet/Dolma/BigScience-style anonymization: emails,
IPv4 addresses, phone numbers replaced by typed placeholder tokens).
The reference has no PII stage — this is one of the beyond-reference
LLM-pipeline operators, built the way the rest of this repo builds
scalar text ops: PURE JVM column expressions (``regexp_replace`` /
``regexp_extract_all``, no Python in the loop), with the equivalent
DuckDB SQL generated from the SAME pattern constants so the two engines
cannot drift (the ``functions/urls.py`` / ``functions/langid.py``
pattern).

Scale posture: redaction is a per-row map — no shuffle, no UDF, fully
inside whole-stage codegen; at 100 TB it rides the scan.

Pattern parity notes (Java regex on the Spark side, RE2 in DuckDB):

* only shared syntax is used — ASCII classes, ``(?:...)``, ``\\b``,
  bounded quantifiers; no lookaround (RE2 has none), no ``\\s`` (Java's
  includes ``\\x0B``, RE2's does not — explicit ``[ \\t]`` instead);
* both engines use Perl leftmost-greedy match semantics (RE2's default,
  not POSIX-longest), so match SPANS agree, not just match counts;
* patterns reach Spark via the Python API (no SQL-literal backslash
  doubling) and DuckDB via verbatim single-quoted literals.

Redaction is SEQUENTIAL in :data:`PII_RULES` order — emails first (an
email can embed digit runs), then IPs, then phones — and each type's
count is the number of replacements actually performed at its step
(computed on the previous step's output), so ``n_<type>`` sums to the
number of placeholders inserted. The phone pattern is deliberately
conservative-greedy (8-16 chars of digits/punctuation): long digit runs
such as timestamps DO match — documented tradeoff, recall over
precision, same stance as public pipeline implementations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_RULES", "redact_pii_expr", "pii_count_exprs", "redact_pii_sql", "pii_count_sqls"]

# (name, regex, placeholder) — order is the redaction order.
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \t().-]{6,14}\d", "<PHONE>"),
)


def redact_pii_expr(col: str) -> Column:
    """Fully redacted text: every rule applied in order."""
    out = F.col(col)
    for _name, pat, repl in PII_RULES:
        out = F.regexp_replace(out, F.lit(pat), F.lit(repl))
    return out


def pii_count_exprs(col: str) -> dict:
    """``{name: Column}`` — per-type replacement counts, each computed
    on the text AFTER the earlier rules ran (matches the sequential
    redaction, so counts == placeholders inserted)."""
    cur = F.col(col)
    counts = {}
    for name, pat, repl in PII_RULES:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, F.lit(pat), F.lit(repl))
    return counts


def _sql_quote(pat: str) -> str:
    # DuckDB string literals are verbatim (no backslash escapes); only
    # single quotes need doubling — none of the patterns contain one,
    # but guard anyway.
    return "'" + pat.replace("'", "''") + "'"


def redact_pii_sql(col: str) -> str:
    """DuckDB SQL computing the same fully-redacted text."""
    out = col
    for _name, pat, repl in PII_RULES:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, '{repl}', 'g')"
    return out


def pii_count_sqls(col: str) -> dict:
    """``{name: sql}`` — DuckDB twins of :func:`pii_count_exprs`."""
    cur = col
    counts = {}
    for name, pat, repl in PII_RULES:
        counts[name] = (
            f"len(regexp_extract_all({cur}, {_sql_quote(pat)}))"
        )
        cur = f"regexp_replace({cur}, {_sql_quote(pat)}, '{repl}', 'g')"
    return counts
