"""Intra-document repetition signals — the second half of the Gopher
quality table (Rae et al. 2021, Table A1: "fraction of characters in the
most common n-gram" for n=2..4 and "fraction of characters in duplicate
n-grams" for n=5..10; reused by MassiveText / Dolma / RefinedWeb).
Complements :mod:`deduplication_framework_spark.functions.quality`, which
covers the scalar-signal rules (word count, symbol ratios, stopwords).

Spec (our deterministic re-derivation; deviations documented):

* n-grams are word n-grams over the shared explicit-whitespace-class
  tokenization (``quality._WS_SPARK`` / ``_WS_DUCK`` — Java ``\\s`` and
  RE2 ``\\s`` disagree on ``\\x0B``), joined with single spaces; the
  character mass of a gram is ``count * length(gram)``.
* ``top_ngram_mass(n)`` = max over distinct n-grams of ``count * len``
  — the repeated-character mass of the heaviest gram. Gopher argmaxes
  by count alone and then measures that gram's characters, which needs
  a tie-break among equal counts; taking the max of the product is
  deterministic with no tie rule and upper-bounds Gopher's value.
* ``dup_ngram_mass(n)`` = sum over distinct n-grams with count >= 2 of
  ``count * len``. Gopher counts each character position at most once
  (overlap-deduplicated coverage); gram mass over-counts overlapping
  occurrences but is monotone in repetition and exactly re-derivable
  in SQL — the property the driver gate needs.
* Fractions divide by ``length(trim(text))`` (the tokenization source,
  including inter-word spaces). Docs with < n tokens score 0.

Engine parity, the ``quality.py`` pattern: one template per dialect,
identical integer arithmetic (masses are exact BIGINTs; only the final
fraction is floating), so Spark and DuckDB cannot drift.

Scale posture: the SQL expression path is pure per-row higher-order
functions — no UDF, no shuffle — but counts each distinct gram with a
linear scan (O(w^2) per doc for w words). Fine for the gate corpus and
web-page-sized docs; for 100-TB runs over long documents use
:func:`make_repetition_udf` (Arrow-batched Counter, O(w) per doc) —
pinned equal to the expression spec in tests/test_repetition.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deduplication_framework_spark.functions.quality import (
    _WS_DUCK,
    _WS_SPARK,
)

__all__ = [
    "TOP_NS",
    "DUP_NS",
    "REP_RULES",
    "repetition_mass_exprs",
    "repetition_mass_sqls",
    "repetition_frac_expr",
    "repetition_frac_sql",
    "with_repetition_masses",
    "repetition_oracle_sql",
    "make_repetition_udf",
]

TOP_NS = (2, 3, 4)  # Gopher: top n-gram char fraction
DUP_NS = (5, 10)  # Gopher: duplicate n-gram char fraction (we pin 2 of 5..10)

# (rule_name, mass_column, max_fraction) — Gopher Table A1 thresholds for
# the repetition half of the quality gate, checked in order after the
# scalar RULES (functions/quality.py); first violation names the drop
REP_RULES = (
    ("top_2gram_frac_high", "top_2gram_mass", 0.20),
    ("top_3gram_frac_high", "top_3gram_mass", 0.18),
    ("top_4gram_frac_high", "top_4gram_mass", 0.16),
    ("dup_5gram_frac_high", "dup_5gram_mass", 0.15),
    ("dup_10gram_frac_high", "dup_10gram_mass", 0.10),
)


def _spark_mass(col: str, n: int, kind: str) -> str:
    toks = f"split(trim({col}), '{_WS_SPARK}')"
    grams = (
        f"transform(sequence(0, size({toks}) - {n}),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {n})))"
    )
    counted = (
        f"transform(array_distinct({grams}),"
        f" g -> struct(size(filter({grams}, x -> x = g)) AS c,"
        f" length(g) AS l))"
    )
    if kind == "top":
        mass = f"array_max(transform({counted}, s -> s.c * s.l))"
    else:
        mass = (
            f"aggregate({counted}, 0,"
            f" (a, s) -> a + IF(s.c >= 2, s.c * s.l, 0))"
        )
    # < n tokens -> no grams; guard BEFORE sequence() (Spark's sequence
    # with start > stop counts DOWN, it does not return empty)
    return f"CAST(IF(size({toks}) < {n}, 0, {mass}) AS BIGINT)"


def _duck_mass(col: str, n: int, kind: str) -> str:
    toks = f"string_split_regex(trim({col}), '{_WS_DUCK}')"
    grams = (
        f"list_transform(range(0, len({toks}) - {n} + 1),"
        f" i -> array_to_string({toks}[i + 1 : i + {n}], ' '))"
    )
    cnt = f"len(list_filter({grams}, x -> x = g))"
    if kind == "top":
        mass = (
            f"list_max(list_transform(list_distinct({grams}),"
            f" g -> {cnt} * length(g)))"
        )
    else:
        mass = (
            f"list_sum(list_transform(list_distinct({grams}),"
            f" g -> CASE WHEN {cnt} >= 2 THEN {cnt} * length(g)"
            f" ELSE 0 END))"
        )
    return (
        f"CAST(CASE WHEN len({toks}) < {n} THEN 0 ELSE ({mass}) END"
        f" AS BIGINT)"
    )


def _names() -> list:
    return [f"top_{n}gram_mass" for n in TOP_NS] + [
        f"dup_{n}gram_mass" for n in DUP_NS
    ]


def repetition_mass_exprs(col: str) -> dict:
    """``{signal: Column}`` — exact BIGINT character masses (Spark)."""
    out = {}
    for n in TOP_NS:
        out[f"top_{n}gram_mass"] = F.expr(_spark_mass(col, n, "top"))
    for n in DUP_NS:
        out[f"dup_{n}gram_mass"] = F.expr(_spark_mass(col, n, "dup"))
    return out


def repetition_mass_sqls(col: str) -> dict:
    """``{signal: duckdb_sql}`` — the DuckDB twins of the masses."""
    out = {}
    for n in TOP_NS:
        out[f"top_{n}gram_mass"] = _duck_mass(col, n, "top")
    for n in DUP_NS:
        out[f"dup_{n}gram_mass"] = _duck_mass(col, n, "dup")
    return out


def repetition_frac_expr(col: str, n: int, kind: str) -> Column:
    """mass / length(trim(col)) as double (Spark); 0 when text is empty."""
    mass = _spark_mass(col, n, kind)
    return F.expr(
        f"IF(length(trim({col})) = 0, 0.0D,"
        f" {mass} / length(trim({col})))"
    )


def repetition_frac_sql(col: str, n: int, kind: str) -> str:
    """DuckDB twin of :func:`repetition_frac_expr`."""
    mass = _duck_mass(col, n, kind)
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0.0"
        f" ELSE {mass} * 1.0 / length(trim({col})) END"
    )


def with_repetition_masses(df, text_col: str):
    """``df`` + the five BIGINT mass columns, STAGED: tokens and each
    gram list are materialized as intermediate columns so every lambda
    captures a bound column reference. The single-expression templates
    (:func:`repetition_mass_exprs`) are the readable spec, but both
    engines re-evaluate a lambda's captured expression per element — a
    ``filter(grams, ...)`` whose ``grams`` is itself an expression tree
    rebuilds the gram list for every distinct gram (measured ~17x wall
    on the gate corpus). Catalyst keeps the staging because a non-cheap
    alias referenced more than once is not collapsed into consumers.
    Pinned equal to the spec templates in tests/test_repetition.py."""
    toks = "_rep_toks"
    d = df.withColumn(
        toks, F.expr(f"split(trim({text_col}), '{_WS_SPARK}')")
    )
    ns = sorted(set(TOP_NS) | set(DUP_NS))
    for n in ns:
        d = d.withColumn(
            f"_rep_g{n}",
            F.expr(
                f"IF(size({toks}) < {n},"
                f" CAST(array() AS array<string>),"
                f" transform(sequence(0, size({toks}) - {n}),"
                f" i -> concat_ws(' ', slice({toks}, i + 1, {n}))))"
            ),
        )
    for n, kind in [(n, "top") for n in TOP_NS] + [
        (n, "dup") for n in DUP_NS
    ]:
        g = f"_rep_g{n}"
        counted = (
            f"transform(array_distinct({g}),"
            f" x -> struct(size(filter({g}, y -> y = x)) AS c,"
            f" length(x) AS l))"
        )
        if kind == "top":
            mass = (
                f"coalesce(array_max(transform({counted},"
                f" s -> s.c * s.l)), 0)"
            )
        else:
            mass = (
                f"aggregate({counted}, 0,"
                f" (a, s) -> a + IF(s.c >= 2, s.c * s.l, 0))"
            )
        d = d.withColumn(
            f"{kind}_{n}gram_mass", F.expr(f"CAST({mass} AS BIGINT)")
        )
    return d.drop(toks, *[f"_rep_g{n}" for n in ns])


def repetition_oracle_sql(
    *, table: str, id_col: str, text_sql: str
) -> str:
    """Full staged DuckDB query computing every mass plus the top-2/dup-5
    fractions — RELATIONAL formulation (unnest grams -> GROUP BY counts
    -> FILTERed aggregates). Same spec as :func:`repetition_mass_sqls`
    (pinned equal in tests/test_repetition.py) but ~100x faster: DuckDB
    re-evaluates a lambda's captured list expression per element, so the
    nested list_filter-inside-list_transform spec templates go
    quadratic-with-recomputation on real corpora; counting grams as rows
    is the engine-native plan. Docs with no grams at some n keep zeros
    via the LEFT JOIN back to the base."""
    ns = sorted(set(TOP_NS) | set(DUP_NS))
    toks = f"string_split_regex(trim(raw), '{_WS_DUCK}')"
    tops = ",\n               ".join(
        f"coalesce(max(CASE WHEN nn = {n} THEN c * l END), 0)"
        f" AS top_{n}gram_mass"
        for n in TOP_NS
    )
    dups = ",\n               ".join(
        f"coalesce(sum(CASE WHEN nn = {n} AND c >= 2 THEN c * l END), 0)"
        f" AS dup_{n}gram_mass"
        for n in DUP_NS
    )
    mass_cols = ", ".join(_names())
    return f"""
        WITH raw AS (
            SELECT {id_col} AS doc_id, {text_sql} AS raw FROM {table}
        ), base AS (
            SELECT doc_id, length(trim(raw)) AS n_chars, {toks} AS toks
            FROM raw
        ), grams AS (
            SELECT doc_id, nn,
                   unnest(list_transform(
                       range(0, len(toks) - nn + 1),
                       i -> array_to_string(toks[i + 1 : i + nn], ' ')
                   )) AS gram
            FROM base CROSS JOIN (SELECT unnest({list(ns)}) AS nn)
        ), cnt AS (
            SELECT doc_id, nn, gram, count(*) AS c, length(gram) AS l
            FROM grams GROUP BY doc_id, nn, gram
        ), agg AS (
            SELECT doc_id,
               {tops},
               {dups}
            FROM cnt GROUP BY doc_id
        ), filled AS (
            SELECT b.doc_id, b.n_chars,
                   {", ".join(f"CAST(coalesce({c}, 0) AS BIGINT) AS {c}" for c in _names())}
            FROM base b LEFT JOIN agg USING (doc_id)
        )
        SELECT doc_id, {mass_cols},
               round(CASE WHEN n_chars = 0 THEN 0.0
                     ELSE top_2gram_mass * 1.0 / n_chars END, 6)
                   AS top_2gram_frac,
               round(CASE WHEN n_chars = 0 THEN 0.0
                     ELSE dup_5gram_mass * 1.0 / n_chars END, 6)
                   AS dup_5gram_frac
        FROM filled
    """


def make_repetition_udf():
    """Arrow-batched O(w)-per-doc scale path: text -> struct of the same
    BIGINT masses as :func:`repetition_mass_exprs` (pinned equal in
    tests). Use via ``df.select(udf("text").alias("m")).select("m.*")``."""
    import re
    from collections import Counter

    ws = re.compile(r"[ \t\n\r\f\x0b]+")
    fields = T.StructType(
        [T.StructField(name, T.LongType()) for name in _names()]
    )

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(fields)
    def rep(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        def one(text: str) -> list:
            toks = [t for t in ws.split((text or "").strip()) if t != ""]
            out = []
            for n, kind in [(n, "top") for n in TOP_NS] + [
                (n, "dup") for n in DUP_NS
            ]:
                if len(toks) < n:
                    out.append(0)
                    continue
                c = Counter(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
                if kind == "top":
                    out.append(max(k * len(g) for g, k in c.items()))
                else:
                    out.append(
                        sum(k * len(g) for g, k in c.items() if k >= 2)
                    )
            return out

        for s in batches:
            rows = [one(t) for t in s]
            yield pd.DataFrame(rows, columns=_names())

    return rep
