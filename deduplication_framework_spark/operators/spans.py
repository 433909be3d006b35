"""Exact span-level deduplication (keep the global first occurrence).

Beyond-reference addition from the public training-data playbook: the
reference deduplicates whole documents (``text/method/pipeline_api.py``);
large-scale corpora also drop *repeated spans* — paragraphs, lines, or
fixed word-chunks — keeping only the first occurrence corpus-wide
(Dolma's paragraph dedup, CCNet's line-hash dedup). A boilerplate span
shared by a million pages survives in exactly one of them.

Spark form, scale posture:

* spans carry an ``md5(span)`` 128-bit key so the keep-first shuffle moves
  16-byte keys plus the span text once, and groups only ever contain true
  duplicates (collision budget 2^-128 per pair, the same budget accepted
  by ``operators/exact.py``);
* keep-first is one ``min(struct(order, pos, ...))`` aggregation per hash
  group — one shuffle with map-side combine, no self-join, no window
  straggler on hot spans;
* reassembly is one ``groupBy(doc)`` with an ``array_sort(collect_list)``
  — doc-keyed, so both shuffles partition cleanly at any corpus size.
  A document whose every span was seen earlier re-emits as empty text
  (callers filter on ``n_kept`` if they want to drop it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(id, pos, span) — split ``text_col`` on the ``sep`` regex, drop
    spans that are empty after trimming (separator runs / blank lines),
    keep 0-based original positions so reassembly preserves order."""
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "span"),
    )
    return exploded.filter(F.trim(F.col("span")) != "")


def dedup_spans_df(
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Keep-first over pre-exploded spans (id, pos, span): the single
    surviving row per distinct span text is the one with the smallest
    (order, pos) corpus-wide; every later copy — including repeats inside
    the same document — is dropped.

    Implemented as ``groupBy(hash).agg(min(struct(order, pos, ...)))``
    rather than a row_number window: min-of-struct gets map-side partial
    aggregation, so a boilerplate span repeated a million times collapses
    to one row per map partition BEFORE the shuffle — a window would ship
    every copy to a single straggler task."""
    order_col = order_col or id_col
    rest = [c for c in spans.columns if c not in (order_col, "pos")]
    first = (
        spans.groupBy(F.md5(F.col("span")).alias("_h"))
        .agg(
            F.min(
                F.struct(F.col(order_col), F.col("pos"), *rest)
            ).alias("_w")
        )
        .select("_w.*")
    )
    return first.select(*spans.columns)


def dedup_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    join_sep: str = "\n",
) -> DataFrame:
    """Document-level result: (id, n_spans, n_kept, text_dedup).

    ``n_spans`` counts the doc's non-empty spans, ``n_kept`` how many
    survived keep-first, ``text_dedup`` the survivors re-joined with
    ``join_sep`` in original order ('' when nothing survived — the
    whole document was boilerplate already seen earlier).
    """
    spans = explode_spans(docs, id_col=id_col, text_col=text_col, sep=sep)
    return assemble_dedup(
        docs.select(id_col), spans, id_col=id_col, join_sep=join_sep
    )


def assemble_dedup(
    doc_ids: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    order_col: str | None = None,
    join_sep: str = "\n",
) -> DataFrame:
    """Keep-first + reassembly over pre-exploded spans (id, pos, span);
    callers that chunk differently (fixed word windows, sentences) reuse
    the shared shuffle plan. ``doc_ids`` carries every document that must
    appear in the output, including those whose spans all deduped away."""
    kept = dedup_spans_df(spans, id_col=id_col, order_col=order_col)

    per_doc_total = spans.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    per_doc_kept = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda s: s["span"],
            ),
        ).alias("text_dedup"),
    )
    return (
        doc_ids
        .join(per_doc_total, id_col, "left")
        .join(per_doc_kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )
