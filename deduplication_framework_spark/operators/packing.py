"""Sequence packing — deterministic shard + concat-and-chunk layout.

The last stage of a pretraining data pipeline: after filtering and
dedup, documents are (1) globally shuffled, (2) split into shards, and
(3) concatenated with an end-of-document separator and chunked into
fixed-length training sequences (GPT-style "packing"). This module
computes that layout as pure metadata — for every document, which shard
it lands in, its position, and the half-open token interval
``[tok_start, tok_end)`` it occupies in the shard's concatenated token
stream — without materializing any token arrays.

Determinism (the whole point — any engine must reproduce the layout):

* shard and within-shard order both come from the low 60 bits of
  ``md5(id || ':' || salt)`` (15 hex chars → always fits a signed
  BIGINT; same expression emitted for Spark and DuckDB, the
  ``stratified_sample`` trick), so the "shuffle" is a pure function of
  the doc id — reruns, retries, and other engines agree byte-for-byte;
* ties (same hash) break by doc id; docs count ``n_tokens`` whitespace
  tokens plus ONE separator token each (the trailing separator of the
  last doc still counts — uniform cost, no special case);
* a doc's sequence span is then ``seq_first = tok_start div seq_len``
  .. ``seq_last = (tok_end - 1) div seq_len`` — every downstream reader
  can locate every training sequence a document touches.

Scale posture (100 TB): ONE shuffle, on ``shard`` (pick ``n_shards``
so a shard's metadata fits an executor — 100k shards at 10^12 docs is
10^7 rows/shard); the cumulative sum is a per-shard window over that
partitioning, never a global sort. Empty/whitespace-only docs still
occupy one separator token (they were kept by upstream filters; the
layout must be total).

Reference scope: the reference engine stops at keeper selection; this
is part of the "operations a large-scale training-data pipeline needs"
surface (siblings: loaders.stratified_sample, operators/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deduplication_framework_spark.functions.hash60 import (
    duck_md5_low60,
    spark_md5_low60,
)
from deduplication_framework_spark.functions.quality import (
    _WS_DUCK,
    _WS_SPARK,
)

__all__ = ["pack_sequences", "pack_sequences_sql", "shard_stats"]

DEFAULT_SEQ_LEN = 2048
DEFAULT_SALT = "pack-v1"


def _spark_hash60(id_col: str, salt: str) -> str:
    return spark_md5_low60(
        f"concat(CAST({id_col} AS STRING), ':', '{salt}')"
    )


def _duck_hash60(id_col: str, salt: str) -> str:
    return duck_md5_low60(f"{id_col}::VARCHAR || ':' || '{salt}'")


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = 8,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """``(doc_id, shard, pos, n_tokens, tok_start, tok_end, seq_first,
    seq_last)`` — the deterministic packed layout (module docstring).
    ``pos`` is the doc's 0-based position within its shard; ``tok_end``
    includes the doc's separator token; sequence ids are shard-local."""
    h = F.expr(_spark_hash60(id_col, salt))
    toks = F.expr(
        f"CASE WHEN length(trim({text_col})) = 0 THEN 0 ELSE "
        f"size(split(trim({text_col}), '{_WS_SPARK}')) END"
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    # explicit ROWS frame (the DuckDB twin pins the same): Spark's
    # default RANGE frame makes duplicated (h, doc_id) rows frame PEERS
    # sharing one tok_end, silently breaking the tiling invariant
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            h.alias("h"),
            toks.alias("n_tokens"),
        )
        .withColumn("shard", F.pmod("h", F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .withColumn(
            "tok_end",
            F.sum(F.col("n_tokens") + F.lit(1)).over(w_sum),
        )
        .select(
            "doc_id",
            "shard",
            F.col("pos").cast("long").alias("pos"),
            "n_tokens",
            (F.col("tok_end") - F.col("n_tokens") - F.lit(1)).alias(
                "tok_start"
            ),
            "tok_end",
            F.floor((F.col("tok_end") - F.col("n_tokens") - 1) / seq_len)
            .alias("seq_first"),
            F.floor((F.col("tok_end") - 1) / seq_len).alias("seq_last"),
        )
    )


def pack_sequences_sql(
    *,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = DEFAULT_SEQ_LEN,
    n_shards: int = 8,
    salt: str = DEFAULT_SALT,
) -> str:
    """DuckDB twin of :func:`pack_sequences` (same md5-derived shard and
    order, same separator accounting, same window cumsum)."""
    h = _duck_hash60(id_col, salt)
    toks = (
        f"CASE WHEN length(trim({text_col})) = 0 THEN 0 ELSE "
        f"len(string_split_regex(trim({text_col}), '{_WS_DUCK}')) END"
    )
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {h} AS h,
                   CAST({toks} AS BIGINT) AS n_tokens,
                   CAST({h} % {n_shards} AS INT) AS shard
            FROM {table}
        ), laid AS (
            SELECT doc_id, shard, n_tokens,
                   row_number() OVER w - 1 AS pos,
                   sum(n_tokens + 1) OVER w AS tok_end
            FROM base
            WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT doc_id, shard, CAST(pos AS BIGINT) AS pos, n_tokens,
               CAST(tok_end - n_tokens - 1 AS BIGINT) AS tok_start,
               CAST(tok_end AS BIGINT) AS tok_end,
               CAST((tok_end - n_tokens - 1) // {seq_len} AS BIGINT)
                   AS seq_first,
               CAST((tok_end - 1) // {seq_len} AS BIGINT) AS seq_last
        FROM laid
    """


def shard_stats(packed: DataFrame, *, seq_len: int = DEFAULT_SEQ_LEN):
    """Per-shard layout summary: docs, total tokens (incl. separators),
    and full training sequences the shard yields (the tail remainder is
    dropped at train time — reported so the loss is observable)."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("tok_end").alias("n_tokens_total"),
        )
        .select(
            "shard",
            "n_docs",
            "n_tokens_total",
            F.floor(F.col("n_tokens_total") / seq_len).alias(
                "n_full_sequences"
            ),
            (F.col("n_tokens_total") % seq_len).alias("tail_tokens_dropped"),
        )
    )
