"""Distributed suffix-array exact-substring detector (SURVEY.md J17).

Absent from the reference; required by the north rule ("a distributed
suffix-array pass for exact substring duplication"). Semantics per Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models Better",
public): two docs are substring-duplicates when they share a contiguous
span of >= L characters.

Algorithm — prefix doubling over per-document suffixes, bounded at L:

  1. Explode each doc into suffix rows (doc_id, pos), one per character
     position. Suffixes never cross document boundaries — the row model IS
     the sentinel-separated concatenation a single-node suffix array builds.
  2. rank_0 = dense rank of the suffix's first k0 characters (global
     range-partitioned sort + zipWithIndex — the distributed analog of the
     in-memory suffix sort).
  3. Prefix-double while k < L/2: rank' = dense rank of
     (rank[pos], rank[pos+k]), the shifted rank fetched by an equi-join on
     (doc_id, pos+k); missing position (suffix shorter than 2k) → -1, which
     preserves exact end-of-string semantics. After each round, rank
     equality ⇔ the first min(2k, remaining+1) characters are identical.
  4. Overlap combine: once k >= L/2, the pair
     (rank[pos], rank[pos + L - k]) is equal for two suffixes iff their
     first L characters are identical (the two k-windows cover [0, L)).
     Only positions with >= L remaining characters participate.
  5. Bucket by that pair: every bucket holding >= 2 distinct docs certifies
     an exact L-char shared substring — rank comparison is exact, no hashing
     or verification involved. Pair generation reuses the LSH candidate
     machinery (hot-bucket capping for boilerplate spans).

Cost model: |rows| = total corpus characters — the inherent suffix-array
price (cf. Lee et al. running suffix arrays over full corpora); every round
is one sort + one join shuffle of those rows, and the round count is
ceil(log2(L/k0/2)) + 1 ≈ 5 for L=200 — bounded by the MATCH length, not the
corpus length, which is what keeps the pass tractable at 10^12 docs. The
winnowing detector (functions.text.make_winnow_udf) is the cheaper
probabilistic-positioning alternative; this pass is the exact one.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dense_rank(keys: DataFrame, key_cols) -> DataFrame:
    """Globally dense-rank distinct keys: range-partitioned sort + a
    two-pass partition-offset assignment (the distributed zipWithIndex
    pattern), Arrow-native end to end — no single-partition window and no
    per-row Python objects. Returns key_cols + rank."""
    sorted_keys = (
        keys.select(*key_cols)
        .distinct()
        .orderBy(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r._pid: r.n
        for r in sorted_keys.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in keys.select(*key_cols).schema.fields
    )

    def assign(batches):
        import pandas as pd  # noqa: F811 (executor-side)

        local = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets.get(pid, 0) + local
            out = pdf.drop(columns=["_pid"])
            out["rank"] = range(base, base + len(pdf))
            local += len(pdf)
            yield out

    ranked = sorted_keys.mapInPandas(
        assign, schema=f"{out_fields}, rank long"
    )
    return ranked


def suffix_ranks(
    docs: DataFrame,
    min_match_chars: int,
    k0: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Tuple[DataFrame, int, int]:
    """→ (suffixes(doc_id, pos, len, rank), depth_k, rounds).

    rank equality ⇔ equal prefix of min(depth_k*2-ish, remaining) chars;
    the caller combines (rank[pos], rank[pos+L-depth_k]) for exact-L
    equality. ``len`` = doc length (carried for the >=L filter).
    """
    L = min_match_chars
    # Direct mode: when ceil(L/2)-char sort keys are affordable (the common
    # L<=1024 config), rank suffixes by their first ceil(L/2) chars in ONE
    # distributed sort — the doubling loop then has nothing to do, and the
    # whole pass is ~4 shuffles instead of ~3 per doubling round. Prefix
    # doubling remains the path for large L (long-key sorts get expensive).
    if k0 >= 8 and L <= 1024:
        k0 = (L + 1) // 2
    k0 = min(k0, L)
    suffixes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("len"),
        F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("pos"),
        F.col(text_col).alias("_t"),
    ).select(
        "doc_id",
        "len",
        "pos",
        F.expr(f"substring(_t, pos, {k0})").alias("key0"),
    )

    ranks0 = _dense_rank(suffixes, ["key0"])
    s = suffixes.join(ranks0, "key0").select("doc_id", "len", "pos", "rank")

    k = k0
    rounds = 0
    while 2 * k < L:
        s = s.localCheckpoint(eager=True)
        shifted = s.select(
            F.col("doc_id").alias("s_doc"),
            (F.col("pos") - k).alias("s_pos"),
            F.col("rank").alias("rank2"),
        )
        paired = s.join(
            shifted,
            (F.col("doc_id") == F.col("s_doc")) & (F.col("pos") == F.col("s_pos")),
            "left",
        ).select(
            "doc_id",
            "len",
            "pos",
            F.col("rank").alias("r1"),
            F.coalesce(F.col("rank2"), F.lit(-1)).alias("r2"),
        )
        ranks = _dense_rank(paired, ["r1", "r2"])
        s = paired.join(ranks, ["r1", "r2"]).select("doc_id", "len", "pos", "rank")
        k *= 2
        rounds += 1
    return s.localCheckpoint(eager=True), k, rounds


def substring_buckets(
    docs: DataFrame,
    min_match_chars: int,
    k0: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, band_idx=0, band_key) — one row per (doc, exact L-char
    prefix class), ready for ``candidate_pairs``."""
    L = min_match_chars
    s, k, _ = suffix_ranks(docs, L, k0=k0, id_col=id_col, text_col=text_col)

    # overlap combine: ranks at pos and pos + (L - k); both windows length-k
    # (k >= L/2) jointly cover [pos, pos+L)
    off = L - k
    eligible = s.filter(F.col("pos") <= F.col("len") - L + 1)
    if off > 0:
        shifted = s.select(
            F.col("doc_id").alias("s_doc"),
            (F.col("pos") - off).alias("s_pos"),
            F.col("rank").alias("rank_b"),
        )
        combined = eligible.join(
            shifted,
            (F.col("doc_id") == F.col("s_doc")) & (F.col("pos") == F.col("s_pos")),
            "inner",
        ).select("doc_id", F.col("rank").alias("rank_a"), "rank_b")
    else:
        combined = eligible.select(
            "doc_id", F.col("rank").alias("rank_a"), F.lit(0).alias("rank_b")
        )

    return combined.select(
        "doc_id",
        F.lit(0).alias("band_idx"),
        F.xxhash64("rank_a", "rank_b").alias("band_key"),
    ).distinct()


def substring_edges_suffix_array(
    docs: DataFrame,
    min_match_chars: int,
    bucket_cap: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Tuple[DataFrame, DataFrame]:
    """→ (edges(src, dst, sim=1.0), bucket_stats): doc pairs sharing an
    exact >= min_match_chars-char substring."""
    from deduplication_framework_spark.operators.lsh import candidate_pairs

    bands = substring_buckets(
        docs, min_match_chars, id_col=id_col, text_col=text_col
    )
    pairs, stats = candidate_pairs(bands, bucket_cap=bucket_cap)
    edges = pairs.select("src", "dst", F.lit(1.0).alias("sim"))
    return edges, stats
