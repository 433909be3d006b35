"""Distributed exact-substring detector (SURVEY.md J17).

Absent from the reference; required by the north rule ("a distributed
suffix-array pass for exact substring duplication"). Semantics per Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models Better",
public): two docs are substring-duplicates when they share a contiguous
span of >= L characters — equivalently, when they share any exact L-gram.

Two modes (``substring_edges_suffix_array(mode=...)``):

* ``hash`` (default, the 100-TB path) — bucket positions by the 128-bit
  double-Karp-Rabin rolling hash of their L-gram
  (:func:`kernels.lgram_hashes128`): ONE vectorized Arrow pass per doc, no
  suffix-row explosion, no string sort, no join-back. The (h1, h2) pair is
  carried as the (band_idx, band_key) bucket key, so the spurious-bucket
  probability is the 128-bit birthday bound (~2^-93 headroom at 10^14
  corpus positions — a single 64-bit key would manufacture ~10^8 false
  pairs at that scale). Exact recall: equal L-grams always hash equal.

  Left-extension pair suppression (round 3; VERDICT r2 "What's wrong #1"):
  a shared span of S chars used to re-assert the same doc pair in all
  S−L+1 of its L-gram buckets, multiplying pair-shuffle bytes by the mean
  span length on boilerplate corpora. Each band row now carries ``prev``
  — the 64-bit key mix of the L-gram one character to the LEFT of the
  kept (first) occurrence (NULL at doc start) — and pair generation emits
  only across distinct prev groups (``candidate_pairs(group_col=
  "prev")``). Exactness: suppose pair (A, B) is suppressed in bucket g
  (equal prevs). Equal 64-bit prev ⇒ (whp) same preceding L-gram p, which
  both docs therefore contain, and whose FIRST occurrence in each doc is
  strictly earlier than g's — so (A, B) co-occur in bucket p with a
  strictly smaller first-position sum. The descent terminates (positions
  bound it below) at a bucket where the prevs differ or are NULL (doc
  start; NULL groups are per-doc), where the pair IS emitted. A cross-doc
  64-bit prev false-equality (2^-64 per in-bucket pair) only suppresses
  that one bucket's assertion. Interior buckets of an n-doc shared run
  collapse to a single group and emit ZERO pairs — per-run pair volume
  drops from O(S·n) to O(n).

* ``rank`` — the hash-free exact path: prefix doubling over per-document
  suffix rows. Round-2 hardening (VERDICT round 1, Next round #4):

  - singleton rank classes are PRUNED from re-ranking between doubling
    rounds (a suffix whose first-k-chars class is a singleton can never
    pair at any longer length; its rank is frozen and it keeps serving
    shifted-rank lookups so short-vs-pruned ``-1`` sentinels can't falsely
    equate) — the per-round sort shrinks to the still-ambiguous rows;
  - the round-1 "direct mode" that sorted ceil(L/2)-char string keys (and
    joined them back) is gone — ranking always doubles from short k0 keys.

  Ranks are only used for EQUALITY (bucketing), never order, so each
  round's fresh dense ranks live in a disjoint namespace
  (``rank*64 + round``) and frozen ranks stay valid forever.

Algorithm (rank mode):

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
     an exact L-char shared substring. Pair generation reuses the LSH
     candidate machinery (bucket_cap=1 — buckets are true cliques).

Cost model: hash mode ~ one Arrow scan + |distinct L-grams| long rows
through one groupBy — the same shape as the winnowing detector with window
= 1. Rank mode rows = total corpus characters; every round is one sort of
the still-ambiguous rows + one join, round count = ceil(log2(L/k0/2)) + 1 —
bounded by the MATCH length, not the corpus length.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from deduplication_framework_spark.functions import kernels as K

# rank-namespace stride: round r's dense ranks become rank*_NS + r, so
# frozen (pruned-singleton) ranks can never collide with later rounds'.
_NS = 64


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

    # materialize the ranked keys, then release the sorted-keys cache —
    # suffix rows are |corpus chars|, so leaking one persisted DF per
    # doubling round would pin substantial storage memory for the session
    ranked = sorted_keys.mapInPandas(
        assign, schema=f"{out_fields}, rank long"
    ).localCheckpoint(eager=True)
    sorted_keys.unpersist()
    return ranked


def suffix_ranks(
    docs: DataFrame,
    min_match_chars: int,
    k0: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    prune_singletons: bool = True,
) -> Tuple[DataFrame, int, int]:
    """→ (suffixes(doc_id, pos, len, rank), depth_k, rounds).

    rank equality ⇔ equal prefix of min(depth, remaining) chars; the caller
    combines (rank[pos], rank[pos+L-depth_k]) for exact-L equality. ``len``
    = doc length (carried for the >=L filter). Ranks are equality labels,
    NOT lexicographic order (pruned-singleton namespacing — see module
    docstring).
    """
    L = min_match_chars
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
    active = suffixes.join(ranks0, "key0").select(
        "doc_id", "len", "pos", (F.col("rank") * _NS).alias("rank")
    )
    resolved = None  # frozen singleton-class rows (final ranks)

    k = k0
    rounds = 0
    while 2 * k < L:
        rounds += 1
        active = active.localCheckpoint(eager=True)
        if prune_singletons:
            w = Window.partitionBy("rank")
            sized = active.withColumn("_csz", F.count("*").over(w))
            newly = sized.filter(F.col("_csz") == 1).drop("_csz")
            active = sized.filter(F.col("_csz") > 1).drop("_csz")
            resolved = (
                newly if resolved is None else resolved.unionByName(newly)
            )
        # shifted-rank lookups must see EVERY position (a pruned pos+k must
        # answer with its frozen rank, not fall to the -1 short-suffix
        # sentinel — that sentinel collision would falsely equate classes)
        lookup = (
            active if resolved is None else active.unionByName(resolved)
        )
        shifted = lookup.select(
            F.col("doc_id").alias("s_doc"),
            (F.col("pos") - k).alias("s_pos"),
            F.col("rank").alias("rank2"),
        )
        paired = active.join(
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
        active = paired.join(ranks, ["r1", "r2"]).select(
            "doc_id",
            "len",
            "pos",
            (F.col("rank") * _NS + rounds).alias("rank"),
        )
        k *= 2
    s = active if resolved is None else active.unionByName(resolved)
    return s.localCheckpoint(eager=True), k, rounds


def substring_buckets(
    docs: DataFrame,
    min_match_chars: int,
    k0: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rank-mode buckets → (doc_id, band_idx=0, band_key) — one row per
    (doc, exact L-char prefix class), ready for ``candidate_pairs``."""
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

    # carry the exact class pair on the two bucket-key columns (like hash
    # mode's h1/h2) — collapsing it through one 64-bit xxhash64 would
    # reintroduce the birthday-bound false buckets this mode exists to avoid
    return combined.select(
        "doc_id",
        F.col("rank_a").alias("band_idx"),
        F.col("rank_b").alias("band_key"),
    ).distinct()


def _make_lgram_udf(lgram: int, with_prev: bool = False):
    """text → struct(h1: array<long>, h2: array<long>[, pv, hp]): the
    distinct 128-bit double-Karp-Rabin L-gram keys (aligned arrays).
    ``with_prev`` adds the 64-bit previous-position key mix (``pv``) and its
    validity flag (``hp`` — False for a gram first occurring at pos 0)."""
    fields = [
        T.StructField("h1", T.ArrayType(T.LongType())),
        T.StructField("h2", T.ArrayType(T.LongType())),
    ]
    if with_prev:
        fields += [
            T.StructField("pv", T.ArrayType(T.LongType())),
            T.StructField("hp", T.ArrayType(T.BooleanType())),
        ]

    @pandas_udf(T.StructType(fields))
    def lgram_keys(texts: pd.Series) -> pd.DataFrame:
        cols = {f.name: [] for f in fields}
        for t in texts:
            if with_prev:
                h1, h2, pv, hp = K.lgram_hashes128_prev(t or "", lgram)
                cols["pv"].append(np.ascontiguousarray(pv).view(np.int64))
                cols["hp"].append(hp)
            else:
                h1, h2 = K.lgram_hashes128(t or "", lgram)
            # hand Arrow the numpy buffers directly (no Python-int lists)
            cols["h1"].append(np.ascontiguousarray(h1).view(np.int64))
            cols["h2"].append(np.ascontiguousarray(h2).view(np.int64))
        return pd.DataFrame(cols)

    return lgram_keys


def substring_buckets_lgram(
    docs: DataFrame,
    min_match_chars: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_prev: bool = False,
) -> DataFrame:
    """Hash-mode buckets → (doc_id, band_idx=h1, band_key=h2[, prev]): one
    row per distinct L-gram per doc. The two hash halves ride the two
    bucket-key columns, so candidate_pairs groups on the full 128-bit key.
    ``with_prev`` adds the nullable left-extension key (``prev``) consumed
    by candidate_pairs' ``group_col`` pair suppression."""
    udf = _make_lgram_udf(min_match_chars, with_prev=with_prev)
    z = docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("g")
    )
    if not with_prev:
        return z.select(
            "doc_id", F.explode(F.arrays_zip("g.h1", "g.h2")).alias("p")
        ).select(
            "doc_id",
            F.col("p.h1").alias("band_idx"),
            F.col("p.h2").alias("band_key"),
        )
    return z.select(
        "doc_id", F.explode(F.arrays_zip("g.h1", "g.h2", "g.pv", "g.hp")).alias("p")
    ).select(
        "doc_id",
        F.col("p.h1").alias("band_idx"),
        F.col("p.h2").alias("band_key"),
        F.when(F.col("p.hp"), F.col("p.pv")).alias("prev"),
    )


def substring_edges_suffix_array(
    docs: DataFrame,
    min_match_chars: int,
    bucket_cap: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "hash",
    cache_bands: bool = False,
    collapse_exact: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """→ (edges(src, dst, sim=1.0), bucket_stats): doc pairs sharing an
    exact >= min_match_chars-char substring. ``mode="hash"`` (default) is
    the one-pass 128-bit L-gram path; ``mode="rank"`` is the hash-free
    prefix-doubling path (both validated against the same LCS oracle in
    tests/test_suffix_array.py). ``cache_bands`` persists the band table —
    the band pass is the expensive one and both returned DataFrames consume
    it, so callers that act on both (e.g. the pipeline's stats + edges
    jobs) should pass True.

    ``collapse_exact`` (default True — VERDICT r3 next-round #4, the 100x
    posture lever): byte-identical docs are collapsed to their min-id
    representative BEFORE position explosion, so an exact-dup group of n
    docs contributes its L-gram rows ONCE instead of n times — on
    Common-Crawl-style corpora (majority exact-dup) this deletes most of
    the all-positions row count, the structural cost of exact >=L
    semantics. Connected-component parity is exact: x,y share an L-gram
    iff their reps do (identical texts have identical gram sets), and each
    dropped member is re-attached by a rep→member identity edge — emitted
    ONLY for groups whose text length >= L, because two identical docs
    shorter than L share no L-gram and stay singletons in the uncollapsed
    semantics too. Callers whose input is already exact-deduped (the
    pipeline with the exact detector enabled) should pass False to skip
    the one extra corpus shuffle."""
    from deduplication_framework_spark.operators.lsh import candidate_pairs

    ident = None
    if collapse_exact:
        # md5 (128-bit) group key: a 64-bit text hash has a real birthday
        # collision expectation at 10^10+ distinct docs (a collision would
        # silently drop one doc's band rows and weld it to an unrelated
        # cluster) — 128 bits matches the module's gram-key risk budget
        w = Window.partitionBy("_th").orderBy(id_col)
        ranked = (
            docs.select(id_col, text_col)
            .withColumn("_th", F.md5(F.col(text_col)))
            .withColumn("_rep", F.first(id_col).over(w))
            .withColumn("_rn", F.row_number().over(w))
            .persist()
        )
        # two consumers (rep docs → band UDF; identity edges) land in ONE
        # downstream job as concurrent shuffle-map stages that race to
        # fill the cache, each recomputing the hash window (the CLAUDE.md
        # persist-race rule) — one eager count() turns the race into one
        # compute + cache reads
        ranked.count()
        docs = ranked.filter(F.col("_rn") == 1).select(id_col, text_col)
        ident = (
            ranked.filter(
                (F.col("_rn") > 1)
                & (F.length(text_col) >= min_match_chars)
            )
            .select(
                F.col("_rep").alias("src"),
                F.col(id_col).alias("dst"),
                F.lit(1.0).alias("sim"),
            )
        )

    group_col = None
    if mode == "hash":
        bands = substring_buckets_lgram(
            docs, min_match_chars, id_col=id_col, text_col=text_col,
            with_prev=True,
        )
        group_col = "prev"
    elif mode == "rank":
        bands = substring_buckets(
            docs, min_match_chars, id_col=id_col, text_col=text_col
        )
    else:
        raise ValueError(f"unknown substring mode {mode!r}")
    if cache_bands:
        bands = bands.persist()
    pairs, stats = candidate_pairs(
        bands, bucket_cap=bucket_cap, group_col=group_col
    )
    edges = pairs.select("src", "dst", F.lit(1.0).alias("sim"))
    if ident is not None:
        edges = edges.unionByName(ident)
    return edges, stats
