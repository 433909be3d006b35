"""Per-document distinctive-term extraction (TF-IDF keyword ranking).

The classic training-data / corpus-exploration op the reference's stats
layer stops short of (reference analog: the per-category token tallies in
``text/method/classification_comparison.py`` aggregate corpus-wide; this
operator ranks WITHIN each document against the corpus): build the
doc-term matrix, join document frequency, and keep each document's top-k
most distinctive terms.

Scoring is **ratio-damped TF-IDF**: ``score = tf / df`` (term frequency
over document frequency). The deliberate choice of a ratio instead of
the textbook ``tf * (ln(N/df)+1)``: IEEE-754 requires division of two
exactly-representable int64s (< 2^53) to be CORRECTLY ROUNDED, so the
double ``tf/df`` is bit-identical in every engine (Spark JVM, DuckDB,
numpy) and the ranking is engine-exact — whereas ``ln`` carries no
correct-rounding guarantee (JVM Math.log vs libm may differ in the last
ulp) and would make cross-engine ordering unverifiable. Both rankings
are monotone in tf for fixed df and anti-monotone in df for fixed tf;
callers who want log damping can recompute it from the returned integer
``(tf, df)`` columns — the ranking here is the part that must be
deterministic.

Scale shape (100 TB posture):
- tokenize + explode rides the scan; ``tf`` is a map-side-combinable
  groupBy on (doc, term) — within-doc repeats collapse before the
  shuffle, so the shuffled row count is the doc-term matrix, not the
  token stream;
- ``df`` is a second map-side-combinable count over the (already
  deduplicated) matrix, vocab-sized output;
- the tf⋈df join is hinted SHUFFLE_HASH with the one-row-per-term df
  side as build: hot terms (stopwords) fan out on the probe side only,
  so no sort-merge skew and no broadcast of a possibly-1e9-row vocab
  (same lesson as the LM bigram-terms join, operators/lm.py);
- top-k is a row_number window PARTITIONED by document — never a
  global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deduplication_framework_spark.functions.quality import _WS_SPARK


def tfidf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_tf: int = 1,
) -> DataFrame:
    """Top-k distinctive terms per document, ranked by tf/df.

    Returns ``(id_col, rank, term, tf, df, score_ppm)`` with
    ``rank`` 1..k per document ordered by (tf/df DESC, tf DESC,
    term ASC) — fully deterministic — and ``score_ppm`` =
    ``round(1e6 * tf / df)`` as an integer score (the double is
    engine-identical, so its rounding is too).

    ``min_tf`` drops (doc, term) cells with fewer than that many
    occurrences BEFORE document frequency is counted — df then means
    "documents where the term clears min_tf", and the dropped cells
    never reach the join (a cheap noise filter; 1 keeps everything).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_tf < 1:
        raise ValueError(f"min_tf must be >= 1, got {min_tf}")
    terms = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.expr(f"split(lower(trim({text_col})), '{_WS_SPARK}')")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if min_tf > 1:
        tf = tf.filter(F.col("tf") >= min_tf)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # df is 1 row per term: SHUFFLE_HASH with df as build side keeps hot
    # (stopword) terms skew-safe — fan-out happens on the streamed side.
    joined = tf.join(df.hint("SHUFFLE_HASH"), "term")
    score = F.col("tf").cast("double") / F.col("df").cast("double")
    wnd = Window.partitionBy(id_col).orderBy(
        score.desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "term",
            "tf",
            "df",
            # parenthesization matters cross-engine: (1e6*tf)/df and
            # 1e6*(tf/df) are each correctly rounded but can differ in
            # the last ulp — the oracle must use this exact op order
            F.expr(
                "CAST(round(1e6 * (CAST(tf AS DOUBLE) / CAST(df AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("score_ppm"),
        )
    )
