"""Stopword-profile language ID: accuracy on real multilingual snippets
(the synthetic driver corpus is English-ish regardless of its lang label,
so the driver query pins MACHINERY parity while these pin BEHAVIOR)."""

from pyspark.sql import functions as F

from deduplication_framework_spark.functions.langid import (
    PROFILES,
    lang_id_expr,
    profile_hits_expr,
    tokens_expr,
)

SNIPPETS = [
    # (text, expected)
    ("The cat sat on the mat and it was pleased with the sun.", "en"),
    ("Der Hund und die Katze sind nicht mit dem Zug gefahren.", "de"),
    ("Le chat est dans le jardin avec les enfants pour une heure.", "fr"),
    ("Los perros corren por el parque con una pelota, pero despacio.", "es"),
    ("zxqv blorp 12345 !!!", "und"),  # no profile hits -> undetermined
    ("", "und"),
]


def _preds(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "_toks", tokens_expr(F.col("text"))
    )
    out = df.select(
        "doc_id", lang_id_expr(F.col("_toks")).alias("pred")
    ).collect()
    return {r.doc_id: r.pred for r in out}


def test_real_language_snippets(spark):
    rows = [(i, t) for i, (t, _) in enumerate(SNIPPETS)]
    preds = _preds(spark, rows)
    for i, (_, want) in enumerate(SNIPPETS):
        assert preds[i] == want, f"snippet {i}: {preds[i]} != {want}"


def test_tie_breaks_alphabetically(spark):
    # one hit each for de and en -> tie -> alphabetically first ("de")
    preds = _preds(spark, [(0, "der the")])
    assert preds[0] == "de"


def test_multiplicity_counts(spark):
    # 3x "que" (fr+es shared) + 1x "avec" (fr only): fr wins 4-3 only
    # because hits count WITH multiplicity; set semantics would tie 2-2
    # and fall to the tie-break
    preds = _preds(spark, [(0, "que que que avec")])
    assert preds[0] == "fr"
    d = (
        spark.createDataFrame([(0, "que que que avec")], ["doc_id", "text"])
        .withColumn("_toks", tokens_expr(F.col("text")))
        .select(profile_hits_expr(F.col("_toks"), PROFILES["fr"]).alias("s"))
        .collect()
    )
    assert d[0].s == 4


def test_sql_fragments_match_spark(spark):
    """The generated DuckDB fragments classify the snippet set identically
    (this is the lockstep the driver oracle relies on)."""
    import duckdb

    from deduplication_framework_spark.functions.langid import lang_id_sql

    frags = lang_id_sql()
    langs = sorted(PROFILES)
    score_cols = ", ".join(f"{frags['scores'][l]} AS s_{l}" for l in langs)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE snippets AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t.replace(chr(39), chr(39) * 2)}')"
            for i, (t, _) in enumerate(SNIPPETS)
        )
        + ") v(doc_id, text)"
    )
    got = con.execute(
        f"""
        WITH t AS (SELECT doc_id, {frags['toks']} AS toks FROM snippets),
             s AS (SELECT doc_id, {score_cols} FROM t)
        SELECT doc_id, {frags['pred']} AS pred FROM s ORDER BY doc_id
        """
    ).fetchall()
    spark_preds = _preds(
        spark, [(i, t) for i, (t, _) in enumerate(SNIPPETS)]
    )
    for doc_id, pred in got:
        assert pred == spark_preds[doc_id], (doc_id, pred, spark_preds[doc_id])
