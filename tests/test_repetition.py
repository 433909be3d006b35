"""Intra-doc repetition signals (functions/repetition.py): hand-computed
spec cases, expression/UDF/DuckDB three-way parity, and the guard edges
(short docs, empty text, vertical-tab tokenization)."""

import duckdb
import pytest

from deduplication_framework_spark.functions.repetition import (
    DUP_NS,
    TOP_NS,
    make_repetition_udf,
    repetition_frac_expr,
    repetition_frac_sql,
    repetition_mass_exprs,
    repetition_mass_sqls,
    repetition_oracle_sql,
    with_repetition_masses,
)

TEXTS = [
    # top-2 'the cat' (2 * 7 = 14); no 5-gram repeats
    "the cat sat on the mat the cat sat again",
    # 12 alternating tokens: every gram duplicated at every n
    "a b a b a b a b a b a b",
    # all distinct: top mass = single occurrence mass, dup = 0
    "one two three four five six seven eight nine ten",
    "x",  # < n tokens at every n
    "",  # empty
    "repeat this phrase now repeat this phrase now repeat this phrase now",
    # vertical tab must split tokens identically on all three paths
    "w1 w2\x0bw3 w4 w5 w1 w2 w3 w4 w5",
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", list(enumerate(TEXTS)))
    return df, con


def test_spec_values_by_hand(frames):
    df, _ = frames
    ex = repetition_mass_exprs("text")
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in ex.items()]
        ).collect()
    }
    # 'the cat' x2, len 7
    assert rows[0].top_2gram_mass == 2 * len("the cat")
    # 'a b' appears 6x in 12 alternating tokens
    assert rows[1].top_2gram_mass == 6 * len("a b")
    # all 8 distinct 5-grams of doc 1 are 'a b a b a'/'b a b a b' x4 each:
    # 2 distinct grams, count 4, len 9 -> 2 * 4 * 9 = 72
    assert rows[1].dup_5gram_mass == 72
    assert rows[2].dup_5gram_mass == 0
    # single occurrences still carry top mass (count 1)
    assert rows[2].top_2gram_mass == max(
        len(a) + 1 + len(b)
        for a, b in zip(
            "one two three four five six seven eight nine".split(),
            "two three four five six seven eight nine ten".split(),
        )
    )
    for short in (3, 4):
        assert all(
            getattr(rows[short], f"top_{n}gram_mass") == 0 for n in TOP_NS
        )
        assert all(
            getattr(rows[short], f"dup_{n}gram_mass") == 0 for n in DUP_NS
        )
    # 'repeat this phrase now' x3 -> at n=4 top mass 3 * 22
    assert rows[5].top_4gram_mass == 3 * len("repeat this phrase now")


def test_three_way_parity(frames):
    df, con = frames
    ex = repetition_mass_exprs("text")
    keys = sorted(ex)
    spark_rows = [
        tuple(r)
        for r in df.select(
            "doc_id", *[ex[k].alias(k) for k in keys]
        )
        .orderBy("doc_id")
        .collect()
    ]
    sq = repetition_mass_sqls("text")
    duck_rows = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{sq[k]} AS {k}" for k in keys)
        + " FROM t ORDER BY doc_id"
    ).fetchall()
    assert spark_rows == [tuple(r) for r in duck_rows]

    udf = make_repetition_udf()
    udf_rows = [
        tuple(r)
        for r in df.select("doc_id", udf("text").alias("m"))
        .select("doc_id", *[f"m.{k}" for k in keys])
        .orderBy("doc_id")
        .collect()
    ]
    assert udf_rows == spark_rows


def test_staged_masses_equal_spec_templates(frames):
    """The fast staged-column path (what the gate query runs) must equal
    the single-expression spec templates on Spark."""
    df, _ = frames
    ex = repetition_mass_exprs("text")
    keys = sorted(ex)
    spec = [
        tuple(r)
        for r in df.select("doc_id", *[ex[k].alias(k) for k in keys])
        .orderBy("doc_id")
        .collect()
    ]
    staged = [
        tuple(r)
        for r in with_repetition_masses(df, "text")
        .select("doc_id", *keys)
        .orderBy("doc_id")
        .collect()
    ]
    assert staged == spec


def test_relational_oracle_equals_spec_templates(frames):
    """The fast unnest/GROUP BY oracle (what the driver gate runs) must
    produce exactly the per-row lambda spec's masses and fractions."""
    _, con = frames
    sq = repetition_mass_sqls("text")
    keys = sorted(sq)
    spec = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{sq[k]} AS {k}" for k in keys)
        + f", round({repetition_frac_sql('text', 2, 'top')}, 6)"
        + f", round({repetition_frac_sql('text', 5, 'dup')}, 6)"
        + " FROM t ORDER BY doc_id"
    ).fetchall()
    staged = con.execute(
        repetition_oracle_sql(table="t", id_col="doc_id", text_sql="text")
        + " ORDER BY doc_id"
    ).df()
    got = [
        (
            r.doc_id,
            *[int(getattr(r, k)) for k in keys],
            float(r.top_2gram_frac),
            float(r.dup_5gram_frac),
        )
        for r in staged.itertuples()
    ]
    assert got == [tuple(r) for r in spec]


def test_frac_parity_and_zero_guard(frames):
    df, con = frames
    got = [
        r.f
        for r in df.select(
            "doc_id", repetition_frac_expr("text", 2, "top").alias("f")
        )
        .orderBy("doc_id")
        .collect()
    ]
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {repetition_frac_sql('text', 2, 'top')} "
            "FROM t ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want
    assert got[4] == 0.0  # empty text: guarded, no division error
    assert 0.0 <= min(got) and max(got) <= 1.0
