"""Deterministic per-stratum hash sampling (sources/loaders.py::
stratified_sample) and its generated DuckDB twin."""

import duckdb
import pytest

from deduplication_framework_spark.sources.loaders import (
    _rate_hex_threshold,
    stratified_sample,
    stratified_sample_sql,
)

RATES = {"a": 0.5, "b": 0.1, "c": 1.0}


def _frame(spark, n=3000):
    rows = [(i, ["a", "b", "c", "zzz"][i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "source"]), rows


def test_deterministic_and_default_rate_zero(spark):
    df, rows = _frame(spark)
    s1 = stratified_sample(df, RATES, salt="t")
    s2 = stratified_sample(df, RATES, salt="t")
    got1 = sorted(r.doc_id for r in s1.collect())
    assert got1 == sorted(r.doc_id for r in s2.collect())
    # default_rate=0: the unknown stratum 'zzz' is dropped entirely
    assert s1.filter("source = 'zzz'").count() == 0
    # rate 1.0 keeps every row of its stratum
    assert s1.filter("source = 'c'").count() == 750
    # hash-threshold rates land near the target (fixed, not stochastic —
    # md5 is just well-mixed; 750 trials at 0.5 / 0.1)
    n_a = s1.filter("source = 'a'").count()
    n_b = s1.filter("source = 'b'").count()
    assert 300 <= n_a <= 450, n_a
    assert 40 <= n_b <= 115, n_b


def test_duckdb_twin_bit_identity(spark):
    df, rows = _frame(spark, 1200)
    got = sorted(
        (r.doc_id, r.source, r.sample_bucket)
        for r in stratified_sample(
            df, RATES, salt="t", default_rate=0.25
        ).collect()
    )
    bucket, pred = stratified_sample_sql(RATES, salt="t", default_rate=0.25)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, source VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    oracle = con.execute(
        f"SELECT doc_id, source, {bucket} AS b FROM docs WHERE "
        + pred.replace("documents", "docs")
        + " ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(r) for r in oracle]
    # non-trivial on both sides
    assert len(got) > 100


def test_sample_is_growth_stable(spark):
    """A row's decision depends only on its own id: the sample over a
    prefix equals the prefix of the sample over the full corpus."""
    df_big, _ = _frame(spark, 2000)
    df_small, _ = _frame(spark, 500)
    big = {
        r.doc_id
        for r in stratified_sample(df_big, RATES, salt="t").collect()
    }
    small = {
        r.doc_id
        for r in stratified_sample(df_small, RATES, salt="t").collect()
    }
    assert small == {i for i in big if i < 500}


def test_bad_rate_raises():
    with pytest.raises(ValueError, match="rate"):
        _rate_hex_threshold(1.5)
    with pytest.raises(ValueError, match="rate"):
        _rate_hex_threshold(-0.1)


def test_threshold_edges():
    assert _rate_hex_threshold(0.0) == "00000000"
    # rate 1.0 must keep everything: every hex bucket compares below 'g'
    assert _rate_hex_threshold(1.0) == "g"
    assert "ffffffff" < _rate_hex_threshold(1.0)
    assert _rate_hex_threshold(0.5) == "80000000"


def test_quoted_stratum_and_salt_generate_valid_sql(spark):
    """Review-finding regression: stratum names / salt are data — an
    embedded quote must not break (or skew) the generated DuckDB twin."""
    rates = {"o'reilly": 0.5, "b": 1.0}
    rows = [(i, "o'reilly" if i % 2 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = sorted(
        (r.doc_id, r.source)
        for r in stratified_sample(df, rates, salt="s'alt")
        .select("doc_id", "source")
        .collect()
    )
    bucket, pred = stratified_sample_sql(rates, salt="s'alt")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    oracle = con.execute(
        f"SELECT doc_id, source FROM docs WHERE {pred} ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(r) for r in oracle]
    assert 200 < len(got) < 400  # all of b, about half of o'reilly
