"""CCNet-style bigram LM scoring + perplexity bucketing (operators/lm.py):
hand-computed spec check, DuckDB oracle parity, bucketing semantics
(exact ntile + approx-percentile scale path), and the per-SF ln-rounding
margin precondition the driver oracle relies on."""

import math
from collections import Counter

import duckdb
import pytest

from deduplication_framework_spark.operators.lm import (
    bucket_lm_scores,
    lm_oracle_sql,
    lm_score_docs,
)
from deduplication_framework_spark.operators.lsh import (
    release_census_caches,
)

TEXTS = [
    "a a b",
    "a b b",
    "c",
    "the cat sat",
    "the cat ran",  # ties with doc 3 on every bigram count
    "b b b b",
    "  ",  # whitespace-only: must emit no row
    "a",  # single token: first-token term only
    "A  a\x0bB",  # case folding + explicit whitespace class
]


def _hand_scores():
    docs = {
        i: t.strip().lower().split()
        for i, t in enumerate(TEXTS)
        if t.strip()
    }
    uni = Counter(w for t in docs.values() for w in t)
    tt, vv = sum(uni.values()), len(uni)
    bi = Counter(
        (t[i], t[i + 1]) for t in docs.values() for i in range(len(t) - 1)
    )

    def micro(m):
        return round(math.log(m) * 1e6)

    out = {}
    for i, t in docs.items():
        s = micro(uni[t[0]] + 1) - micro(tt + vv)
        for a, b in zip(t, t[1:]):
            s += micro(bi[(a, b)] + 1) - micro(uni[a] + vv)
        out[i] = (s, len(t))
    return out


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    # approx=False: these tests pin the exact-ntile ORACLE semantics;
    # the production default is the map-side approx path
    rows = (
        bucket_lm_scores(lm_score_docs(df), approx=False)
        .orderBy("doc_id")
        .collect()
    )
    release_census_caches()
    return rows


def test_scores_match_hand_computed_spec(scored):
    hand = _hand_scores()
    assert {r.doc_id for r in scored} == set(hand)  # whitespace doc gone
    for r in scored:
        assert (r.logp_micro, r.n_tokens) == hand[r.doc_id], r.doc_id


def test_duckdb_oracle_parity_including_buckets(scored):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", list(enumerate(TEXTS)))
    dd = con.execute(
        lm_oracle_sql(table="t", id_col="doc_id", text_col="text")
        + " ORDER BY doc_id"
    ).fetchall()
    got = [
        (r.doc_id, r.n_tokens, r.logp_micro, round(r.avg_logp, 6), r.bucket)
        for r in scored
    ]
    assert [tuple(r) for r in dd] == got


def test_bucket_assignment_is_rank_derived_and_deterministic(scored):
    by_id = {r.doc_id: r for r in scored}
    # docs 3 and 4 are exact score ties: ntile may split a tie across a
    # tile boundary, but the (avg DESC, doc_id ASC) tie-break makes the
    # split deterministic — re-derive every bucket from the rank order
    assert by_id[3].logp_micro == by_id[4].logp_micro
    order = sorted(scored, key=lambda r: (-r.avg_logp, r.doc_id))
    n = len(order)
    sizes = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
    want = (
        ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
    )
    assert [r.bucket for r in order] == want
    assert Counter(r.bucket for r in scored) == {
        "head": 3,
        "middle": 3,
        "tail": 2,
    }


def test_approx_bucketing_orders_and_covers(spark):
    # 90 docs across 30 graded score levels (more common tokens -> higher
    # avg logp): the percentile-cutoff path must respect score order and
    # produce roughly even buckets without a global sort. Levels are
    # GRADED, not 3 flat classes — a >= cut at a heavy mass point would
    # legitimately absorb the whole class into the upper bucket.
    texts = [
        " ".join(["the"] * (i % 30 + 1) + ["zz%d" % i]) for i in range(90)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = bucket_lm_scores(lm_score_docs(df), approx=True).collect()
    release_census_caches()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.avg_logp)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    assert all(len(v) >= 20 for v in by_bucket.values())


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_ln_micro_rounding_margins(sf_dir):
    """Every integer m whose ln() the two engines round independently
    must sit far from a micro-unit rounding boundary: cross-engine libm
    drift is ~1.5 ulp of ln(m) (~5e-9 micro-units here); demand 1e-5."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{sf_dir}/documents.parquet')"
    )
    args = con.execute(
        r"""
        WITH base AS (
            SELECT string_split_regex(lower(trim(text)),
                                      '[ \t\n\r\f\x0B]+') AS t
            FROM documents WHERE length(trim(text)) > 0
        ), uni AS (
            SELECT w, count(*) AS c
            FROM (SELECT unnest(t) AS w FROM base) GROUP BY w
        ), consts AS (
            SELECT CAST(sum(c) AS BIGINT) AS tt, count(*) AS vv FROM uni
        ), pairs AS (
            SELECT unnest(list_transform(range(0, len(t) - 1),
                          i -> {'w1': t[i + 1], 'w2': t[i + 2]}),
                          recursive := true)
            FROM base
        ), bic AS (
            SELECT count(*) AS c12 FROM pairs GROUP BY w1, w2
        )
        SELECT DISTINCT m FROM (
            SELECT c + 1 AS m FROM uni
            UNION SELECT c + (SELECT vv FROM consts) FROM uni
            UNION SELECT c12 + 1 FROM bic
            UNION SELECT tt + vv FROM consts
        )
        """
    ).fetchall()
    assert len(args) > 20  # sanity: the arg inventory actually populated
    worst = min(
        abs((math.log(m) * 1e6) % 1.0 - 0.5) for (m,) in args
    )
    assert worst > 1e-5, f"ln micro-rounding margin too thin: {worst}"


def test_hash64_key_mode_matches_raw_spec(spark, scored):
    # the default long-key spine must produce IDENTICAL scores to the
    # raw-string spec mode (no 64-bit vocab collisions here, and the
    # per-SF precondition is pinned below)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    raw = (
        lm_score_docs(df, key_mode="raw").orderBy("doc_id").collect()
    )
    release_census_caches()
    assert [(r.doc_id, r.n_tokens, r.logp_micro) for r in raw] == [
        (r.doc_id, r.n_tokens, r.logp_micro) for r in scored
    ]


def test_key_mode_rejects_unknown(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="key_mode"):
        lm_score_docs(df, key_mode="bogus")


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_no_xxhash64_vocab_collisions_in_testdata(spark, sf):
    # precondition the driver-gate parity relies on: hashing the
    # testdata vocabulary to 64 bits is injective, so hash64-mode
    # counts equal raw-mode counts equal the DuckDB oracle's
    from pyspark.sql import functions as F

    toks = (
        spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        .select(
            F.explode(
                F.expr("split(lower(trim(text)), '\\\\s+')")
            ).alias("w")
        )
        .filter("w <> ''")
    )
    n = toks.select("w").distinct().count()
    nh = toks.select(F.xxhash64("w").alias("h")).distinct().count()
    assert n == nh


def test_empty_corpus_scoring_and_bucketing(spark):
    df = spark.createDataFrame([(1, "   ")], ["doc_id", "text"])
    scored = lm_score_docs(df)
    assert scored.count() == 0
    b = bucket_lm_scores(scored, approx=True)
    assert b.count() == 0
    assert "bucket" in b.columns and "avg_logp" in b.columns
    release_census_caches()
