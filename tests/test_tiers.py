"""Tiered (cascade) dedup with per-tier attribution (operators/tiers.py)."""

import pytest
from pyspark.sql import functions as F

from deduplication_framework_spark.operators.lsh import release_census_caches
from deduplication_framework_spark.operators.tiers import (
    keeper_assign,
    tiered_dedup,
)

# (doc_id, text, url, nk) — exact tier keys text, url tier keys url,
# near tier keys nk. Designed so: 2 is an exact dup of 1; 3 survives
# exact but shares 1's url; 5 and 7 survive both and share 4's near key;
# 8 shares 7's url, and its keeper (7) is itself removed by the LATER
# near tier — the within-tier-attribution case.
DOCS = [
    (1, "A", "u1", "z"),
    (2, "A", "u2", "z"),
    (3, "B", "u1", "y2"),
    (4, "C", "u3", "x"),
    (5, "D", "u4", "x"),
    (6, "E", "u5", "y"),
    (7, "F", "u6", "x"),
    (8, "G", "u6", "w"),
]

EXPECTED = {
    1: ("kept", 1),
    2: ("exact", 1),
    3: ("url", 1),
    4: ("kept", 4),
    5: ("near", 4),
    6: ("kept", 6),
    7: ("near", 4),
    8: ("url", 7),
}


def _py_cascade(docs, keys):
    """Independent sequential reference: same first-tier-wins semantics."""
    out = {}
    surv = list(docs)
    for name, key in keys:
        keeper = {}
        for row in surv:
            keeper.setdefault(key(row), row[0])
        nxt = []
        for row in surv:
            k = keeper[key(row)]
            if k != row[0]:
                out[row[0]] = (name, k)
            else:
                nxt.append(row)
        surv = nxt
    for row in surv:
        out[row[0]] = ("kept", row[0])
    return out


def _tiers():
    return [
        ("exact", lambda s: keeper_assign(s, F.col("text"))),
        ("url", lambda s: keeper_assign(s, F.col("url"))),
        ("near", lambda s: keeper_assign(s, F.col("nk"))),
    ]


def test_cascade_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "url", "nk"])
    att, stats = tiered_dedup(df, _tiers())
    got = {r.doc_id: (r.tier, r.keeper_id) for r in att.collect()}
    assert got == EXPECTED
    assert got == _py_cascade(
        DOCS, [("exact", lambda r: r[1]), ("url", lambda r: r[2]),
               ("near", lambda r: r[3])]
    )
    assert stats == {"exact": 1, "url": 2, "near": 2, "kept": 3}
    release_census_caches()


def test_first_tier_wins_and_each_doc_once(spark):
    # docs 1/2 share text AND url AND nk: only the first tier claims them
    df = spark.createDataFrame(
        [(1, "A", "u", "k"), (2, "A", "u", "k"), (3, "B", "v", "j")],
        ["doc_id", "text", "url", "nk"],
    )
    att, stats = tiered_dedup(df, _tiers())
    rows = att.collect()
    assert len(rows) == 3
    assert sorted(r.doc_id for r in rows) == [1, 2, 3]
    got = {r.doc_id: (r.tier, r.keeper_id) for r in rows}
    assert got[2] == ("exact", 1)
    assert stats == {"exact": 1, "url": 0, "near": 0, "kept": 2}
    release_census_caches()


def test_within_tier_keeper_may_be_removed_later(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "url", "nk"])
    att, _ = tiered_dedup(df, _tiers())
    got = {r.doc_id: (r.tier, r.keeper_id) for r in att.collect()}
    # 8's url keeper is 7, and 7 itself fell to the near tier
    assert got[8] == ("url", 7)
    assert got[7] == ("near", 4)
    release_census_caches()


def test_bad_tier_row_count_raises(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "url", "nk"])

    def dropping(s):
        # loses rows: every non-keeper vanishes instead of being assigned
        # (nk has real groups among the exact-tier survivors)
        a = keeper_assign(s, F.col("nk"))
        return a.filter(F.col("doc_id") == F.col("keeper_id"))

    with pytest.raises(ValueError, match="returned"):
        tiered_dedup(
            df,
            [("exact", lambda s: keeper_assign(s, F.col("text"))),
             ("bad", dropping),
             ("near", lambda s: keeper_assign(s, F.col("nk")))],
        )
    release_census_caches()


def test_duplicate_or_reserved_tier_names_raise(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "url", "nk"])
    fn = lambda s: keeper_assign(s, F.col("text"))  # noqa: E731
    with pytest.raises(ValueError, match="unique"):
        tiered_dedup(df, [("a", fn), ("a", fn)])
    with pytest.raises(ValueError, match="unique"):
        tiered_dedup(df, [("kept", fn)])


def test_keeper_assign_no_window_map_side_agg(spark):
    """Plan pin: the keeper pick is a partial-aggregating groupBy + join,
    never a window — a mega-group must not straggle one task."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "url", "nk"])
    a = keeper_assign(df, F.col("text"))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "partial_first" in plan
    got = {r.doc_id: r.keeper_id for r in a.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8}


def test_null_key_rows_survive_the_tier(spark):
    """Review-finding regression: md5(NULL) = NULL makes a NULL-key
    group; the keeper join must be null-safe or those rows silently
    vanish from the tier (breaking one-row-per-input)."""
    df = spark.createDataFrame(
        [(1, "A"), (2, None), (3, None), (4, "A")], ["doc_id", "text"]
    )
    att, stats = tiered_dedup(
        df, [("exact", lambda s: keeper_assign(s, F.md5("text")))]
    )
    got = {r.doc_id: (r.tier, r.keeper_id) for r in att.collect()}
    assert got == {
        1: ("kept", 1),
        2: ("kept", 2),
        3: ("exact", 2),
        4: ("exact", 1),
    }
    assert stats == {"exact": 2, "kept": 2}
    release_census_caches()


def test_first_tier_contract_checked(spark):
    """Review-finding regression: a row-dropping tier must raise even
    when it is the FIRST tier (the check used to start at tier 2)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "url", "nk"])

    def dropping(s):
        a = keeper_assign(s, F.col("nk"))
        return a.filter(F.col("doc_id") == F.col("keeper_id"))

    with pytest.raises(ValueError, match="returned"):
        tiered_dedup(df, [("bad", dropping)])
    release_census_caches()
