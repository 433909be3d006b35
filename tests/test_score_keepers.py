"""Keep-priority (scored) keeper selection (operators/cluster.py)."""

from pyspark.sql import functions as F

from deduplication_framework_spark.operators.cluster import score_keepers


def _members(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "cluster_id", "score"])


def test_highest_score_wins_ties_to_min_id(spark):
    rows = [
        (1, 1, 10), (2, 1, 30), (3, 1, 30),   # tie at 30 -> doc 2
        (7, 7, 5),                             # singleton keeps itself
        (8, 8, 0), (9, 8, -1),                 # negative scores fine
    ]
    out = {
        r.cluster_id: (r.keeper_id, r.keeper_score)
        for r in score_keepers(_members(spark, rows), "score").collect()
    }
    assert out == {1: (2, 30), 7: (7, 5), 8: (8, 0)}


def test_null_scores_lose_all_null_cluster_keeps_min_id(spark):
    rows = [
        (1, 1, None), (2, 1, 3),          # real score beats NULL
        (5, 5, None), (6, 5, None),       # all-NULL -> min id, NULL score
    ]
    out = {
        r.cluster_id: (r.keeper_id, r.keeper_score)
        for r in score_keepers(_members(spark, rows), "score").collect()
    }
    assert out == {1: (2, 3), 5: (5, None)}


def test_stable_across_partitionings(spark):
    rows = [(i, i % 3, (i * 7) % 11) for i in range(30)]
    base = sorted(
        score_keepers(_members(spark, rows), "score").collect(),
        key=lambda r: r.cluster_id,
    )
    for n in (1, 4, 16):
        again = sorted(
            score_keepers(
                _members(spark, rows).repartition(n), "score"
            ).collect(),
            key=lambda r: r.cluster_id,
        )
        assert again == base


def test_matches_window_rank_oracle(spark):
    rows = [(i, (i * 13) % 5, (i * i) % 17) for i in range(100)]
    m = _members(spark, rows)
    got = {
        r.cluster_id: r.keeper_id
        for r in score_keepers(m, "score").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    oracle = {
        r.cluster_id: r.doc_id
        for r in m.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == oracle


def test_plan_partial_aggregates_before_exchange(spark):
    """The scale reason this is an aggregation, not a window: partial
    min-of-struct must run map-side (HashAggregate below the Exchange)."""
    m = _members(spark, [(i, i % 4, i) for i in range(40)])
    plan = (
        score_keepers(m, "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    before_exchange = plan.split("Exchange", 1)[0]
    assert "partial_min" in plan or "HashAggregate" in before_exchange
