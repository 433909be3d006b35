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


class TestSoftDedupWeights:
    def test_integer_weights_over_any_labeling(self, spark):
        from deduplication_framework_spark.operators.cluster import (
            soft_dedup_weights,
        )

        rows = [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c"),
                (6, "d"), (7, "d"), (8, "d"), (9, "d"), (10, "d"), (11, "d"),
                (12, "d")]
        df = spark.createDataFrame(rows, "doc_id long, cluster_id string")
        got = {r.doc_id: (r.cluster_size, r.weight_ppm)
               for r in soft_dedup_weights(df).collect()}
        assert len(got) == len(rows)  # nothing dropped — the point
        assert got[0] == (3, 333333)       # 1e6 div 3, integer floor
        assert got[3] == (1, 1000000)
        assert got[4] == (2, 500000)
        assert got[6] == (7, 142857)
        # per-class total mass ≈ unit (floor loss < cluster_size ppm)
        mass = {}
        for _d, (s, w) in got.items():
            mass[s] = mass.get(s, 0) + w
        for size, total in mass.items():
            assert 1_000_000 - size < total <= 1_000_000
        # unit parameter honored
        got2 = {r.doc_id: r.weight_ppm
                for r in soft_dedup_weights(df, unit=1000).collect()}
        assert got2[0] == 333 and got2[3] == 1000
