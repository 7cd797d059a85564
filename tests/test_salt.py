"""Salt invariance (SURVEY.md §5.2.4): salted two-level aggregation and
salted join must agree exactly with their unsalted equivalents — AND the
salt must actually spread a hot key (a salt that is a pure function of the
key is a no-op: every row of the hot key gets the same salt and one reducer
still sees everything). The spread tests plant a single hot key and require
>1 partial-agg group / >1 reduce task for it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antnre_spark.salt import salt_col, salted_agg, salted_join


@pytest.fixture(scope="module")
def events(spark):
    sf_dir = "/root/testdata/sf0.001"
    return spark.read.parquet(f"{sf_dir}/events.parquet")


class TestSaltedAgg:
    def test_counts_match_plain_groupby(self, events):
        plain = {
            r["event_type"]: r["n"]
            for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }
        salted = {
            r["event_type"]: r["n"]
            for r in salted_agg(
                events, ["event_type"], {"n": ("*", "count")}, n_salts=8
            ).collect()
        }
        assert salted == plain

    def test_sum_min_max_match(self, events):
        aggs = {
            "total": ("value", "sum"),
            "lo": ("value", "min"),
            "hi": ("value", "max"),
        }
        plain = {
            r["event_type"]: (r["total"], r["lo"], r["hi"])
            for r in events.groupBy("event_type")
            .agg(
                F.sum("value").alias("total"),
                F.min("value").alias("lo"),
                F.max("value").alias("hi"),
            )
            .collect()
        }
        salted = {
            r["event_type"]: (r["total"], r["lo"], r["hi"])
            for r in salted_agg(events, ["event_type"], aggs, n_salts=8).collect()
        }
        for k in plain:
            assert salted[k][1] == plain[k][1] and salted[k][2] == plain[k][2]
            assert abs(salted[k][0] - plain[k][0]) < 1e-6 * max(1.0, abs(plain[k][0]))


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, events):
        dims = spark.createDataFrame(
            [("purchase", 1.5), ("click", 0.1), ("view", 0.01)],
            ["event_type", "weight"],
        )
        plain = (
            events.join(dims, "event_type")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )
        salted = (
            salted_join(events, dims, ["event_type"], n_salts=4)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


class TestSaltSpreadsHotKey:
    """The actual skew-mitigation property: one hot key must fan out."""

    def test_partial_agg_sees_multiple_groups_per_hot_key(self, spark):
        hot = spark.range(10_000).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        n_groups = (
            hot.withColumn("_salt", salt_col(8))
            .select("_salt")
            .distinct()
            .count()
        )
        assert n_groups > 1, "per-key salt no-op: hot key collapsed to 1 group"

    def test_row_key_salt_is_deterministic_and_spreads(self, spark):
        hot = spark.range(10_000).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        salted = hot.withColumn("_salt", salt_col(8, row_key=F.col("v")))
        assert salted.select("_salt").distinct().count() == 8
        # deterministic: same row -> same salt on re-evaluation
        a = sorted(map(tuple, salted.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b

    def test_salted_join_splits_hot_key_across_tasks(self, spark):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE would coalesce this tiny test shuffle to 1 partition and mask
        # the property under test (distinct reduce tasks per hot key)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            big = spark.range(20_000).select(
                F.lit("hot").alias("event_type"), F.col("id")
            )
            small = spark.createDataFrame([("hot", 1.0)], ["event_type", "w"])
            joined = salted_join(
                big, small, ["event_type"], n_salts=8, row_key=F.col("id")
            )
            parts = joined.select(F.spark_partition_id().alias("p")).distinct().count()
            assert parts > 1, "hot key landed on a single shuffle-join task"
            assert joined.count() == 20_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce
            )


class TestMapColumnSalt:
    def test_salted_agg_tolerates_map_columns(self, spark):
        """Content-hash salt must skip MapType columns (Spark forbids
        hashing maps) instead of failing analysis — review regression."""
        df = spark.createDataFrame(
            [("k", 1, {"a": 1}), ("k", 2, {"b": 2})],
            "k string, v int, m map<string,int>",
        )
        out = {
            r["k"]: r["n"]
            for r in salted_agg(df, ["k"], {"n": ("*", "count")}, n_salts=4).collect()
        }
        assert out == {"k": 2}
