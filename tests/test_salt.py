"""Salt invariance (SURVEY.md §5.2.4): salted two-level aggregation and
salted join must agree exactly with their unsalted equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antnre_spark.salt import salted_agg, salted_join


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
