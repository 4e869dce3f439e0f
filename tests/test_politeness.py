"""Direct tests for the two-phase skew-safe politeness cap."""

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.operators import politeness


@pytest.fixture(scope="module")
def skewed_frontier(spark):
    # mega-host with 5000 URLs, two small hosts with 10 each
    mega = spark.range(5000).select(
        F.concat(F.lit("https://mega.x/p"), "id").alias("url"),
        F.lit(0).alias("depth"),
        F.lit("mega.x").alias("host"),
    )
    small = spark.range(10).select(
        F.concat(F.lit("https://a.x/p"), "id").alias("url"),
        F.lit(0).alias("depth"),
        F.lit("a.x").alias("host"),
    ).unionByName(
        spark.range(10).select(
            F.concat(F.lit("https://b.x/p"), "id").alias("url"),
            (F.col("id") % 3).cast("int").alias("depth"),
            F.lit("b.x").alias("host"),
        )
    )
    return mega.unionByName(small).cache()


def test_budget_exact_per_host(spark, skewed_frontier):
    eligible, deferred = politeness.host_budget_split(skewed_frontier, budget=7)
    counts = {
        r["host"]: r["n"]
        for r in eligible.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"mega.x": 7, "a.x": 7, "b.x": 7}
    assert eligible.count() + deferred.count() == skewed_frontier.count()
    # nothing lost, nothing duplicated
    assert (
        eligible.select("url").unionByName(deferred.select("url")).distinct().count()
        == skewed_frontier.count()
    )


def test_budget_picks_min_depth_url(spark, skewed_frontier):
    eligible, _ = politeness.host_budget_split(skewed_frontier, budget=3)
    b_rows = sorted(
        (r["depth"], r["url"])
        for r in eligible.filter(F.col("host") == "b.x").collect()
    )
    all_b = sorted(
        (r["depth"], r["url"])
        for r in skewed_frontier.filter(F.col("host") == "b.x").collect()
    )
    assert b_rows == all_b[:3]  # deterministic (depth, url) order


def test_unlimited_budget_identity(spark, skewed_frontier):
    eligible, deferred = politeness.host_budget_split(skewed_frontier, budget=None)
    assert deferred.count() == 0
    assert eligible.count() == skewed_frontier.count()


def test_budget_larger_than_host(spark, skewed_frontier):
    eligible, deferred = politeness.host_budget_split(skewed_frontier, budget=100)
    counts = {
        r["host"]: r["n"]
        for r in eligible.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a.x"] == 10 and counts["b.x"] == 10 and counts["mega.x"] == 100
