"""Sketch operators: HLL cardinality + Count-Min frequency.

The oracle queries (hll_distinct_tokens / cms_heavy_hitters) pin the
md5-register construction bit-for-bit against DuckDB, but the fixture
corpus has a ~31-token vocabulary, which only reaches the HLL
linear-counting branch and a collision-free CMS. These tests drive the
sketches through the regimes the fixtures can't: large cardinalities
(the raw-estimator branch), register mergeability (the daily→monthly
roll-up path), duplication insensitivity, and the CMS overestimate
guarantee under real collisions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breakchecker_spark.operators import sketches


def _distinct_values(spark, n_distinct: int, repeats: int = 3):
    """repeats*n_distinct rows over exactly n_distinct string values."""
    return spark.range(n_distinct * repeats).select(
        F.concat(F.lit("v"), (F.col("id") % n_distinct).cast("string")).alias(
            "v"
        )
    )


def test_hll_large_range_within_3_sigma(spark):
    # 5000 distinct >> 2.5*m threshold -> raw alpha*m^2/Z branch.
    # std error = 1.04/sqrt(1024) = 3.25%; 3 sigma ~ 9.8%
    df = _distinct_values(spark, 5000)
    regs = sketches.hll_registers(df, [], "v")
    [row] = sketches.hll_estimate(regs, []).collect()
    assert abs(row.hll_estimate - 5000) / 5000 < 0.098


def test_hll_small_range_linear_counting(spark):
    # 12 distinct -> E <= 2.5m and V > 0 -> m*ln(m/V), near-exact
    df = _distinct_values(spark, 12)
    regs = sketches.hll_registers(df, [], "v")
    [row] = sketches.hll_estimate(regs, []).collect()
    assert row.n_zero_regs >= 1024 - 12
    assert abs(row.hll_estimate - 12) <= 1.0


def test_hll_duplication_insensitive(spark):
    # the register table is a function of the distinct value set only
    once = _distinct_values(spark, 300, repeats=1)
    many = _distinct_values(spark, 300, repeats=7)
    r1 = sorted(sketches.hll_registers(once, [], "v").collect())
    r7 = sorted(sketches.hll_registers(many, [], "v").collect())
    assert r1 == r7


def test_hll_merge_equals_union_sketch(spark):
    # sketch(A) merge sketch(B) == sketch(A union B): the roll-up path
    a = _distinct_values(spark, 800).filter(F.col("v") < "v5")
    b = _distinct_values(spark, 800).filter(F.col("v") >= "v3")
    merged = sketches.hll_merge(
        sketches.hll_registers(a, [], "v"),
        sketches.hll_registers(b, [], "v"),
    )
    direct = sketches.hll_registers(a.unionByName(b), [], "v")
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_hll_keyed_groups_independent(spark):
    # per-key sketches equal the sketch of each key's slice alone
    df = _distinct_values(spark, 400).withColumn(
        "k", F.when(F.col("v") < "v5", "a").otherwise("b")
    )
    keyed = {
        (r.k, r.reg): r.rho
        for r in sketches.hll_registers(df, ["k"], "v").collect()
    }
    solo = {
        ("a", r.reg): r.rho
        for r in sketches.hll_registers(
            df.filter(F.col("k") == "a"), [], "v"
        ).collect()
    }
    assert {k: v for k, v in keyed.items() if k[0] == "a"} == solo


def test_cms_never_underestimates(spark):
    # zipf-ish skew: value i appears (2000 // (i + 1)) times
    rows = []
    for i in range(400):
        rows.extend([(f"t{i}",)] * (2000 // (i + 1)))
    df = spark.createDataFrame(rows, ["v"])
    table = sketches.cms_table(df, "v")
    truth = df.groupBy("v").agg(F.count(F.lit(1)).alias("true_count"))
    est = sketches.cms_lookup(table, truth.select("v"), "v")
    bad = (
        truth.join(est, "v")
        .filter(F.col("cms_estimate") < F.col("true_count"))
        .count()
    )
    assert bad == 0


def test_cms_table_bounded_by_d_times_w(spark):
    df = _distinct_values(spark, 3000)
    table = sketches.cms_table(df, "v", d=4, w=64)
    assert table.count() <= 4 * 64
    # total mass per row equals the input row count
    masses = [
        r.mass
        for r in table.groupBy("row_i")
        .agg(F.sum("cnt").alias("mass"))
        .collect()
    ]
    assert masses == [df.count()] * 4


def test_cms_exact_when_collision_free(spark):
    # 20 values in 1024 buckets x 4 rows: min over rows removes any
    # single-row collision; with md5 spreading 20 keys the estimate is
    # exact for this fixture (pinned -- a hash change that clumps keys
    # shows up here)
    df = _distinct_values(spark, 20, repeats=5)
    table = sketches.cms_table(df, "v")
    truth = df.groupBy("v").agg(F.count(F.lit(1)).alias("true_count"))
    est = sketches.cms_lookup(table, truth.select("v"), "v")
    diff = (
        truth.join(est, "v")
        .filter(F.col("cms_estimate") != F.col("true_count"))
        .count()
    )
    assert diff == 0
