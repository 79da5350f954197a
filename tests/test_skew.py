"""Salted-aggregation / salted-join equivalence tests on a deliberately
skewed key distribution (90% of rows share one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from otterbrix_spark.operators.skew import salted_count_sum, salted_join


def _skewed(spark, n=10_000):
    # key 0 takes ~90% of rows; values deterministic
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("v") * 10000).cast("long")).cast("double") / 10000.0
            ).alias("total"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"])
        for r in salted_count_sum(df, "k", "v", n_salts=8, salt_cols=["id"]).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark, 5_000)
    dim = spark.range(100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    ).collect()[0]
    salted = salted_join(fact, dim, "k", n_salts=8, salt_cols=["id"]).agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    ).collect()[0]
    assert (salted["n"], salted["sw"]) == (plain["n"], plain["sw"])


def test_salt_is_deterministic(spark):
    df = _skewed(spark, 1_000)
    a = salted_count_sum(df, "k", "v", n_salts=8, salt_cols=["id"]).collect()
    b = salted_count_sum(df, "k", "v", n_salts=8, salt_cols=["id"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
