"""Salted join correctness + bucketed write layout."""

import os
import shutil
import uuid

from pyspark.sql import functions as F

from fossil_spark.plans import partitioned_write, salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = {(r["k"], r["payload"], r["dim"])
             for r in big.join(small, "k").collect()}
    salted = {(r["k"], r["payload"], r["dim"])
              for r in salted_join(big, small, "k", salt=8).collect()}
    assert salted == plain and len(plain) > 0


def test_salted_join_left(spark):
    big = spark.range(0, 100).select((F.col("id") % 3).alias("k"), "id")
    small = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = salted_join(big, small, "k", salt=4, how="left").collect()
    assert len(out) == 100
    assert all((r["k"] != 0) == (r["name"] is None) for r in out)


def test_partitioned_write_clusters_keys(spark):
    path = os.path.join("build", f"bucketed_{uuid.uuid4().hex[:8]}")
    try:
        df = spark.range(0, 10000).select(
            (F.col("id") % 64).alias("k"), F.col("id").alias("v")
        )
        partitioned_write(df, path, "k", n_buckets=8, sort_col="v")
        back = spark.read.parquet(path)
        assert back.count() == 10000
        # each key's rows live in exactly one file (co-located)
        per_key_files = (
            back.select("k", F.input_file_name().alias("f"))
            .groupBy("k")
            .agg(F.countDistinct("f").alias("nf"))
            .agg(F.max("nf"))
            .first()[0]
        )
        assert per_key_files == 1
    finally:
        shutil.rmtree(path, ignore_errors=True)
