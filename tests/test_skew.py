from pyspark.sql import functions as F

from sheep_spark import skew


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(20)], "k long, v long"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k long, name string")
    got = sorted(tuple(r) for r in skew.salted_join(big, small, "k", n_salt=8).collect())
    want = sorted(tuple(r) for r in big.join(small, "k").collect())
    assert got == want


def test_salted_distinct_count(spark):
    rows = [(1, v % 7) for v in range(1000)] + [(2, v) for v in range(5)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.n_distinct for r in skew.salted_distinct_count(df, "k", "v").collect()}
    assert got == {1: 7, 2: 5}


def test_range_repartition_contiguous(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "pos long")
    parted = skew.range_repartition_by_pos(df, 4)
    ranges = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint contiguous ranges
