"""Sketch error envelopes asserted against exact answers at sf0.01."""

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
)
from spark_streaming_sql_s3_connector_spark.plans.io import load_table


def test_hll_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.countDistinct("user_id").alias("d")).collect()[0].d
    approx = approx_distinct(ev, "user_id", rsd=0.05).collect()[0].approx_distinct
    assert abs(approx - exact) <= max(3, 3 * 0.05 * exact)  # 3 sigma


def test_quantile_sketch_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = approx_quantiles(li, "l_extendedprice", (0.5, 0.95), accuracy=10_000).collect()[0]
    n = li.count()
    vals = [r.l_extendedprice for r in li.select("l_extendedprice").collect()]
    vals.sort()
    for p, g in ((0.5, got.q50), (0.95, got.q95)):
        # rank of the sketch's answer within 1/accuracy * n of the target
        import bisect

        rank = bisect.bisect_left(vals, g)
        assert abs(rank - p * n) <= n / 10_000 + 2


def test_frequent_items_exact_threshold(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = {r.event_type: r.cnt for r in frequent_items(ev, "event_type", min_count=1).collect()}
    truth = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert out == truth
