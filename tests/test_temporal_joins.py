"""asof_join / range_join_binned: semantics pinned against brute-force
references computed in plain Python (and, for asof, the same shape DuckDB's
ASOF JOIN produces — the registry query carries the DuckDB oracle)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.temporal_joins import (
    asof_join,
    range_join_binned,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])


@pytest.fixture(scope="module")
def quotes_trades(spark):
    # key, ts, payload — classic trades (left) / quotes (right)
    trades = _mk(
        spark,
        [
            ("a", 10.0, 1),
            ("a", 25.0, 2),
            ("a", 5.0, 3),
            ("b", 7.0, 4),
            ("c", 3.0, 5),  # key with no quotes at all
        ],
        ["sym", "t", "trade_id"],
    )
    quotes = _mk(
        spark,
        [
            ("a", 8.0, 100.0),
            ("a", 10.0, 101.0),  # tie with trade at t=10 → inclusive match
            ("a", 20.0, 102.0),
            ("b", 9.0, 200.0),  # after b's only trade
        ],
        ["sym", "t", "px"],
    )
    return trades, quotes


def _asof_map(df, id_col="trade_id"):
    return {r[id_col]: (r["t_r"], r["px_r"]) for r in df.collect()}


def test_asof_backward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_ts="t")
    got = _asof_map(out)
    assert got[1] == (10.0, 101.0)  # inclusive: quote at exactly t=10
    assert got[2] == (20.0, 102.0)  # latest ≤ 25
    assert got[3] == (None, None)  # no quote ≤ 5
    assert got[4] == (None, None)  # b's quote is after the trade
    assert got[5] == (None, None)  # key absent from right
    assert out.count() == trades.count()  # left join: all trades survive


def test_asof_forward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", direction="forward")
    got = _asof_map(out)
    assert got[1] == (10.0, 101.0)  # inclusive at equality
    assert got[2] == (None, None)  # nothing ≥ 25
    assert got[3] == (8.0, 100.0)  # earliest ≥ 5
    assert got[4] == (9.0, 200.0)


def test_asof_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", tolerance_seconds=2.0)
    got = _asof_map(out)
    assert got[1] == (10.0, 101.0)  # delta 0 ≤ 2
    assert got[2] == (None, None)  # delta 5 > 2 → nulled
    assert got[4] == (None, None)


def test_asof_matches_brute_force_on_events(spark, sf_dir):
    from spark_streaming_sql_s3_connector_spark.plans.io import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("cval")
    )
    out = asof_join(
        views, clicks, on=["user_id"], left_ts="ts", right_ts="cts", right_cols=["cval"]
    )
    got = {r["event_id"]: r["cts_r"] for r in out.collect()}

    v_rows = views.collect()
    c_rows = clicks.collect()
    by_user = {}
    for r in c_rows:
        by_user.setdefault(r["user_id"], []).append(r["cts"])
    for v in v_rows:
        cand = [t for t in by_user.get(v["user_id"], []) if t <= v["ts"]]
        expect = max(cand) if cand else None
        assert got[v["event_id"]] == expect


def test_range_join_inner_and_left(spark):
    points = _mk(spark, [(1, 5.0, "p1"), (1, 15.0, "p2"), (2, 5.0, "p3")], ["k", "v", "pid"])
    ranges = _mk(
        spark,
        [(1, 0.0, 10.0, "r1"), (1, 4.0, 5.0, "r2"), (1, 20.0, 30.0, "r3"), (2, 6.0, 9.0, "r4")],
        ["k", "lo", "hi", "rid"],
    )
    inner = range_join_binned(points, ranges, ["k"], "v", "lo", "hi", bin_width=7.0)
    got = sorted((r["pid"], r["rid"]) for r in inner.collect())
    # p1@(1,5): r1 [0,10] and r2 [4,5] (inclusive hi). p2@(1,15): none.
    # p3@(2,5): r4 starts at 6 → none.
    assert got == [("p1", "r1"), ("p1", "r2")]

    left = range_join_binned(points, ranges, ["k"], "v", "lo", "hi", bin_width=7.0, how="left")
    rows = left.collect()
    assert len(rows) == 4  # p1×2 matches + p2,p3 null rows
    unmatched = {r["pid"] for r in rows if r["rid"] is None}
    assert unmatched == {"p2", "p3"}


def test_range_join_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    points = _mk(
        spark,
        [(rng.randrange(3), rng.uniform(0, 100), i) for i in range(300)],
        ["k", "v", "pid"],
    )
    raw = []
    for i in range(80):
        lo = rng.uniform(0, 95)
        raw.append((rng.randrange(3), lo, lo + rng.uniform(0, 12), i))
    ranges = _mk(spark, raw, ["k", "lo", "hi", "rid"])

    out = range_join_binned(points, ranges, ["k"], "v", "lo", "hi", bin_width=8.0)
    got = sorted((r["pid"], r["rid"]) for r in out.collect())

    p_rows = [tuple(r) for r in points.collect()]
    expect = sorted(
        (pid, rid)
        for (pk, v, pid) in p_rows
        for (rk, lo, hi, rid) in raw
        if pk == rk and lo <= v <= hi
    )
    assert got == expect


def test_range_join_bin_guard_fires(spark):
    points = _mk(spark, [(1, 5.0, "p1")], ["k", "v", "pid"])
    ranges = _mk(spark, [(1, 0.0, 1e6, "r1")], ["k", "lo", "hi", "rid"])
    out = range_join_binned(
        points, ranges, ["k"], "v", "lo", "hi", bin_width=1.0, max_bins_per_range=100
    )
    with pytest.raises(Exception, match="max_bins_per_range"):
        out.collect()


def test_range_join_rejects_overlapping_columns(spark):
    points = _mk(spark, [(1, 5.0, "x")], ["k", "v", "name"])
    ranges = _mk(spark, [(1, 0.0, 10.0, "y")], ["k", "lo", "name", "hi"])
    with pytest.raises(ValueError, match="overlapping"):
        range_join_binned(points, ranges, ["k"], "v", "lo", "hi", bin_width=5.0)


def test_asof_single_shuffle_plan(spark, quotes_trades):
    """The whole asof resolves with ONE exchange (hash on the key)."""
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_ts="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_reserved_column_guards(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="reserved"):
        asof_join(trades.withColumn("_side", F.lit(1)), quotes, on=["sym"], left_ts="t")
    with pytest.raises(ValueError, match="_bin"):
        range_join_binned(
            trades.withColumnRenamed("trade_id", "_bin"),
            quotes.select("sym", F.col("t").alias("lo"), (F.col("t") + 1).alias("hi")),
            ["sym"],
            "t",
            "lo",
            "hi",
            bin_width=5.0,
        )
