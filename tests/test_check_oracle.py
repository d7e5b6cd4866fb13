"""The local sweep tool's self-check enforcement (r10 verdict task #4):
boolean *_ok / exact_match / found_exact columns in ROWS-ONLY keys are
load-bearing — a single False fails the sweep."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import _self_check_cols, compare  # noqa: E402


def test_false_self_check_fails_rows_only_key(spark):
    df_ok = spark.createDataFrame(
        [(1, True, True), (2, True, True)], "id int, overlap_ok boolean, exact_match boolean"
    )
    ok, msg, n = compare("no_such_registry_key", df_ok, None)
    assert ok and n == 2 and "self-check" in msg

    df_bad = spark.createDataFrame(
        [(1, True), (2, False)], "id int, exact_match boolean"
    )
    ok, msg, n = compare("no_such_registry_key", df_bad, None)
    assert not ok and "exact_match" in msg

    # a NULL is not a pass either
    df_null = spark.createDataFrame(
        [(1, True), (2, None)], "id int, found_exact boolean"
    )
    ok, msg, _ = compare("no_such_registry_key", df_null, None)
    assert not ok

    # non-boolean *_ok columns are not self-checks (no accidental traps)
    df_str = spark.createDataFrame([(1, "fine")], "id int, status_ok string")
    assert _self_check_cols(df_str) == []
    ok, _, n = compare("no_such_registry_key", df_str, None)
    assert ok and n == 0
