"""Property-based tests (hypothesis) for the pure cores of the r5
pipeline operators — driver-side laws over arbitrary inputs, no Spark
session (the Spark plumbing is covered by the example-based suites).

- Bloom bitmap: zero false negatives for ANY key set (including unicode
  and adversarial hash values), any (n, fpp) sizing.
- Concat packing arithmetic: offsets are an exclusive prefix sum, spans
  cover exactly n_tokens positions, straddle arithmetic consistent for
  any token-length sequence.
- Mixing fraction: min(1, share*budget/total) in [0, 1]; monotone in
  budget.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_sql_s3_connector_spark.operators.bloom import (
    BloomFilter,
    bloom_params,
)


def _build_bits(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    mask = np.int64(m - 1)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    a, b = h1 & mask, h2 & mask
    for i in range(k):
        idx = (a + np.int64(i) * b) & mask
        np.bitwise_or.at(
            bits, idx >> np.int64(3),
            (np.uint8(1) << (idx & np.int64(7)).astype(np.uint8)),
        )
    return bits


hashes = st.lists(
    st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
    ),
    min_size=1,
    max_size=200,
)


@settings(max_examples=80, deadline=None)
@given(pairs=hashes, fpp=st.floats(min_value=0.001, max_value=0.3))
def test_bloom_never_false_negative(pairs, fpp):
    m, k = bloom_params(len(pairs), fpp)
    h1 = np.array([p[0] for p in pairs], dtype=np.int64)
    h2 = np.array([p[1] for p in pairs], dtype=np.int64)
    bf = BloomFilter(m, k, 0, _build_bits(h1, h2, m, k))
    assert bf.might_contain_np(h1, h2).all()


@settings(max_examples=80, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**9),
       fpp=st.floats(min_value=1e-6, max_value=0.5))
def test_bloom_params_laws(n, fpp):
    m, k = bloom_params(n, fpp)
    assert m & (m - 1) == 0 and m >= 64
    assert k >= 1
    # power-of-two round-up never undersizes vs the textbook optimum
    import math
    assert m >= -n * math.log(fpp) / (math.log(2) ** 2) - 1


@settings(max_examples=80, deadline=None)
@given(tokens=st.lists(st.integers(min_value=0, max_value=5000),
                       min_size=1, max_size=200),
       capacity=st.integers(min_value=1, max_value=4096))
def test_concat_packing_arithmetic(tokens, capacity):
    # the pure recurrence pack_concat expresses through window functions
    start = 0
    for n in tokens:
        seq_first = start // capacity
        last_tok = max(start + n - 1, start)
        seq_last = last_tok // capacity
        assert seq_last >= seq_first
        # spans cover exactly the doc's token interval
        if n > 0:
            assert seq_first == start // capacity
            assert seq_last == (start + n - 1) // capacity
            # a doc spans s sequences only if it crosses s-1 boundaries
            assert seq_last - seq_first <= (n - 1) // capacity + 1
        start += n


@settings(max_examples=80, deadline=None)
@given(share=st.floats(min_value=0, max_value=1),
       budget=st.integers(min_value=1, max_value=10**12),
       total=st.floats(min_value=1, max_value=1e15))
def test_mix_fraction_laws(share, budget, total):
    frac = min(1.0, share * budget / total)
    assert 0.0 <= frac <= 1.0
    bigger = min(1.0, share * (budget * 2) / total)
    assert bigger >= frac  # monotone in budget


# ---------------------------------------------------------------------------
# UniMax water-filling (operators/sampling.unimax_plan) — pure driver core


_totals = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    st.integers(min_value=1, max_value=10**7),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(totals=_totals, budget=st.integers(min_value=1, max_value=10**9),
       epochs=st.integers(min_value=1, max_value=5))
def test_unimax_water_fill_laws(totals, budget, epochs):
    from spark_streaming_sql_s3_connector_spark.operators.sampling import (
        unimax_plan,
    )

    plan = unimax_plan(totals, budget, epochs)
    assert set(plan) == {str(g) for g in totals}
    caps = {str(g): t * epochs for g, t in totals.items()}
    alloc = {g: plan[g] * totals[g] for g in plan}
    # (1) nobody exceeds the epoch cap (12-dp rounding slack)
    for g in plan:
        assert 0 < plan[g] <= epochs + 1e-9
    # (2) the budget is filled exactly when fillable, else all saturate
    # epochs are rounded to 12 dp, so per-group alloc carries an absolute
    # slack of ~1e-12 × its total — scale every tolerance by the largest
    # group, not by the level
    slack = 1e-9 * max(totals.values()) + 1e-9
    total_alloc = sum(alloc.values())
    want = min(budget, sum(caps.values()))
    assert total_alloc == pytest.approx(want, rel=1e-6, abs=len(plan) * slack)
    # (3) water level: every UNSATURATED group gets the same allocation,
    # and it is >= every saturated group's cap (the level sits above
    # all saturated caps)
    unsat = [g for g in plan if plan[g] < epochs - 1e-9]
    if unsat:
        levels = sorted(alloc[g] for g in unsat)
        assert levels[-1] - levels[0] <= slack
        sat_caps = [caps[g] for g in plan if g not in unsat]
        if sat_caps:
            assert max(sat_caps) <= levels[0] + slack
