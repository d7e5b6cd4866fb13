"""Cross-document passage dedup laws (operators/dedup.passage_dedup_keep_first).

The k-gram-counting approximation of suffix-array substring dedup:
every repeated whitespace k-gram keeps only its globally first
occurrence in (doc id, position) order; later occurrences mask their k
token positions and documents rebuild from surviving tokens.
"""

import random

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.dedup import (
    passage_dedup_keep_first,
)

K = 5


def _reference(docs, k=K):
    """Pure-python keep-first passage dedup."""
    first = {}
    for did, text in docs:
        toks = (text or "").split()
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            if g not in first or (did, i) < first[g]:
                first[g] = (did, i)
    out = {}
    for did, text in docs:
        toks = (text or "").split()
        masked = set()
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            if first[g] != (did, i):
                masked.update(range(i, i + k))
        kept = [t for j, t in enumerate(toks) if j not in masked]
        out[did] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


def test_semantics_table(spark):
    rows = [
        (1, "a b c d e f g h"),       # original: untouched
        (2, "a b c d e f g h"),       # exact copy: fully removed
        (3, "x y z w v u"),           # fresh: untouched
        (4, "short text"),            # n < k: no grams, untouched
        (5, "p q r s t p q r s t"),   # within-doc repeat masked once
        (6, ""),                      # blank
        (7, "m n a b c d e o"),       # span dup crossing nothing else
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.deduped_text, r.n_kept_tokens, r.n_removed_tokens)
        for r in passage_dedup_keep_first(df, "text", "doc_id", k=K).collect()
    }
    assert got == {
        1: ("a b c d e f g h", 8, 0),
        2: ("", 0, 8),
        3: ("x y z w v u", 6, 0),
        4: ("short text", 2, 0),
        5: ("p q r s t", 5, 5),
        6: ("", 0, 0),
        7: ("m n o", 3, 5),
    }
    assert got == _reference(rows)


def test_randomized_vs_reference_and_repartition_stable(spark):
    """Randomized corpus with planted shared passages: Spark == the
    python reference, and the result is identical under a different
    input partitioning (global-first is an aggregate, not an
    order-of-arrival artifact)."""
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(K, 9)))
        for _ in range(6)
    ]
    docs = []
    for did in range(40):
        parts = []
        for _ in range(rng.randint(0, 3)):
            parts.append(rng.choice(passages))
        parts.extend(
            rng.choice(vocab) for _ in range(rng.randint(0, 12))
        )
        rng.shuffle(parts)
        docs.append((did, " ".join(" ".join(parts).split())))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    want = _reference(docs)
    for parts in (1, 7):
        got = {
            r.doc_id: (r.deduped_text, r.n_kept_tokens, r.n_removed_tokens)
            for r in passage_dedup_keep_first(
                df.repartition(parts), "text", "doc_id", k=K
            ).collect()
        }
        assert got == want, parts


def test_no_window_and_gram_key_is_md5(spark):
    """Scale-shape pins: the global-first reduction is a partial-agg
    groupBy (no Window — a hot gram must not serialize into one task's
    sort), and the gram shuffle key is the 16-byte md5, never the gram
    text."""
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(20)],
        "doc_id bigint, text string",
    )
    out = passage_dedup_keep_first(df, "text", "doc_id", k=K)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Window" not in plan
    assert "md5" in plan
    # partial aggregation before the gram exchange
    assert "partial_min" in plan or "HashAggregate" in plan
