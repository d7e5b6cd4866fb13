"""Surgical span-level decontamination
(operators/decontamination.span_decontaminate).

Pins: positional n-gram hit detection, margin widening, run splitting
(docs SPLIT at removed spans, never re-joined), piece-id stability
under the min-piece filter, the short-doc whole-text-gram convention,
the NULL-id hard error, and the clean-piece guarantee — every n-gram of
every surviving piece is benchmark-free by construction (a piece is a
run of consecutive original words; a benchmark gram inside it would
have removed those very words)."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.decontamination import (
    contamination_check,
    span_decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def bench(spark):
    return _docs(spark, [(100, "stop one stop two stop three")])


def _run(docs, bench, **kw):
    out = span_decontaminate(docs, bench, "text", "doc_id", **kw)
    return {
        (r["doc_id"], r["piece_id"]): r.asDict()
        for r in out.collect()
    }


def test_middle_hit_splits_into_two_pieces(spark, bench):
    # words 2..4 match the bench 3-gram "one stop two"; margin=0 removes
    # exactly those, leaving two runs on either side.
    docs = _docs(spark, [(1, "alpha beta one stop two gamma delta")])
    got = _run(docs, bench, n=3, margin=0)
    assert got == {
        (1, 1): dict(doc_id=1, piece_id=1, piece_text="alpha beta",
                     n_piece_words=2, n_doc_words=7, n_removed=3),
        (1, 2): dict(doc_id=1, piece_id=2, piece_text="gamma delta",
                     n_piece_words=2, n_doc_words=7, n_removed=3),
    }


def test_margin_widens_removal(spark, bench):
    docs = _docs(spark, [(1, "alpha beta one stop two gamma delta")])
    got = _run(docs, bench, n=3, margin=1)
    # margin=1 also removes 'beta' and 'gamma'
    assert got == {
        (1, 1): dict(doc_id=1, piece_id=1, piece_text="alpha",
                     n_piece_words=1, n_doc_words=7, n_removed=5),
        (1, 2): dict(doc_id=1, piece_id=2, piece_text="delta",
                     n_piece_words=1, n_doc_words=7, n_removed=5),
    }


def test_min_piece_filter_keeps_piece_ids_stable(spark, bench):
    docs = _docs(spark, [(1, "alpha one stop two gamma delta")])
    got = _run(docs, bench, n=3, margin=0, min_piece_words=2)
    # piece 1 ('alpha') is dropped by the filter; the survivor keeps
    # its pre-filter id 2 (ids are positions, not a post-filter ranking)
    assert set(got) == {(1, 2)}
    assert got[(1, 2)]["piece_text"] == "gamma delta"


def test_clean_doc_is_one_full_piece_and_normalized(spark, bench):
    docs = _docs(spark, [(1, "  Totally   CLEAN text, here!  ")])
    got = _run(docs, bench, n=3, margin=0)
    assert got == {
        (1, 1): dict(doc_id=1, piece_id=1, piece_text="totally clean text here",
                     n_piece_words=4, n_doc_words=4, n_removed=0),
    }


def test_fully_contaminated_and_empty_docs_yield_no_rows(spark, bench):
    docs = _docs(spark, [(1, "one stop two"), (2, ""), (3, "   ")])
    assert _run(docs, bench, n=3, margin=0) == {}


def test_short_doc_whole_text_gram_convention(spark):
    # bench doc shorter than n contributes its whole text as one gram;
    # a train doc shorter than n matches via ITS whole-text gram.
    bench = _docs(spark, [(100, "tiny bench")])
    docs = _docs(spark, [(1, "tiny bench"), (2, "tiny other")])
    got = _run(docs, bench, n=3, margin=0)
    assert (1, 1) not in got  # fully removed
    assert got[(2, 1)]["piece_text"] == "tiny other"


def test_split_never_fabricates_joined_ngrams(spark):
    # Removing 'stop one stop two stop three' makes 'beta' and 'gamma'
    # adjacent; re-joining would fabricate the benchmark gram
    # 'beta gamma delta'. Splitting must keep them in separate pieces.
    bench = _docs(
        spark, [(100, "stop one stop two stop three"), (101, "beta gamma delta")]
    )
    docs = _docs(
        spark, [(1, "alpha beta stop one stop two stop three gamma delta end")]
    )
    got = _run(docs, bench, n=3, margin=0)
    texts = [v["piece_text"] for v in got.values()]
    assert sorted(texts) == ["alpha beta", "gamma delta end"]
    assert all("beta gamma delta" not in t for t in texts)


def test_every_surviving_piece_is_ngram_clean(spark):
    # The structural guarantee, checked with the whole-doc screen: no
    # piece of the output shares ANY n-gram with the benchmark.
    bench = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "to be or not to be that is the question"),
            (102, "shared middle phrase"),
        ],
    )
    docs = _docs(
        spark,
        [
            (1, "intro words the quick brown fox jumps away and more tail text"),
            (2, "clean document with nothing shared at all in any window"),
            (3, "first part shared middle phrase second part to be or not to be here"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
    )
    pieces = span_decontaminate(docs, bench, "text", "doc_id", n=3, margin=0)
    keyed = pieces.select(
        F.concat_ws("#", F.col("doc_id"), F.col("piece_id")).alias("pid"),
        F.col("piece_text"),
    )
    chk = contamination_check(
        keyed, bench, "piece_text", "pid", bench_text_col="text", n=3
    )
    bad = chk.where(F.col("n_overlap") > 0).count()
    assert bad == 0
    assert pieces.where(F.col("doc_id") == 3).count() >= 2


def test_null_id_raises(spark, bench):
    docs = spark.createDataFrame([(None, "one stop two fine")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL"):
        span_decontaminate(docs, bench, "text", "doc_id", n=3).collect()


def test_param_validation(spark, bench):
    docs = _docs(spark, [(1, "a b c")])
    for kw in (dict(n=0), dict(margin=-1), dict(min_piece_words=0)):
        with pytest.raises(ValueError):
            span_decontaminate(docs, bench, "text", "doc_id", **kw)


def _reference(docs, bench, n, margin, min_piece):
    """Pure-Python span decontamination — the independent oracle for the
    randomized cross-check."""
    import re

    def norm(t):
        return re.sub(r"[^a-z0-9]+", " ", (t or "").lower()).strip()

    bgrams = set()
    for t in bench:
        w = norm(t).split()
        if not w:
            continue
        if len(w) >= n:
            bgrams.update(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
        else:
            bgrams.add(" ".join(w))
    out = []
    for did, t in docs:
        nt = norm(t)
        w = nt.split() if nt else []
        if not w:
            continue
        npos = max(len(w) - n, 0) + 1
        hits = [p for p in range(npos) if " ".join(w[p : p + n]) in bgrams]
        removed = set()
        for p in hits:
            removed.update(range(max(0, p - margin), min(len(w), p + n + margin)))
        kept = [j for j in range(len(w)) if j not in removed]
        runs, cur, prev = [], [], None
        for j in kept:
            if prev is not None and j != prev + 1:
                runs.append(cur)
                cur = []
            cur.append(j)
            prev = j
        if cur:
            runs.append(cur)
        for pid, run in enumerate(runs, 1):
            if len(run) >= min_piece:
                out.append(
                    (
                        did,
                        pid,
                        " ".join(w[j] for j in run),
                        len(run),
                        len(w),
                        len(w) - len(kept),
                    )
                )
    return sorted(out)


@pytest.mark.parametrize(
    "n,margin,min_piece,seed",
    [(2, 0, 1, 1), (3, 1, 1, 2), (2, 2, 2, 3), (3, 0, 2, 4)],
)
def test_randomized_cross_check_vs_python_reference(
    spark, n, margin, min_piece, seed
):
    """150 random docs over a 12-word vocab (dense gram collisions),
    10 random benchmark docs, messy casing/punctuation — Spark output
    must equal the independent pure-Python implementation EXACTLY."""
    import random

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "Gamma", "delta,", "EPS", "zeta", "eta!",
             "theta", "iota", "kappa", "mu", "nu"]

    def make(words):
        return " ".join(rng.choice(vocab) for _ in range(words))

    docs = [(i, make(rng.randint(0, 30)) if rng.random() > 0.05 else "")
            for i in range(150)]
    bench = [(1000 + i, make(rng.randint(1, 8))) for i in range(10)]
    got = sorted(
        tuple(r)
        for r in span_decontaminate(
            spark.createDataFrame(docs, "doc_id long, text string"),
            spark.createDataFrame(bench, "doc_id long, text string"),
            "text",
            "doc_id",
            n=n,
            margin=margin,
            min_piece_words=min_piece,
        ).collect()
    )
    want = _reference(docs, [t for _, t in bench], n, margin, min_piece)
    assert got == want
