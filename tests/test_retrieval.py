"""Laws + plan pins for lexical ranked retrieval
(operators/retrieval.py): BM25 search and TF-IDF keyword extraction.
The cross-engine value parity is pinned by the DuckDB oracles
(`bm25_search_docs`, `tfidf_keywords_docs`); here we pin semantics on
controlled corpora and the scale-shape plan properties."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
    bm25_search,
    tfidf_top_terms,
)


def _toy(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_tf_monotone_same_length(spark):
    """With one query term and equal doc lengths, more occurrences ⇒
    strictly higher score."""
    docs = _toy(
        spark,
        [
            (1, "cat dog dog dog dog dog"),
            (2, "cat cat dog dog dog dog"),
            (3, "cat cat cat dog dog dog"),
            (4, "bird bird bird bird bird bird"),
        ],
    )
    out = bm25_search(docs, "text", "doc_id", ["cat"], top_k=10).collect()
    assert [r.doc_id for r in out] == [3, 2, 1]  # doc 4 never matches
    assert out[0].score > out[1].score > out[2].score > 0


def test_bm25_rare_term_outweighs_common(spark):
    """A doc matching only the rare term beats a doc matching only the
    common term (equal tf, equal dl) — the idf ordering."""
    docs = _toy(
        spark,
        [
            (1, "rare filler filler filler"),
            (2, "common filler filler filler"),
            (3, "common filler filler filler"),
            (4, "common filler filler filler"),
            (5, "common filler filler filler"),
        ],
    )
    out = {
        r.doc_id: r.score
        for r in bm25_search(
            docs, "text", "doc_id", ["rare", "common"], top_k=10
        ).collect()
    }
    assert out[1] > out[2]
    assert out[2] == out[3] == out[4] == out[5]


def test_bm25_length_normalization(spark):
    """Same tf, longer doc ⇒ lower score (b > 0 length penalty)."""
    docs = _toy(
        spark,
        [
            (1, "cat dog"),
            (2, "cat dog filler filler filler filler filler filler"),
            (3, "other words entirely here now yes"),
        ],
    )
    out = {
        r.doc_id: r.score
        for r in bm25_search(docs, "text", "doc_id", ["cat"], top_k=10).collect()
    }
    assert out[1] > out[2]


def test_bm25_n_matched_and_exclusion(spark):
    docs = _toy(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),
            (3, "delta epsilon zeta"),
            (4, ""),
            (5, None),
        ],
    )
    rows = bm25_search(
        docs, "text", "doc_id", ["alpha", "beta"], top_k=10
    ).collect()
    got = {r.doc_id: r for r in rows}
    assert set(got) == {1, 2}
    assert got[1].n_matched == 2 and got[2].n_matched == 1
    assert got[1].dl == 3 and got[2].dl == 3


def test_bm25_input_validation(spark):
    docs = _toy(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        bm25_search(docs, "text", "doc_id", [])
    with pytest.raises(ValueError):
        bm25_search(docs, "text", "doc_id", ["Good"])  # not lowercase
    with pytest.raises(ValueError):
        bm25_search(docs, "text", "doc_id", [" pad "])  # not stripped


def test_bm25_repartition_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = bm25_search(
        docs, "text", "doc_id", ["spark", "join"], top_k=15
    ).collect()
    b = bm25_search(
        docs.repartition(13), "text", "doc_id", ["spark", "join"], top_k=15
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 15


def test_bm25_plan_no_corpus_shuffle(spark, sf_dir):
    """The scale pin: no explode/generate anywhere; no corpus-keyed
    aggregate exchange — only the one-row stats agg (SinglePartition),
    the broadcast of it, and TakeOrderedAndProject for top-k."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_search(docs, "text", "doc_id", ["spark", "join"], top_k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan  # no explode
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # every Exchange is either the 1-row stats reduction or a broadcast
    for line in plan.splitlines():
        if "Exchange" in line and "Reused" not in line:
            assert (
                "SinglePartition" in line or "EXECUTOR_BROADCAST" in line
                or "broadcast" in line.lower()
            ), line


def test_tfidf_universal_term_scores_zero(spark):
    """A term in every doc has idf = ln(1) = 0; distinctive terms rank
    above it."""
    docs = _toy(
        spark,
        [
            (1, "shared apple apple"),
            (2, "shared banana banana"),
            (3, "shared cherry cherry"),
        ],
    )
    out = tfidf_top_terms(docs, "text", "doc_id", top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, terms in by_doc.items():
        assert terms[0].rank == 1 and terms[0].tfidf > 0
        ranked = {r.term: r.tfidf for r in terms}
        if "shared" in ranked:
            assert ranked["shared"] == 0.0


def test_tfidf_rank_contract(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tfidf_top_terms(docs, "text", "doc_id", top_n=3)
    rows = out.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, terms in per_doc.items():
        ranks = sorted(r.rank for r in terms)
        assert ranks == list(range(1, len(terms) + 1))
        ordered = sorted(terms, key=lambda r: r.rank)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.tfidf, b.term) >= (b.tfidf, a.term) or a.tfidf > b.tfidf


def test_tfidf_min_df_drops_rare_noise(spark):
    docs = _toy(
        spark,
        [
            (1, "noise apple apple banana"),
            (2, "apple banana banana cherry"),
            (3, "apple cherry cherry banana"),
        ],
    )
    out = tfidf_top_terms(docs, "text", "doc_id", top_n=4, min_df=2).collect()
    assert all(r.term != "noise" for r in out)


def test_tfidf_plan_window_group_limit(spark, sf_dir):
    """rank<=n must execute as WindowGroupLimit (map-side top-n before
    the window exchange) and the df table must broadcast."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        tfidf_top_terms(docs, "text", "doc_id", top_n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------- hard negatives ----
# (lexical + embedding retrieval share this module: both are the
# "find training-relevant rows for a query" surface)

from spark_streaming_sql_s3_connector_spark.operators.similarity import (  # noqa: E402
    hard_negatives,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_hard_negatives_excludes_same_group_and_self(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label: never a negative for 0
        (2, [0.98, 0.2], 1),   # closest other-label
        (3, [0.0, 1.0], 1),    # far other-label
        (4, [0.9, 0.4], 2),
    ]
    df = _emb(spark, rows)
    q = df.where("vec_id = 0")
    out = hard_negatives(df, q, "embedding", "vec_id", "label", k=3).collect()
    ids = [r.neighbor_id for r in out]
    assert 0 not in ids and 1 not in ids
    assert ids[0] == 2  # hardest negative first
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].cosine > out[1].cosine > out[2].cosine


def test_hard_negatives_python_parity(spark, sf_dir):
    """Exact-set equality with a pure-python brute force on the real
    table (5 queries, k=5)."""
    import math

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in hard_negatives(emb, q, "embedding", "vec_id", "label", k=5).collect()
    }
    rows = [(r.vec_id, list(r.embedding), r.label) for r in emb.collect()]
    queries = [(i, v, l) for i, v, l in rows if i < 5]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na > 0 and nb > 0 else 0.0

    for qi, qv, ql in queries:
        cands = sorted(
            (
                (-cos(v, qv), i)
                for i, v, l in rows
                if l != ql and i != qi
            ),
        )[:5]
        for rank, (_, nid) in enumerate(cands, 1):
            assert got[(qi, rank)] == nid, (qi, rank)


def test_hard_negatives_plan_broadcast_and_group_limit(spark, sf_dir):
    """Scale pin: query side broadcast (no corpus-vs-corpus shuffle
    join) and per-query top-k via WindowGroupLimit."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    plan = (
        hard_negatives(emb, q, "embedding", "vec_id", "label", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_hard_negatives_k_validation(spark):
    df = _emb(spark, [(0, [1.0, 0.0], 0)])
    with pytest.raises(ValueError):
        hard_negatives(df, df, "embedding", "vec_id", "label", k=0)


# ------------------------------------------------------- RRF fusion ----

from spark_streaming_sql_s3_connector_spark.operators.retrieval import (  # noqa: E402
    rrf_fuse,
    with_rank,
)


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id bigint, rank int")


def test_rrf_both_lists_beat_single_list(spark):
    lex = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    sem = _ranked(spark, [(1, 3), (4, 1), (5, 2)])
    out = rrf_fuse([lex, sem], "doc_id", k=60, top_k=10).collect()
    by = {r.doc_id: r for r in out}
    # doc 1 appears in both lists: must outrank every single-list doc
    assert out[0].doc_id == 1 and by[1].n_lists == 2
    assert all(by[d].n_lists == 1 for d in (2, 3, 4, 5))
    # exact arithmetic: 1/61 + 1/63 on the 9-dp grid
    assert abs(by[1].rrf_score - (round(1 / 61, 9) + round(1 / 63, 9))) < 1e-12


def test_rrf_rank_order_within_single_list(spark):
    lst = _ranked(spark, [(i, i) for i in range(1, 8)])
    out = rrf_fuse([lst], "doc_id", k=60, top_k=5).collect()
    assert [r.doc_id for r in out] == [1, 2, 3, 4, 5]
    assert all(a.rrf_score > b.rrf_score for a, b in zip(out, out[1:]))


def test_rrf_validation(spark):
    lst = _ranked(spark, [(1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([], "doc_id")
    with pytest.raises(ValueError):
        rrf_fuse([lst], "doc_id", k=0)
    with pytest.raises(ValueError):
        rrf_fuse([lst], "doc_id", top_k=0)


def test_with_rank_matches_order(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1)], "doc_id bigint, score double"
    )
    got = {
        r.doc_id: r.rank
        for r in with_rank(df, [F.col("score").desc()], "doc_id").collect()
    }
    assert got == {2: 1, 3: 2, 1: 3, 4: 4}  # tie 0.9 breaks id-asc


def test_hybrid_fusion_end_to_end(spark, sf_dir):
    """Composition smoke: BM25 ∪ brute-cosine fused — every output doc
    must come from at least one list and n_lists is honest."""
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        bm25_search,
    )
    from spark_streaming_sql_s3_connector_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.where("vec_id = 0").collect()[0].embedding
    ]
    lex = with_rank(
        bm25_search(docs, "text", "doc_id", ["spark", "join"], top_k=10),
        [F.col("score").desc()],
        "doc_id",
    )
    sem = with_rank(
        brute_force_topk(
            emb.where("vec_id != 0"), "embedding", "vec_id", q, k=10
        ).withColumnRenamed("neighbor_id", "doc_id"),
        [F.col("cosine").desc()],
        "doc_id",
    )
    lex_ids = {r.doc_id for r in lex.collect()}
    sem_ids = {r.doc_id for r in sem.collect()}
    out = rrf_fuse([lex, sem], "doc_id", top_k=10).collect()
    for r in out:
        expected = (r.doc_id in lex_ids) + (r.doc_id in sem_ids)
        assert r.n_lists == expected and expected >= 1


# ---------------------------------------------------------------------------
# IR evaluation (retrieval_metrics)


def test_retrieval_metrics_exact_arithmetic(spark):
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        retrieval_metrics,
    )

    # q1: 3 relevant docs, run finds 2 of them at ranks 2 and 5
    # q2: 1 relevant doc, run misses it entirely
    # q3: judged but absent from the run (retriever returned nothing)
    results = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 5), ("q1", "d", 11),
         ("q2", "x", 1), ("q2", "y", 2)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [("q1", "b"), ("q1", "c"), ("q1", "z"), ("q1", "b"),  # dup tolerated
         ("q2", "nope"), ("q3", "m")],
        ["query_id", "doc_id"],
    )
    got = {
        r["query_id"]: r.asDict()
        for r in retrieval_metrics(results, qrels, k=10).collect()
    }
    assert set(got) == {"q1", "q2", "q3"}
    assert got["q1"]["n_rel"] == 3 and got["q1"]["n_hits"] == 2
    assert got["q1"]["recall_at_k"] == round(2 / 3, 6)
    assert got["q1"]["precision_at_k"] == 0.2
    assert got["q1"]["reciprocal_rank"] == 0.5  # first hit at rank 2
    for q in ("q2", "q3"):
        assert got[q]["n_hits"] == 0
        assert got[q]["recall_at_k"] == 0.0
        assert got[q]["reciprocal_rank"] == 0.0
    # rank-11 row never counts at k=10
    assert got["q1"]["n_hits"] == 2


def test_retrieval_metrics_k_cut_and_validation(spark):
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        retrieval_metrics,
    )

    results = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame([("q", "c")], ["query_id", "doc_id"])
    at2 = retrieval_metrics(results, qrels, k=2).collect()[0]
    assert at2["n_hits"] == 0 and at2["reciprocal_rank"] == 0.0
    at3 = retrieval_metrics(results, qrels, k=3).collect()[0]
    assert at3["n_hits"] == 1 and at3["reciprocal_rank"] == round(1 / 3, 6)
    import pytest as _p

    with _p.raises(ValueError):
        retrieval_metrics(results, qrels, k=0)


def test_retrieval_metrics_ndcg(spark):
    import math

    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        ndcg_discounts,
        retrieval_metrics,
    )

    # q1: hits at ranks 1 and 3 of 2 relevant -> DCG = d1+d3, IDCG = d1+d2
    # q2: hit at rank 2, 5 relevant, k=3 -> IDCG caps at d1+d2+d3
    results = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "x", 1), ("q2", "y", 2), ("q2", "z", 3)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [("q1", "a"), ("q1", "c"),
         ("q2", "y"), ("q2", "r1"), ("q2", "r2"), ("q2", "r3"), ("q2", "r4")],
        ["query_id", "doc_id"],
    )
    got = {
        r["query_id"]: r["ndcg_at_k"]
        for r in retrieval_metrics(results, qrels, k=3).collect()
    }
    d = ndcg_discounts(3)
    assert got["q1"] == round((d[0] + d[2]) / (d[0] + d[1]), 6)
    assert got["q2"] == round(d[1] / (d[0] + d[1] + d[2]), 6)
    # perfect run -> ndcg exactly 1.0
    perfect = retrieval_metrics(
        spark.createDataFrame([("q1", "a", 1), ("q1", "c", 2)],
                              ["query_id", "doc_id", "rank"]),
        spark.createDataFrame([("q1", "a"), ("q1", "c")],
                              ["query_id", "doc_id"]),
        k=3,
    ).collect()[0]
    assert perfect["ndcg_at_k"] == 1.0
    # discount table is the real 1/log2 curve in picounits
    for i, v in enumerate(ndcg_discounts(5), 1):
        assert v == int(round(1e12 / math.log2(i + 1)))


def test_hybrid_indexed_overlaps_scan_twin(spark, sf_dir):
    """Serving-shape hybrid search law (r8 verdict task #3): the fused
    top-15 of the AMORTIZED twin (term-stats BM25 + persisted-index ANN
    with over-fetch + exact refine) must overlap the brute scan twin's
    fused top-15 at jaccard >= 0.8 on sf0.01, and the key's in-plan
    self-check column must agree."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    got_rows = qs["hybrid_search_indexed"](spark, sf_dir).collect()
    exact = {int(r.doc_id) for r in qs["hybrid_search_docs"](spark, sf_dir).collect()}
    got = {int(r.doc_id) for r in got_rows}
    jacc = len(got & exact) / len(got | exact)
    assert jacc >= 0.8, (sorted(got), sorted(exact))
    assert all(r.overlap_ok for r in got_rows)


def test_graded_metrics_with_unit_grades_equal_binary(spark):
    """Reduction law: graded nDCG with all grades = 1 (gain 2¹−1 = 1)
    must reproduce the binary path row-for-row — same exact-integer
    DCG/IDCG, same rounding."""
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        retrieval_metrics,
    )

    results = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        + [(2, d, r) for r, d in enumerate([20, 21, 22], 1)],
        "query_id int, doc_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 13), (1, 99), (2, 21), (2, 20)],
        "query_id int, doc_id int",
    )
    binary = retrieval_metrics(results, qrels, k=5).orderBy("query_id")
    graded = retrieval_metrics(
        results, qrels.withColumn("grade", F.lit(1)), k=5, grade_col="grade"
    ).orderBy("query_id")
    assert [tuple(r) for r in graded.collect()] == [
        tuple(r) for r in binary.collect()
    ]


def test_graded_ndcg_matches_hand_computed_fixture(spark):
    """Graded nDCG vs a by-hand TREC example: query 1 retrieves docs
    ranked (A grade 3, B grade 0/unjudged, C grade 1); judgments also
    hold D at grade 2 (missed). Gains 2^g−1; discounts 1/log2(r+1)."""
    import math

    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        retrieval_metrics,
    )

    results = spark.createDataFrame(
        [(1, "A", 1), (1, "B", 2), (1, "C", 3)],
        "query_id int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, "A", 3), (1, "C", 1), (1, "D", 2), (1, "E", 0)],
        "query_id int, doc_id string, grade int",
    )
    row = retrieval_metrics(
        results, qrels, k=5, grade_col="grade"
    ).collect()[0]
    # E is grade 0: judged irrelevant, not part of n_rel
    assert (row.n_rel, row.n_hits) == (3, 2)
    assert row.recall_at_k == round(2 / 3, 6)
    assert row.reciprocal_rank == 1.0
    d = [int(round(1e12 / math.log2(r + 1))) for r in range(1, 6)]
    dcg = 7 * d[0] + 1 * d[2]          # A@1 gain 7, C@3 gain 1
    idcg = 7 * d[0] + 3 * d[1] + 1 * d[2]  # ideal: grades 3,2,1
    assert row.ndcg_at_k == round(dcg / idcg, 6)


def test_assemble_context_greedy_semantics(spark):
    """The assembler keeps candidates in rank order, skips any doc that
    would overflow, but KEEPS later docs that still fit individually —
    python-reference parity on a fixture built to exercise exactly that
    branch."""
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        assemble_context,
        bm25_search,
    )

    # engineered rank order A,B,C,D (BM25 tf/length norm): C is the
    # big mid-rank doc that overflows, D the later small one that fits
    rows = [
        (1, "spark " * 5 + "a " * 5),    # dl 10, tf 5 → rank 1
        (2, "spark " * 4 + "b " * 6),    # dl 10, tf 4 → rank 2
        (3, "spark " * 8 + "c " * 32),   # dl 40, tf 8 → rank 3 (big)
        (4, "spark " * 2 + "d " * 8),    # dl 10, tf 2 → rank 4 (small)
        (5, "no match here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hits = bm25_search(df, "text", "doc_id", ["spark"], top_k=10).collect()
    order = [
        r.doc_id
        for r in sorted(hits, key=lambda r: (-r.score, r.doc_id))
    ]
    dls = {r.doc_id: r.dl for r in hits}
    budget = dls[order[0]] + dls[order[1]] + dls[order[3]]  # skips order[2]
    assert dls[order[2]] > dls[order[3]]  # fixture sanity: big doc mid-rank
    got = assemble_context(
        df, "text", "doc_id", ["spark"], token_budget=budget, top_k=10
    ).collect()
    cum, want = 0, []
    for d in order:
        if cum + dls[d] <= budget:
            cum += dls[d]
            want.append((d, cum))
    assert [(r.doc_id, r.cum_tokens) for r in got] == want
    # the skip-individually branch fired: some doc was skipped while a
    # LATER-ranked doc was kept
    kept_ids = [r.doc_id for r in got]
    skipped_positions = [i for i, d in enumerate(order) if d not in kept_ids]
    kept_positions = [i for i, d in enumerate(order) if d in kept_ids]
    assert skipped_positions and max(kept_positions) > min(skipped_positions)
    assert [r.rank for r in got] == sorted(r.rank for r in got)


def test_assemble_context_edge_budgets(spark):
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        assemble_context,
    )

    df = spark.createDataFrame(
        [(1, "spark a b"), (2, "spark c")], ["doc_id", "text"]
    )
    assert (
        assemble_context(df, "text", "doc_id", ["spark"], token_budget=0).count()
        == 0
    )
    import pytest

    with pytest.raises(ValueError):
        assemble_context(df, "text", "doc_id", ["spark"], token_budget=-1)


def test_assemble_context_from_postings_equals_scan_twin(spark, tmp_path):
    """The serving-shape assembly law: packing bm25_search_postings
    hits equals assemble_context over the corpus EXACTLY (the two
    retrievers are bit-identical, so the greedy pack is too)."""
    from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
        assemble_context,
        assemble_context_from_hits,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        term_stats_batch,
    )

    docs = spark.createDataFrame(
        [
            (i, ("spark stream join " * (1 + i % 4)) + f"doc {i} filler text")
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    ts = str(tmp_path / "ts")
    term_stats_batch(docs, 0, ts, "text", "doc_id", with_postings=True)
    q = ["spark", "stream", "join"]
    want = [
        tuple(r)
        for r in assemble_context(
            docs, "text", "doc_id", q, token_budget=60, top_k=10
        ).collect()
    ]
    got = [
        tuple(r)
        for r in assemble_context_from_hits(
            bm25_search_postings(spark, q, ts, id_col="doc_id", top_k=10),
            "doc_id",
            60,
        ).collect()
    ]
    assert got == want and len(want) > 0


def test_context_assembly_indexed_self_check_is_true(spark, sf_dir):
    """r10 verdict task #4: the indexed RAG assembly's in-plan
    exact_match column (full-row equality vs the scan twin) must be
    all-true — pinned in pytest, not just observed in the sweep."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["context_assembly_indexed"](spark, sf_dir).collect()
    assert rows
    assert all(r.exact_match for r in rows)


def test_hybrid_serve_batch_equals_single_query_fusion(spark, sf_dir):
    """r11 batched-serving law: for a pinned query in the 32-query
    batch, the fused rows equal fusing the SINGLE-query serving halves
    (bm25_search_postings + ann_index_topk, same params) with the same
    RRF arithmetic — the amortized plan changes the cost, never the
    answer."""
    import __spark_entry__ as entrymod
    from spark_streaming_sql_s3_connector_spark.plans.pipeline_queries import (
        _ensure_ann_index,
        _ensure_postings_state,
        _serve_batch_queries,
    )
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        ann_index_topk,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
    )

    got_all = entrymod.queries()["hybrid_serve_batch"](spark, sf_dir).collect()
    qids = {r.query_id for r in got_all}
    assert len(qids) == 32 and all(
        sum(1 for r in got_all if r.query_id == q) <= 10 for q in qids
    )

    term_qs, vec_qs = _serve_batch_queries(spark, sf_dir)
    pin = "q05"
    got = [
        (r.doc_id, r.rrf_score, r.n_lists)
        for r in got_all
        if r.query_id == pin
    ]
    lex = bm25_search_postings(
        spark, term_qs[pin], _ensure_postings_state(spark, sf_dir),
        id_col="doc_id", top_k=20,
    ).collect()
    vec = dict(vec_qs)[pin]
    sem = ann_index_topk(
        spark, _ensure_ann_index(spark, sf_dir), vec, k=20, n_probe=16
    ).collect()
    rrf = {}
    for rank, r in enumerate(
        sorted(lex, key=lambda r: (-r.score, r.doc_id)), start=1
    ):
        rrf[r.doc_id] = rrf.get(r.doc_id, (0.0, 0))
        rrf[r.doc_id] = (rrf[r.doc_id][0] + 1.0 / (60 + rank), rrf[r.doc_id][1] + 1)
    for rank, r in enumerate(
        sorted(sem, key=lambda r: (-r.adc_score, r.neighbor_id)), start=1
    ):
        d = r.neighbor_id
        rrf[d] = rrf.get(d, (0.0, 0))
        rrf[d] = (rrf[d][0] + 1.0 / (60 + rank), rrf[d][1] + 1)
    want = sorted(
        ((d, round(s, 9), n) for d, (s, n) in rrf.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert got == want
