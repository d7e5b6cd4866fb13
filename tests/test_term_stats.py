"""Laws for the streaming BM25 statistics maintenance
(streaming/term_stats.py): incremental == batch, replay convergence,
compaction preservation, and serve-from-state == batch BM25."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.retrieval import bm25_search
from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
    bm25_search_indexed,
    compact_term_stats,
    read_corpus_stats,
    read_term_stats,
    term_stats_batch,
)

TERMS = ["spark", "join", "stream", "vector"]


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _batches(docs, n=3):
    """Disjoint doc-id thirds — the exactly-once upstream contract."""
    return [docs.where(F.col("doc_id") % n == i) for i in range(n)]


def _batch_stats(docs):
    from spark_streaming_sql_s3_connector_spark.functions.text import tokenize

    toks = tokenize(F.lower(F.col("text")))
    terms = {
        r.term: r.df
        for r in docs.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).alias("s"),
    ).collect()[0]
    return terms, int(tot.n), int(tot.s)


def test_incremental_stats_match_batch(spark, docs, tmp_path):
    sink = str(tmp_path / "ts")
    for i, b in enumerate(_batches(docs)):
        term_stats_batch(b, i, sink, "text", "doc_id")
    got_terms = {
        r.term: r.df for r in read_term_stats(spark, sink).collect()
    }
    tot = read_corpus_stats(spark, sink).collect()[0]
    want_terms, want_n, want_s = _batch_stats(docs)
    assert got_terms == want_terms
    assert (int(tot.n_docs), int(tot.sum_dl)) == (want_n, want_s)


def test_replay_converges_and_compaction_preserves(spark, docs, tmp_path):
    sink = str(tmp_path / "ts")
    batches = _batches(docs)
    for i, b in enumerate(batches):
        term_stats_batch(b, i, sink, "text", "doc_id")
    term_stats_batch(batches[1], 1, sink, "text", "doc_id")  # replay
    want_terms, want_n, want_s = _batch_stats(docs)
    assert {
        r.term: r.df for r in read_term_stats(spark, sink).collect()
    } == want_terms
    compact_term_stats(spark, sink)
    got_terms = {
        r.term: r.df for r in read_term_stats(spark, sink).collect()
    }
    tot = read_corpus_stats(spark, sink).collect()[0]
    assert got_terms == want_terms
    assert (int(tot.n_docs), int(tot.sum_dl)) == (want_n, want_s)
    # appends after compaction keep folding
    extra = docs.limit(0)
    term_stats_batch(extra, 7, sink, "text", "doc_id")
    assert {
        r.term: r.df for r in read_term_stats(spark, sink).collect()
    } == want_terms


def test_indexed_bm25_equals_batch_bm25(spark, docs, tmp_path):
    sink = str(tmp_path / "ts")
    for i, b in enumerate(_batches(docs)):
        term_stats_batch(b, i, sink, "text", "doc_id")
    want = [
        tuple(r)
        for r in bm25_search(docs, "text", "doc_id", TERMS, top_k=15).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_search_indexed(
            docs, "text", "doc_id", TERMS, sink, top_k=15
        ).collect()
    ]
    assert got == want
    compact_term_stats(spark, sink)
    got2 = [
        tuple(r)
        for r in bm25_search_indexed(
            docs, "text", "doc_id", TERMS, sink, top_k=15
        ).collect()
    ]
    assert got2 == want


def test_indexed_bm25_single_corpus_scan(spark, docs, tmp_path):
    """The point of the state: serving scans the corpus ONCE (batch
    bm25 pays a second stats scan)."""
    sink = str(tmp_path / "ts")
    term_stats_batch(docs, 0, sink, "text", "doc_id")
    plan = (
        bm25_search_indexed(docs, "text", "doc_id", TERMS, sink, top_k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert "Generate" not in plan and "Window" not in plan


def test_indexed_bm25_unknown_terms(spark, docs, tmp_path):
    sink = str(tmp_path / "ts")
    term_stats_batch(docs, 0, sink, "text", "doc_id")
    out = bm25_search_indexed(
        docs, "text", "doc_id", ["zzzznotaword"], sink
    ).collect()
    assert out == []
    with pytest.raises(ValueError):
        bm25_search_indexed(docs, "text", "doc_id", [], sink)


def test_streaming_term_stats_through_connector(spark, tmp_path, sf_dir):
    """End-to-end: docs arrive as files through the s3-connector source
    with a DUPLICATE re-delivery; stats equal the batch stats (the
    connector's exactly-once makes the one-batch-per-doc precondition
    hold)."""
    import os

    from spark_streaming_sql_s3_connector_spark.queueing.local import (
        LocalFileQueueClient,
    )
    from spark_streaming_sql_s3_connector_spark.sources.datasource import (
        register,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        streaming_term_stats,
    )

    register(spark)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    work = tmp_path / "work"
    data = work / "data"
    qdir = work / "q"
    sink = str(work / "ts")
    ckpt = str(work / "ckpt")
    os.makedirs(data)
    paths = []
    for i in range(3):
        p = str(data / f"part{i}.parquet")
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        paths.append(p)
    client = LocalFileQueueClient(f"local://{qdir}")
    for p in paths:
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                client.send_file_event(os.path.join(p, f), 1_700_000_000_000)
    # duplicate re-delivery of batch 0's file
    for f in os.listdir(paths[0]):
        if f.endswith(".parquet"):
            client.send_file_event(os.path.join(paths[0], f), 1_700_000_000_000)
    stream = (
        spark.readStream.format("s3-connector")
        .schema(docs.schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{qdir}")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.metadataPath", str(work / "meta"))
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .load()
    )
    q = streaming_term_stats(
        stream, sink, ckpt, "text", "doc_id", trigger_available_now=True
    )
    q.awaitTermination(120)
    want_terms, want_n, want_s = _batch_stats(docs)
    got = {r.term: r.df for r in read_term_stats(spark, sink).collect()}
    tot = read_corpus_stats(spark, sink).collect()[0]
    assert got == want_terms
    assert (int(tot.n_docs), int(tot.sum_dl)) == (want_n, want_s)


def test_postings_bm25_equals_indexed_bm25(spark, docs, tmp_path):
    """The zero-corpus-scan serve (postings state) must return the
    EXACT rows of the one-scan serve (and hence of batch bm25, by the
    law above): a posting row exists exactly when tf > 0, the df
    literals come from the same state, and the decimal arithmetic is
    shared — so the sums, ranks, and round-6 scores are bit-equal.
    Holds across batched builds, replay, and compaction."""
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        postings_exist,
    )

    sink = str(tmp_path / "ts")
    batches = _batches(docs)
    for i, b in enumerate(batches):
        term_stats_batch(b, i, sink, "text", "doc_id", with_postings=True)
    term_stats_batch(
        batches[2], 2, sink, "text", "doc_id", with_postings=True
    )  # replay overwrites, never double-counts
    assert postings_exist(sink)
    want = [
        tuple(r)
        for r in bm25_search_indexed(
            docs, "text", "doc_id", TERMS, sink, top_k=15
        ).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_search_postings(
            spark, TERMS, sink, id_col="doc_id", top_k=15
        ).collect()
    ]
    assert got == want
    compact_term_stats(spark, sink)
    got2 = [
        tuple(r)
        for r in bm25_search_postings(
            spark, TERMS, sink, id_col="doc_id", top_k=15
        ).collect()
    ]
    assert got2 == want


def test_postings_bm25_zero_corpus_scans(spark, docs, tmp_path):
    """The serving claim itself: every FileScan in the postings-serve
    plan reads state (postings parquet), never the corpus, and the
    term filter is pushed to the scan."""
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
    )

    sink = str(tmp_path / "ts")
    term_stats_batch(docs, 0, sink, "text", "doc_id", with_postings=True)
    plan = (
        bm25_search_postings(spark, TERMS, sink, id_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents.parquet" not in plan
    assert "postings" in plan
    assert "PushedFilters: [In(term" in plan
    assert "Generate" not in plan and "Window" not in plan


def test_postings_bm25_unknown_terms(spark, docs, tmp_path):
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
    )

    sink = str(tmp_path / "ts")
    term_stats_batch(docs, 0, sink, "text", "doc_id", with_postings=True)
    assert bm25_search_postings(spark, ["zzzznotaword"], sink).collect() == []
    with pytest.raises(ValueError):
        bm25_search_postings(spark, [], sink)


def test_streaming_postings_through_connector(spark, tmp_path, sf_dir):
    """End-to-end with the opt-in postings table: docs arrive through
    the s3-connector source (with a duplicate re-delivery),
    streaming_term_stats maintains postings, and the zero-corpus-scan
    serve equals batch BM25 over the admitted union."""
    import os

    from spark_streaming_sql_s3_connector_spark.queueing.local import (
        LocalFileQueueClient,
    )
    from spark_streaming_sql_s3_connector_spark.sources.datasource import (
        register,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        streaming_term_stats,
    )

    register(spark)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    work = tmp_path / "work"
    data = work / "data"
    qdir = work / "q"
    sink = str(work / "ts")
    ckpt = str(work / "ckpt")
    os.makedirs(data)
    paths = []
    for i in range(2):
        p = str(data / f"part{i}.parquet")
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        paths.append(p)
    client = LocalFileQueueClient(f"local://{qdir}")
    for p in paths:
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                client.send_file_event(os.path.join(p, f), 1_700_000_000_000)
    for f in os.listdir(paths[0]):  # duplicate re-delivery
        if f.endswith(".parquet"):
            client.send_file_event(os.path.join(paths[0], f), 1_700_000_000_000)
    stream = (
        spark.readStream.format("s3-connector")
        .schema(docs.schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", f"local://{qdir}")
        .option("spark.s3conn.queueType", "local")
        .option("spark.s3conn.metadataPath", str(work / "meta"))
        .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
        .load()
    )
    q = streaming_term_stats(
        stream, sink, ckpt, "text", "doc_id",
        trigger_available_now=True, with_postings=True,
    )
    q.awaitTermination(120)
    want = [
        tuple(r)
        for r in bm25_search(docs, "text", "doc_id", TERMS, top_k=10).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_search_postings(
            spark, TERMS, sink, id_col="doc_id", top_k=10
        ).collect()
    ]
    assert got == want


def test_delete_equals_rebuild_over_survivors(spark, docs, tmp_path):
    """The lexical delete law: after deleting a subset (negative
    df/corpus deltas + postings markers), the zero-scan serve equals
    batch BM25 over the SURVIVING corpus exactly — stats AND rankings —
    pre- and post-compaction (compaction applies markers physically and
    GCs their dirs)."""
    import os as _os

    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        delete_docs_from_term_stats,
    )

    sink = str(tmp_path / "ts")
    batches = _batches(docs)
    for i, b in enumerate(batches):
        term_stats_batch(b, i, sink, "text", "doc_id", with_postings=True)
    dead = docs.where(F.col("doc_id") % 5 == 0)
    survivors = docs.where(F.col("doc_id") % 5 != 0)
    delete_docs_from_term_stats(dead, 3, sink, "text", "doc_id")
    delete_docs_from_term_stats(dead, 3, sink, "text", "doc_id")  # replay
    want_terms, want_n, want_s = _batch_stats(survivors)
    got_terms = {
        r.term: r.df
        for r in read_term_stats(spark, sink).collect()
        if r.df != 0
    }
    tot = read_corpus_stats(spark, sink).collect()[0]
    assert got_terms == want_terms
    assert (int(tot.n_docs), int(tot.sum_dl)) == (want_n, want_s)
    want = [
        tuple(r)
        for r in bm25_search(survivors, "text", "doc_id", TERMS, top_k=15).collect()
    ]
    got = [
        tuple(r)
        for r in bm25_search_postings(
            spark, TERMS, sink, id_col="doc_id", top_k=15
        ).collect()
    ]
    assert got == want
    dead_ids = {r.doc_id for r in dead.select("doc_id").collect()}
    assert not dead_ids & {r[0] for r in got}
    compact_term_stats(spark, sink)
    got2 = [
        tuple(r)
        for r in bm25_search_postings(
            spark, TERMS, sink, id_col="doc_id", top_k=15
        ).collect()
    ]
    assert got2 == want
    # markers applied physically + GC'd
    assert not _os.path.isdir(_os.path.join(sink, "deleted", "batch=3"))


def test_delete_then_reinsert_serves_again(spark, docs, tmp_path):
    """Ordering law (same as the ANN tombstones): a delete at batch t
    kills rows inserted before t; re-inserting the doc at a LATER batch
    revives it immediately — no compaction needed — and the stats nets
    back to the full corpus."""
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        delete_docs_from_term_stats,
    )

    sink = str(tmp_path / "ts")
    term_stats_batch(docs, 0, sink, "text", "doc_id", with_postings=True)
    top1 = bm25_search_postings(
        spark, TERMS, sink, id_col="doc_id", top_k=1
    ).collect()[0]
    victim = docs.where(F.col("doc_id") == top1.doc_id)
    delete_docs_from_term_stats(victim, 1, sink, "text", "doc_id")
    after_del = bm25_search_postings(
        spark, TERMS, sink, id_col="doc_id", top_k=15
    ).collect()
    assert top1.doc_id not in {r.doc_id for r in after_del}
    term_stats_batch(victim, 2, sink, "text", "doc_id", with_postings=True)
    revived = bm25_search_postings(
        spark, TERMS, sink, id_col="doc_id", top_k=15
    ).collect()
    assert revived[0].doc_id == top1.doc_id
    assert revived[0].score == top1.score  # stats netted back exactly
    compact_term_stats(spark, sink)
    assert bm25_search_postings(
        spark, TERMS, sink, id_col="doc_id", top_k=1
    ).collect()[0].doc_id == top1.doc_id


def test_compaction_tolerates_stray_base_entries(spark, docs, tmp_path):
    """ADVICE r10: the superseded-base GC must skip unparsable v= names
    (a stray editor/tool artifact) instead of aborting compaction after
    the pointer flip — the _marker_ids/_delta_ids tolerance."""
    import os

    sink = str(tmp_path / "ts")
    for i, b in enumerate(_batches(docs)):
        term_stats_batch(b, i, sink, "text", "doc_id")
    compact_term_stats(spark, sink)
    for sub in ("terms", "corpus", "postings"):
        os.makedirs(os.path.join(sink, sub, "base", "v=tmp.bak"), exist_ok=True)
    term_stats_batch(docs.limit(0), 7, sink, "text", "doc_id")
    compact_term_stats(spark, sink)  # must not raise
    want_terms, want_n, want_s = _batch_stats(docs)
    assert {
        r.term: r.df for r in read_term_stats(spark, sink).collect()
    } == want_terms
    tot = read_corpus_stats(spark, sink).collect()[0]
    assert (int(tot.n_docs), int(tot.sum_dl)) == (want_n, want_s)


def test_postings_batch_equals_single_query_path(spark, docs, tmp_path):
    """r11 batch serving law: bm25_search_postings_batch returns, per
    query, EXACTLY the single-query bm25_search_postings rows (same df
    literals, same contrib decimals, same round-6, same tie order) —
    including a query with partially-dead terms and one with no live
    terms at all (no rows, like the single-query empty frame)."""
    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        bm25_search_postings_batch,
    )

    sink = str(tmp_path / "ts")
    for i, b in enumerate(_batches(docs)):
        term_stats_batch(b, i, sink, "text", "doc_id", with_postings=True)
    queries = {
        "q0": ["spark", "join"],
        "q1": ["stream", "vector", "zzznosuchterm"],
        "q2": ["spark", "stream", "vector", "join"],
        "q3": ["zzznosuchterm"],  # nothing live → no rows
    }
    got = {}
    batch = bm25_search_postings_batch(
        spark, queries, sink, id_col="doc_id", top_k=12
    )
    for r in batch.collect():
        got.setdefault(r.query_id, []).append(
            (r.doc_id, r.score, r.n_matched, r.dl)
        )
    for q, terms in queries.items():
        want = [
            (r.doc_id, r.score, r.n_matched, r.dl)
            for r in bm25_search_postings(
                spark, terms, sink, id_col="doc_id", top_k=12
            ).collect()
        ]
        assert got.get(q, []) == want, q
    assert "q3" not in got


def test_postings_batch_plans_flat_at_large_term_counts(spark, docs, tmp_path):
    """r12: the batch path ships per-term df on a broadcast (term, df)
    join — a 256-query / ~2k-distinct-term batch must PLAN without
    expression-depth or literal-size blowup (the pre-r12 chained CASE
    WHEN grew O(|terms|) and collected every term's df to the driver).
    Assert the plan materializes fast, contains the broadcast join and
    no per-term literal chain, and a spot-checked query still equals
    the single-query path."""
    import time

    from spark_streaming_sql_s3_connector_spark.streaming.term_stats import (
        bm25_search_postings,
        bm25_search_postings_batch,
    )

    sink = str(tmp_path / "ts")
    for i, b in enumerate(_batches(docs)):
        term_stats_batch(b, i, sink, "text", "doc_id", with_postings=True)
    # ~2k distinct synthetic terms (mostly corpus-dead — liveness is
    # plan-side now) spread over 256 queries, plus live anchors
    queries = {
        f"q{i}": [f"synthterm{i * 8 + j}" for j in range(8)] + [TERMS[i % 4]]
        for i in range(256)
    }
    t0 = time.monotonic()
    out = bm25_search_postings_batch(spark, queries, sink, id_col="doc_id", top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    elapsed = time.monotonic() - t0
    assert elapsed < 30, f"planning took {elapsed:.1f}s"
    assert plan.count("BroadcastHashJoin") >= 2  # (term,df) + pair table
    # df rides the join, not a per-term literal chain (the In(term,…)
    # pruning filter is the only place terms legitimately enter the plan)
    assert "CASE WHEN" not in plan
    got = [
        (r.doc_id, r.score, r.n_matched, r.dl)
        for r in out.where(F.col("query_id") == "q0").drop("query_id").collect()
    ]
    want = [
        (r.doc_id, r.score, r.n_matched, r.dl)
        for r in bm25_search_postings(
            spark, queries["q0"], sink, id_col="doc_id", top_k=5
        ).collect()
    ]
    assert got == want
