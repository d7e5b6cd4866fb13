"""Benchmark harness: headline queries + streaming-ingest comparison.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "total_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The ``queries`` map holds per-query wall seconds; ``ingest_connector`` /
``ingest_file_source`` time the s3-connector stream vs Spark's stock
listing-based file stream over the same files + sink — the reference's own
comparator (FileSourceConsumer.scala:25-60). ``ingest_connector_jvm``
times the MicroBatchOrchestrator hybrid (same admission, JVM vectorized
batch reads) — the stated 100 TB deployment shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
# one BLAS thread per process — Spark runs one task per core already;
# threaded OpenBLAS inside 32 concurrent workers oversubscribes and
# costs 10-20x on the small per-batch gemms (see __spark_entry__.py,
# which sets the same default for the driver gate; guide §1.2). Workers
# inherit the env in local mode; on a cluster this is
# spark.executorEnv.OPENBLAS_NUM_THREADS=1.
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "b1_lineitem_count",
    "b5_filter",
    "b6_agg",
    "b7_join",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "tpch_q4ish",
    "tpch_q6ish",
    "tpch_q10ish",
    "tpch_q18ish",
    "window_top_orders",
    "rollup_sales",
    "cube_orders",
    "set_ops_customers",
    "ntile_deciles",
    "events_sliding_30m",
    "funnel_conversion",
    "events_by_type_hour",
    "semi_anti_join",
    "dedup_exact_docs",
    "dedup_minhash_docs",
    "dedup_simhash_docs",
    "dedup_ngram_jaccard_docs",
    "dedup_embedding_pairs",
    "dedup_embedding_lsh_pairs",
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "sessionize_batch",
    "connector_batch_read",
    "text_stats_docs",
    "top_bigrams_docs",
    "text_fingerprint_docs",
    "lang_id_docs",
    "quality_score_docs",
    "corpus_curation",
    "multimodal_image_stats",
    "multimodal_audio_stats",
    "multimodal_frame_sample",
    # added in round 2 (keys are append-only so BENCH_r{N} stays a superset
    # of BENCH_r{N-1} and regressions are visible round-over-round)
    "b2_lineitem_distinct",
    "b3_orders_count",
    "b4_projection",
    "b8_partition_min_date",
    "tpch_q12ish",
    "tpch_q14ish",
    "grouping_sets_events",
    "lag_increases_events",
    "pivot_status_priority",
    "rolling_7d_events",
    "corr_scalar_subquery",
    "except_all_lineitems",
    "dedup_keep_best_docs",
    "sample_docs",
    "dedup_cluster_docs",
    "frequent_event_types",
    "sketch_events_profile",
    "multimodal_media_stats",
    "asof_view_click",
    "range_join_error_context",
    "stratified_sample_docs",
    "value_quantiles_by_type",
    "events_time_bucket_rollup",
    # added in round 4: fused window slots (each packs 2-3 oracle-backed
    # behaviors into one driver-verified registry entry)
    "text_profile_docs",
    "decontaminate_docs",
    "sampling_docs_combined",
    "events_value_profile",
    "temporal_join_profile",
    "connector_pushdown_read",
    "repetition_docs",
    "chunk_docs",
    "redact_docs",
    # added in round 5: bloom history screen, sequence packing, data
    # mixing, and the fused text-transform/similarity window slots
    "bloom_dedup_docs",
    "pack_concat_docs",
    "pack_first_fit_docs",
    "mix_corpus_docs",
    "text_transform_profile",
    "similarity_recall_profile",
    "multimodal_profile",
    "web_clean_docs",
    "tpch_q7ish",
    "tpch_q20ish",
    "sequence_manifest_docs",
    "materialize_sequences_docs",
    # added in round 6: keep-first line dedup (standalone view of the
    # behavior fused into web_clean_docs) and near-dup keep-best curation
    "dedup_lines_docs",
    "near_dup_keep_best_docs",
    "normalize_docs",
    "quality_gate_docs",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "bpe_tokenize_docs",
    # added in round 7: the persisted-index ANN serving shape (first rep
    # builds the disk-cached index; the median therefore measures SERVE
    # time — the number to compare against ann_ivf_pq_topk's
    # train-per-call wall)
    "ann_index_topk",
    # r7: the composed curation pipeline's batch twin (line dedup →
    # exact dedup → gate → pack, one job)
    "curation_pipeline_docs",
    # r7: IVF-cell near-dup pairs (structure-adaptive SemDeDup shape,
    # in-slot planted-recall check)
    "dedup_embedding_ivf_pairs",
    # r7: unigram-LM perplexity filter (decimal-sum oracle parity)
    "perplexity_docs",
    # r7: subquery-decorrelation evidence
    "tpch_q21ish",
    "tpch_q22ish",
    # r7: remaining multi-join shapes (market share / profit / left-join
    # count distribution)
    "tpch_q8ish",
    "tpch_q9ish",
    "tpch_q13ish",
    # r7: final six — all 22 TPC-H shapes now benched
    "tpch_q2ish",
    "tpch_q11ish",
    "tpch_q15ish",
    "tpch_q16ish",
    "tpch_q17ish",
    "tpch_q19ish",
    # r8: the 100 TB quality-gate shape (approx_percentile thresholds,
    # no per-stratum sort) — regression tracking for the scale path the
    # registered exact gate (quality_gate_docs) deliberately avoids
    "quality_gate_approx_docs",
    # r8: batch ANN serving (8 queries, one job) — bench median vs
    # 8× ann_index_topk shows the amortization; first rep may build
    # the shared disk-cached index like ann_index_topk's
    "ann_index_batch_topk",
    # r8: cross-document passage dedup (repeated 5-gram span removal)
    "passage_dedup_docs",
    # r8: source/domain-level curation (per-source stats → gate →
    # broadcast-semi-join filter)
    "source_curation_docs",
    # r8: one-pass per-column dataset profile (exact-distinct oracle
    # mode; the HLL no-Expand mode is plan-pinned in tests)
    "table_profile_docs",
    # r8: corpus-version regression gates — membership diff (hash-
    # narrowed full outer join) and share/PSI drift profiles
    "snapshot_diff_docs",
    "drift_profile_docs",
    # r8: leakage-free group-keyed splits (scan-local hash filter)
    "group_split_docs",
    # r8: online SemDeDup against the persisted index (shares the
    # disk-cached index with ann_index_topk; median measures the
    # pruned-scan screen)
    "ann_semantic_dedup",
    # r8: inter-source shingle-overlap matrix (one (group, gram)
    # distinct shuffle + shingle-keyed pair agg)
    "source_overlap_docs",
    # r8: closed-form distributed NB classifier (train+score, decimal
    # FP-parity vs the DuckDB mirror)
    "nb_classifier_docs",
    # r8: deterministic training-order shuffle (one windowed shuffle,
    # order-sensitive oracle)
    "shuffle_shards_docs",
    # r8: embedding hygiene stats (scan-local array folds + one
    # |labels|×dim centroid partial-agg; decimal exact mode)
    "embedding_stats_docs",
    # r8: profile-derived dataset fingerprint (one profile pass)
    "dataset_fingerprint_docs",
    # r8: bigram stupid-backoff perplexity (order-aware text filter)
    "bigram_perplexity_docs",
    # r8: temperature mixture resampling (alpha-shares + hash filter)
    "temperature_mix_docs",
    # r8: lexical retrieval — BM25 (scan-local tf, zero corpus shuffle)
    # and per-doc TF-IDF keywords (explode + WindowGroupLimit)
    "bm25_search_docs",
    "tfidf_keywords_docs",
    # r8: hard-negative mining (broadcast query batch × one corpus
    # scan, WindowGroupLimit per-query top-k)
    "hard_negatives_docs",
    # r8: DSIR importance resampling (two LM trains + broadcast delta
    # join + md5-Gumbel TakeOrdered)
    "dsir_resample_docs",
    # r8: cluster-balanced subset selection (bounded KMeans train +
    # scan-local assign + WindowGroupLimit quota)
    "cluster_balanced_docs",
    # r8: Gopher rule gate (scan-local integer booleans, zero shuffle)
    "gopher_gate_docs",
    # r8: hybrid retrieval (BM25 ∪ cosine lists, RRF fusion)
    "hybrid_search_docs",
    # r8: C4 doc-level rule gate (scan-local booleans, zero shuffle)
    "c4_gate_docs",
    # r8: surgical span decontamination (broadcast bench grams; only
    # contaminated (doc, pos) rows shuffle; JVM piece rebuild)
    "span_decontaminate_docs",
    # r8: length-bucketed padded-batch assignment (one synthetic-strata
    # window shuffle of (id, len) rows + batch-keyed partial agg)
    "length_buckets_docs",
    # r8: PCA/whitening embedding post-processing (one-pass partial
    # Gram fit + scan-local JVM projection)
    "pca_embeddings",
    # r8: zlib compressibility signal (one Arrow-batched scan)
    "compression_signal_docs",
    # r8: tokenizer fertility profile (one scan + |langs|-row agg)
    "tokenizer_fertility_docs",
    # r8: UniMax epoch-capped mixture (broadcast plan + scan-local
    # explode replication)
    "unimax_mix_docs",
    # r8: late-r8 surface composed end-to-end (gates → dedup →
    # UniMax → length buckets, one CTE oracle)
    "published_pipeline_docs",
    # r8: TREC-style IR evaluation (broadcast queries × one scan +
    # corpus-independent metric joins)
    "retrieval_eval_embeddings",
    # r9: graded-gain twin (same run, TREC-graded qrels, 2^rel-1 gains)
    "retrieval_eval_graded",
    # r9: bipartite near-dup screen (cross-side-only candidate explode)
    "cross_corpus_dedup_docs",
    # r9: blocked fuzzy join (prefix-block equi-join + capped levenshtein)
    "fuzzy_match_docs",
    # r9: composed refresh flow (exact + near-dup screens + accounting)
    "corpus_refresh_docs",
    # r9: LSH scale path of the bipartite screen
    "cross_corpus_minhash_docs",
    # r9: int8 embedding quantization (scan-local, zero shuffles)
    "quantize_embeddings_docs",
    # r9: embedding-modality drift (per-dim decimal-exact moments)
    "embedding_drift_docs",
    # r9: RAG context assembly (retrieval -> token-budget packing)
    "context_assembly_docs",
    # r9: serving-shape hybrid search (persisted term-stats BM25 — one
    # corpus scan — fused with persisted-index ANN — zero corpus scans);
    # compare against hybrid_search_docs' scan-twin median for the
    # amortization win
    "hybrid_search_indexed",
    # r10: previously-unbenched registry keys now tracked so every key
    # has a wall history (r9 verdict task #8)
    # labeled quadratic exact baseline of the dedup-cluster family —
    # benched to keep the (deliberate) quadratic cost visible
    "dedup_cluster_exact_edges",
    # streaming term-stats lifecycle (4 batch writes + compaction into
    # a fresh tempdir + one-scan serve) — mostly orchestration wall but
    # cheap enough (~9 s) to keep a history
    "streaming_bm25_docs",
    # streaming profile lifecycle (3 batch writes + state read, ~3 s)
    "streaming_profile_docs",
    # r10: serving-shape context assembly (zero-scan postings BM25 →
    # greedy pack; first rep may build the disk-cached state — the
    # median measures serve)
    "context_assembly_indexed",
    # r10: serve-only walls of the indexed serving paths (r9 verdict
    # task #3). The composite keys (hybrid_search_indexed,
    # ann_index_topk, streaming_bm25_docs) include state builds and
    # ground-truth self-check twins in their medians; these three are
    # the steady-state serving floors — the numbers that must stay
    # FLAT as the corpus grows (SCALING carries the sf sweep).
    "bm25_indexed_serve_only",
    "ann_topk_serve_only",
    "hybrid_serve_only",
    # r11: the zero-scan lexical floor (pairs with
    # bm25_indexed_serve_only: flat-vs-linear, both sides measured) and
    # the 32-query batched serving shape (read wall/32 against the
    # single-query serve-only keys for the amortization factor)
    "bm25_postings_serve_only",
    "hybrid_serve_batch",
    # r13 (replaces r12's curation_trigger_serve_only here): ONE
    # replayed incremental-curation trigger against prewarmed state,
    # with NOTHING else in the timed plan — the r12 key's wall was part
    # probe (its load-bearing trigger_ok recompute: a full-outer join
    # against the recomputed frozen gate), the same
    # self-check-dominates-the-wall shape that excluded
    # curation_incremental_docs. The probe stays load-bearing in the
    # sweep via curation_trigger_serve_only; this key is the pure
    # steady-state trigger. Job-count dominated, so expect near-flat
    # in sf; per-stage attribution persists under _timings
    # (read_trigger_timings).
    "curation_trigger_bare",
    # r13: one forced lifecycle retrain against the prewarmed folded
    # vectors plane — the post-fold drift-refresh wall (fold + IVF-PQ
    # rebuild + pointer flip); tracks corpus size, not trigger count
    "ann_refresh_bare",
    # DELIBERATE EXCLUSIONS (every other registry key is benched):
    # - curation_trigger_serve_only (r13): the trigger + trigger_ok
    #   correctness probe composite — the probe is sweep duty, not a
    #   serving cost; the pure trigger wall is curation_trigger_bare
    #   above.
    # - streaming_exact_dedup_docs: three sequential foreachBatch-style
    #   jobs (~17 s of fixed orchestration) — would dominate the bench
    #   without measuring any per-row cost other keys don't cover.
    # - streaming_line_dedup_docs / streaming_passage_dedup_docs: same
    #   shape, heavier (~30 s+ each at sf0.1) — pure orchestration wall;
    #   their per-row costs are covered by dedup_lines_docs /
    #   passage_dedup_docs and the incremental==batch law tests.
    # - curation_incremental_docs (r11): ~60 s lifecycle build on first
    #   touch of a corpus + a ~9 s warm wall DOMINATED by its full-corpus
    #   frozen-twin self-check (re-scoring every survivor with the
    #   6-regexp quality gate) — a correctness probe, not a serving cost.
    #   Its per-row serving costs are exactly the packing/screen keys
    #   already benched; the composed law is pinned by the key's
    #   load-bearing incremental_ok column in the sweep and by
    #   test_streaming_curation's connector e2e. The STEADY-STATE
    #   per-trigger wall is benched since r12 as
    #   curation_trigger_serve_only (one replayed trigger against the
    #   prewarmed state — r11 verdict Next #5).
    # - ann_lifecycle_docs (r11): a full bootstrap-build + 4-batch
    #   streamed lifecycle + compaction per call (~24 s at sf0.01) —
    #   orchestration wall by construction. Its serving floor is
    #   ann_topk_serve_only (benched, flat); its drift-refresh laws are
    #   pytest (test_ann_lifecycle) + the key's load-bearing
    #   refresh_ok/landed_ok bits in the sweep.
]

N_INGEST_FILES = 32


def bench_streaming_ingest(spark, sf_dir: str, rep: int = 0) -> dict[str, float]:
    """Time ingesting the events table split into N files: s3-connector
    (queue-driven) vs stock parquet file stream (listing-driven)."""
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.plans.io import load_table
    from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    work = tempfile.mkdtemp(prefix="s3conn-bench-")
    out = {}
    try:
        data_dir = os.path.join(work, "files")
        ev = load_table(spark, sf_dir, "lineitem")
        ev.repartition(N_INGEST_FILES).write.mode("overwrite").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        schema = ev.schema
        # one tiny warmup file per pipeline, delivered through the RUNNING
        # stream before the timed batch (r12): the first trigger of a fresh
        # stream pays one-time machinery (offset bookkeeping init, sink
        # setup, stock source's first LIST) that a long-running ingest
        # amortizes away — without this the rep-0 median mixes first-stream
        # cost into the steady-state ratio (measured swing: in-run ratio
        # 0.74 on a cold rep vs 1.0-1.8 warm, same session). Both sides
        # get the same extra file, so the row-mismatch probe still holds.
        warm_dir = os.path.join(work, "warmfile")
        ev.limit(1).coalesce(1).write.mode("overwrite").parquet(warm_dir)
        warm_file = next(
            os.path.join(warm_dir, f)
            for f in sorted(os.listdir(warm_dir))
            if f.endswith(".parquet")
        )

        # pre-warm the Python worker pool (interpreter + pyarrow import is a
        # fixed per-worker cost that a long-running stream amortizes away;
        # without this the first trigger measures cold-start, not ingest)
        warm = (
            spark.read.format("s3-connector")
            .schema(schema)
            .option("spark.s3conn.fileFormat", "parquet")
            .option("spark.s3conn.queueUrl", "warmup")
            .option("spark.s3conn.queueType", "local")
            .option("paths", ",".join(files))
            .load()
        )
        warm.count()

        # Steady-state measurement for BOTH pipelines: start the stream on
        # an empty source, drain, then deliver the files and time until
        # processed — matching the reference's continuous perf harness
        # (DataConsumer: long-running stream, 15 s cadence) rather than
        # counting one-time query-startup machinery as ingest cost.

        # --- s3-connector ingest ---
        qdir = os.path.join(work, "queue")
        q = LocalFileQueueClient(f"local://{qdir}")
        stream = (
            spark.readStream.format("s3-connector")
            .schema(schema)
            .option("spark.s3conn.fileFormat", "parquet")
            .option("spark.s3conn.queueUrl", f"local://{qdir}")
            .option("spark.s3conn.queueType", "local")
            .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
            .option("spark.s3conn.maxFilesPerTrigger", "-1")
            .option("spark.s3conn.metadataPath", os.path.join(work, "meta"))
            .load()
        )
        # per-rep query/table names + try/finally stop: a throw mid-rep must
        # not leak an active memory-sink query that poisons later reps (the
        # leaked stream would also poll the temp dir removed below)
        conn_name = f"bench_conn_{rep}"
        query = (
            stream.groupBy("l_returnflag")
            .agg(F.count("*").alias("cnt"))
            .writeStream.format("memory")
            .queryName(conn_name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt1"))
            .start()
        )
        try:
            query.processAllAvailable()  # stream is up, queue empty
            q.send_file_event(warm_file, int(time.time() * 1000))
            query.processAllAvailable()  # first-trigger machinery, unmeasured
            now = int(time.time() * 1000)
            for f in files:
                q.send_file_event(f, now)
            t0 = time.time()
            query.processAllAvailable()
            out["ingest_connector"] = round(time.time() - t0, 3)
            n1 = spark.sql(f"SELECT SUM(cnt) c FROM {conn_name}").collect()[0].c
        finally:
            query.stop()

        # --- JVM-read orchestrator ingest (the stated 100 TB deployment
        # shape: same admission controller, batches read with Spark's own
        # vectorized JVM parquet reader instead of the Python Data Source's
        # Arrow path; see streaming/orchestrator.py). Runs BEFORE the stock
        # block, which consumes `files` by rename. Same warmed discipline:
        # drain empty, deliver one warm file un-timed, then time the batch.
        from spark_streaming_sql_s3_connector_spark.streaming.orchestrator import (
            MicroBatchOrchestrator,
        )

        qdir_jvm = os.path.join(work, "queue-jvm")
        q_jvm = LocalFileQueueClient(f"local://{qdir_jvm}")
        orch = MicroBatchOrchestrator(
            spark,
            {
                "spark.s3conn.fileFormat": "parquet",
                "spark.s3conn.queueUrl": f"local://{qdir_jvm}",
                "spark.s3conn.queueType": "local",
                "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
                "spark.s3conn.maxFilesPerTrigger": "-1",
            },
            os.path.join(work, "meta-jvm"),
            queue_client=q_jvm,
        )
        jvm_counts: dict[str, int] = {}

        def _process(df, _bid):
            for r in df.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect():
                jvm_counts[r.l_returnflag] = jvm_counts.get(r.l_returnflag, 0) + r.cnt

        try:
            orch.run_available(schema, _process)  # queue empty: 0 batches
            q_jvm.send_file_event(warm_file, int(time.time() * 1000))
            orch.run_available(schema, _process)  # first-trigger machinery
            now = int(time.time() * 1000)
            for f in files:
                q_jvm.send_file_event(f, now)
            t0 = time.time()
            orch.run_available(schema, _process)
            out["ingest_connector_jvm"] = round(time.time() - t0, 3)
            n3 = sum(jvm_counts.values())
        finally:
            orch.close()

        # --- stock file stream source, same pipeline ---
        watch_dir = os.path.join(work, "watched")
        os.makedirs(watch_dir)
        stream2 = spark.readStream.schema(schema).parquet(watch_dir)
        fss_name = f"bench_fss_{rep}"
        query2 = (
            stream2.groupBy("l_returnflag")
            .agg(F.count("*").alias("cnt"))
            .writeStream.format("memory")
            .queryName(fss_name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt2"))
            .start()
        )
        try:
            query2.processAllAvailable()  # stream is up, dir empty
            shutil.copy(warm_file, os.path.join(watch_dir, "warm.parquet"))
            query2.processAllAvailable()  # first-trigger machinery, unmeasured
            for f in files:
                os.rename(f, os.path.join(watch_dir, os.path.basename(f)))
            t0 = time.time()
            query2.processAllAvailable()
            out["ingest_file_source"] = round(time.time() - t0, 3)
            n2 = spark.sql(f"SELECT SUM(cnt) c FROM {fss_name}").collect()[0].c
        finally:
            query2.stop()
        # 0.0 on match so the metric's median covers every rep, not just
        # mismatching ones (a single-rep glitch would otherwise read as
        # the consistent median)
        out["ingest_row_mismatch"] = float(abs((n1 or 0) - (n2 or 0)))
        out["ingest_jvm_row_mismatch"] = float(abs((n1 or 0) - (n3 or 0)))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


N_SMALL_FILES = 400
SMALL_FILE_ROWS = 200


def bench_many_small_files(spark, rep: int = 0) -> dict[str, float]:
    """Many-small-files ingest at the reference perf harness's shape:
    the reference drives maxFilesPerTrigger=5000 over large file counts
    (DataConsumer.scala:28); here N_SMALL_FILES tiny parquet files go
    through the s3-connector (queue-driven, no LIST), the JVM-read
    MicroBatchOrchestrator (the stated 100 TB deployment shape — same
    admission, Spark's vectorized reader), and the stock file stream
    (directory listing) — the regime where listing cost dominates and
    the connector's design advantage is largest. Files are written
    driver-side with pyarrow (N Spark write tasks would time the
    writer, not the ingest). r14: runs as a 3-rep median over 400-file
    populations instead of one 1,000-file shot — the r12→r13 verdicts
    flagged a 3x swing on the n=1 measurement; same total bench wall,
    but the headline small_files_ratio now rests on a median."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    register(spark)
    work = tempfile.mkdtemp(prefix="s3conn-bench-smallfiles-")
    out = {}
    try:
        data_dir = os.path.join(work, "files")
        os.makedirs(data_dir)
        for i in range(N_SMALL_FILES):
            base = i * SMALL_FILE_ROWS
            t = pa.table(
                {
                    "id": pa.array(range(base, base + SMALL_FILE_ROWS), type=pa.int64()),
                    "v": pa.array(
                        [((base + j) % 97) / 7.0 for j in range(SMALL_FILE_ROWS)],
                        type=pa.float64(),
                    ),
                }
            )
            pq.write_table(t, os.path.join(data_dir, f"part-{i:05d}.parquet"))
        files = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        schema = "id BIGINT, v DOUBLE"
        # one extra tiny file per pipeline, delivered through the RUNNING
        # stream before the timed batch (same warmed-stream discipline as
        # bench_streaming_ingest): every side pays first-trigger machinery
        # un-timed, and every side counts the same extra rows, so the
        # row-mismatch probes still hold
        warm_file = os.path.join(work, "warm.parquet")
        pq.write_table(
            pa.table({"id": pa.array([10**9], type=pa.int64()),
                      "v": pa.array([0.0], type=pa.float64())}),
            warm_file,
        )

        # warm the Python worker pool (same rationale as bench_streaming_ingest)
        warm = (
            spark.read.format("s3-connector")
            .schema(schema)
            .option("spark.s3conn.fileFormat", "parquet")
            .option("spark.s3conn.queueUrl", "warmup")
            .option("spark.s3conn.queueType", "local")
            .option("paths", ",".join(files[:32]))
            .load()
        )
        warm.count()

        # --- s3-connector: queue-driven, no directory listing ---
        qdir = os.path.join(work, "queue")
        q = LocalFileQueueClient(f"local://{qdir}")
        stream = (
            spark.readStream.format("s3-connector")
            .schema(schema)
            .option("spark.s3conn.fileFormat", "parquet")
            .option("spark.s3conn.queueUrl", f"local://{qdir}")
            .option("spark.s3conn.queueType", "local")
            .option("spark.s3conn.queueFetchWaitTimeoutSeconds", "1")
            .option("spark.s3conn.maxFilesPerTrigger", "5000")
            .option("spark.s3conn.metadataPath", os.path.join(work, "meta"))
            .load()
        )
        conn_name = f"bench_small_conn_{rep}"
        query = (
            stream.agg(F.count("*").alias("cnt"), F.sum("id").alias("sid"))
            .writeStream.format("memory")
            .queryName(conn_name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt1"))
            .start()
        )
        try:
            query.processAllAvailable()  # stream is up, queue empty
            q.send_file_event(warm_file, int(time.time() * 1000))
            query.processAllAvailable()  # first-trigger machinery, unmeasured
            now = int(time.time() * 1000)
            for f in files:
                q.send_file_event(f, now)
            t0 = time.time()
            query.processAllAvailable()
            out["ingest_many_small_files_connector"] = round(time.time() - t0, 3)
            n1 = spark.sql(f"SELECT SUM(cnt) c FROM {conn_name}").collect()[0].c
        finally:
            query.stop()

        # --- JVM-read orchestrator over the same files (runs BEFORE the
        # stock block, which consumes `files` by rename) ---
        from spark_streaming_sql_s3_connector_spark.streaming.orchestrator import (
            MicroBatchOrchestrator,
        )

        qdir_jvm = os.path.join(work, "queue-jvm")
        q_jvm = LocalFileQueueClient(f"local://{qdir_jvm}")
        orch = MicroBatchOrchestrator(
            spark,
            {
                "spark.s3conn.fileFormat": "parquet",
                "spark.s3conn.queueUrl": f"local://{qdir_jvm}",
                "spark.s3conn.queueType": "local",
                "spark.s3conn.queueFetchWaitTimeoutSeconds": "1",
                "spark.s3conn.maxFilesPerTrigger": "5000",
            },
            os.path.join(work, "meta-jvm"),
            queue_client=q_jvm,
        )
        jvm_tot = {"cnt": 0}

        def _process(df, _bid):
            jvm_tot["cnt"] += df.count()

        try:
            orch.run_available(schema, _process)  # queue empty: 0 batches
            q_jvm.send_file_event(warm_file, int(time.time() * 1000))
            orch.run_available(schema, _process)  # first-trigger machinery
            now = int(time.time() * 1000)
            for f in files:
                q_jvm.send_file_event(f, now)
            t0 = time.time()
            orch.run_available(schema, _process)
            out["ingest_many_small_files_connector_jvm"] = round(time.time() - t0, 3)
            n3 = jvm_tot["cnt"]
        finally:
            orch.close()

        # --- stock file stream source over the same files ---
        watch_dir = os.path.join(work, "watched")
        os.makedirs(watch_dir)
        stream2 = spark.readStream.schema(schema).parquet(watch_dir)
        fss_name = f"bench_small_fss_{rep}"
        query2 = (
            stream2.agg(F.count("*").alias("cnt"), F.sum("id").alias("sid"))
            .writeStream.format("memory")
            .queryName(fss_name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt2"))
            .start()
        )
        try:
            query2.processAllAvailable()  # stream is up, dir empty
            shutil.copy(warm_file, os.path.join(watch_dir, "warm.parquet"))
            query2.processAllAvailable()  # first-trigger machinery, unmeasured
            for f in files:
                os.rename(f, os.path.join(watch_dir, os.path.basename(f)))
            t0 = time.time()
            query2.processAllAvailable()
            out["ingest_many_small_files_file_source"] = round(time.time() - t0, 3)
            n2 = spark.sql(f"SELECT SUM(cnt) c FROM {fss_name}").collect()[0].c
        finally:
            query2.stop()
        out["ingest_many_small_files_row_mismatch"] = float(abs((n1 or 0) - (n2 or 0)))
        out["ingest_many_small_files_jvm_row_mismatch"] = float(abs((n1 or 0) - (n3 or 0)))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-streaming-sql-s3-connector-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # engine-owned state-plane confs (r15, verdict #7): the partition-
    # discovery threshold for the 64-shard layouts now lives in
    # spark_streaming_sql_s3_connector_spark/session.py — the bench uses
    # the same documented call a deployment makes, instead of being the
    # only place that sets it (rationale + env override in that module).
    from spark_streaming_sql_s3_connector_spark.session import (
        apply_engine_defaults,
    )

    apply_engine_defaults(spark)

    # JVM warmup outside the timed loop (first parquet scan pays codegen +
    # class-loading; attributing that to b1 would misstate per-query cost)
    from spark_streaming_sql_s3_connector_spark.plans.io import (
        ensure_package_shipped,
        load_table,
    )

    load_table(spark, SF_DIR, "lineitem").count()

    # Python-worker warmup: the first Python data source read pays worker
    # spawn + pyspark/pyarrow import (~5 s); daemon workers are reused
    # afterwards, so warm them here like the JVM above — the per-query
    # numbers then measure steady-state read cost, not interpreter boot.
    from spark_streaming_sql_s3_connector_spark.sources.datasource import register

    ensure_package_shipped(spark)
    register(spark)
    nation_schema = load_table(spark, SF_DIR, "nation").schema
    (
        spark.read.format("s3-connector")
        .schema(nation_schema)
        .option("spark.s3conn.fileFormat", "parquet")
        .option("spark.s3conn.queueUrl", "warmup")
        .option("spark.s3conn.queueType", "local")
        .option("paths", os.path.join(SF_DIR, "nation.parquet"))
        .load()
        .count()
    )

    # Composite warmup: the first nontrivial query of a session pays a
    # further one-time ~3-6 s (JIT of shuffle/sort/Arrow paths, pandas-UDF
    # worker boot under contention) that later queries of ANY shape don't.
    # One small shuffle+UDF+agg pipeline at sf0.001 absorbs it so the
    # timed loop measures steady-state, matching the reference's
    # continuous-pipeline perf harness (DataConsumer.scala:25-99).
    try:
        from spark_streaming_sql_s3_connector_spark.operators.dedup import (
            minhash_near_dup_pairs,
        )

        warm_docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        minhash_near_dup_pairs(
            warm_docs, "text", "doc_id", jaccard_threshold=0.5
        ).count()
    except Exception as e:
        print(f"# composite warmup skipped: {e}", file=sys.stderr)

    # Median-of-3: single-run numbers cannot distinguish a regression from
    # JIT/GC/scheduling noise (the round-2 verdict's core methodology
    # complaint). Run the whole query list N_REPS times round-robin (so
    # cache effects spread evenly rather than back-to-back same-query
    # runs understating cold cost) and report the per-query median.
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # Streaming-ingest comparison FIRST, on the freshly-warmed session:
    # measured after 200+ query executions the numbers absorb session
    # aging (GC pressure, stage bookkeeping) that isn't ingest cost —
    # isolated A/B showed ~2x inflation for both pipelines when this ran
    # last. Both pipelines run back-to-back per rep either way, so the
    # comparison is fair in either position; this one is also stable.
    # r14: ingest keys run 5 reps (BASELINE.md §3's own minimum for 1-2 s
    # walls — the 3-rep median still swung ~2x across rounds while the
    # in-run ratio held), small-files runs 3 reps of a 400-file
    # population (same total wall as the old 1x1,000 shot, but the
    # headline small_files_ratio now rests on a median instead of n=1)
    ingest_reps = int(os.environ.get("SPARK_GRAFT_INGEST_REPS", "5"))
    ingest_samples: dict[str, list[float]] = {}
    for rep in range(ingest_reps):
        try:
            for k, v in bench_streaming_ingest(spark, SF_DIR, rep=rep).items():
                ingest_samples.setdefault(k, []).append(v)
        except Exception as e:  # keep the JSON line even if streaming bench dies
            print(f"# streaming bench failed (rep {rep}): {e}", file=sys.stderr)
            ingest_samples.setdefault("ingest_error", []).append(-1.0)

    small_reps = int(os.environ.get("SPARK_GRAFT_SMALLFILES_REPS", "3"))
    for rep in range(small_reps):
        try:
            for k, v in bench_many_small_files(spark, rep=rep).items():
                ingest_samples.setdefault(k, []).append(v)
        except Exception as e:
            print(f"# many-small-files bench failed (rep {rep}): {e}", file=sys.stderr)
            ingest_samples.setdefault("ingest_many_small_files_error", []).append(-1.0)

    qs = entrymod.queries()
    samples: dict[str, list[float]] = {}
    for rep in range(n_reps):
        for name in BENCH_QUERIES:
            fn = qs.get(name)
            if fn is None:
                continue
            # Per-(rep, query) isolation: one AnalysisException must cost
            # one sample, not the whole bench (round 3 produced NO bench
            # because a single broken query aborted the first rep).
            try:
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = df.count()  # force full execution
                dt = round(time.time() - t0, 3)
                samples.setdefault(name, []).append(dt)
                print(f"# rep{rep} {name}: {dt}s ({n} rows)", file=sys.stderr, flush=True)
            except Exception as e:
                samples.setdefault(name, []).append(-1.0)
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                print(f"# rep{rep} {name}: FAILED {msg}", file=sys.stderr, flush=True)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    def robust_median(xs: list[float]) -> float:
        # median over successful reps only; -1.0 only if every rep failed
        ok = [x for x in xs if x >= 0]
        return median(ok) if ok else -1.0

    results: dict[str, float] = {k: round(robust_median(v), 3) for k, v in samples.items()}
    results.update({k: round(median(v), 3) for k, v in ingest_samples.items()})

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"
    total = round(
        sum(v for k, v in results.items() if not k.startswith("ingest_") and v >= 0), 3
    )
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf),
            }
        ),
        flush=True,
    )

    # r15 (VERDICT #2): the driver captures only a ~2 KB stdout TAIL, and
    # at 150+ keys the full queries line above overflows it — PERF_r13/r14
    # both degraded to `per_query: {}` / `now_bench_ok: false`. Two
    # redundancies restore a driver-visible per-query surface:
    # (a) the complete result object is written to bench_results.json
    #     beside the repo root, so any consumer that can read a file gets
    #     the full map regardless of tail size;
    # (b) every query prints its own SHORT JSON line below — at ~50 chars
    #     per line any 2 KB tail window carries the last ~40 keys intact.
    # The compact headline stays the FINAL line (it is the line the
    # driver parsed successfully in r13/r14 — ordering is load-bearing).
    full_result = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": float(sf),
    }
    try:
        with open(os.path.join(REPO, "bench_results.json"), "w") as f:
            json.dump(full_result, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"# bench_results.json write failed: {e}", file=sys.stderr)
    for name in sorted(results):
        print(
            json.dumps({"metric": "query_sec", "q": name, "sec": results[name]}),
            flush=True,
        )

    # Compact headline printed LAST: the full line above can exceed the
    # driver's parse/tail buffer (BENCH_r{1..7}.json all have
    # "parsed": null), so a short final line carries the in-run signals
    # that matter round-over-round — total plus the two A/B ingest
    # ratios (stock-source seconds / connector seconds; >1 ⇒ connector
    # faster). Per-query medians stay in the full line above.
    def _ratio(num: str, den: str) -> float:
        n, d = results.get(num, -1.0), results.get(den, -1.0)
        return round(n / d, 3) if n > 0 and d > 0 else -1.0

    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "n_queries": sum(
                    1 for k in results if not k.startswith("ingest_")
                ),
                "ingest_ratio": _ratio("ingest_file_source", "ingest_connector"),
                "ingest_jvm_ratio": _ratio(
                    "ingest_file_source", "ingest_connector_jvm"
                ),
                "small_files_ratio": _ratio(
                    "ingest_many_small_files_file_source",
                    "ingest_many_small_files_connector",
                ),
                "small_files_jvm_ratio": _ratio(
                    "ingest_many_small_files_file_source",
                    "ingest_many_small_files_connector_jvm",
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
