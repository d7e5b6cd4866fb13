"""Self-refreshing streaming ANN index — the composed lifecycle the r10
actuator was built for.

`operators/ann_index.streaming_ann_index` keeps a persisted IVF-PQ
index current (encode-only appends, stored quantizers) and
`refresh_ann_index_if_drifted` rebuilds the quantizers when the
embedding distribution shifts — but nothing COMPOSED them: a
long-running ingest stream would encode forever with codebooks trained
at bootstrap, silently losing recall as the distribution moved, until
an operator ran the refresh by hand (the same unwired-actuator gap
vacuum had before r11 wired it into the curation cadence).

This module is the composition, one state root, one checkpoint story
(reference analog: the source's self-maintaining metadata log,
RocksDBS3SourceLog.scala:109-153 — maintenance rides the commit
cadence, never a side channel):

- ``root/index``    — the served IVF-PQ index (codes + quantizer meta)
- ``root/vectors``  — the RAW landed vectors, one ``batch=<id>`` dir
  per trigger (plus ``batch=bootstrap``): the index stores only 8-bit
  codes, so a retrain NEEDS the raw vectors; landing them beside the
  index makes the lifecycle self-contained instead of assuming some
  other system kept them
- ``root/moments``  — the streaming per-dim moment state
  (`streaming/drift.embedding_moment_batch`)
- ``root/baseline`` — versioned d-row snapshot of the TRAINING-set
  moments of the CURRENT quantizers (bootstrap corpus at build; the
  landed union at each refresh)
- ``root/window``   — versioned d-row snapshot of the live moments AT
  the last refresh, so the drift question is always windowed: "what
  streamed in SINCE the current quantizers were trained" vs "what they
  were trained on". Moment partials are exact decimal sums, so the
  window is an exact subtraction — no re-scan, no approximation.

Per trigger: land the batch's vectors (overwrite-by-batch-dir), write
its moment delta, every ``check_every`` batches run the drift check
(d-row state reads, ZERO corpus IO), and — only when the windowed max
standardized mean shift crosses ``threshold`` — rebuild the index from
the landed union EXCLUDING the in-flight batch, advance baseline +
window snapshots behind atomic pointers, then append the batch with
the (possibly fresh) quantizers.

Replay convergence: every write is batch-id-keyed and overwritten; the
refresh rebuilds from committed batches only, and after its pointer
flips the recomputed window shift is ~0, so a replayed trigger takes
the no-op path and its re-append re-encodes the same rows with the
same (new) quantizers — state converges (tested, incl. a replayed
refresh trigger).

Scale shape: steady-state triggers cost one batch encode + one d-row
moment delta; the drift DECISION costs three d-row reads; the rebuild
is the one full pass over the landed vectors you must pay for any
retrain, now spent exactly when the alarm says the codebooks stopped
fitting — never on a blind schedule.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.streaming.rollup import (
    _read_pointer,
    _write_pointer,
)

_INDEX = "index"
_VECTORS = "vectors"
_MOMENTS = "moments"
_BASELINE = "baseline"
_WINDOW = "window"

_MOMENT_COLS = ("dim", "n", "s", "ss")


def _index_dir(root: str) -> str:
    return os.path.join(root, _INDEX)


def _vectors_dir(root: str) -> str:
    return os.path.join(root, _VECTORS)


def _moments_dir(root: str) -> str:
    return os.path.join(root, _MOMENTS)


def _write_versioned_moments(df: DataFrame, root: str, sub: str, version: int) -> None:
    sub_root = os.path.join(root, sub)
    out = df.select(*_MOMENT_COLS).coalesce(1)
    out.write.mode("overwrite").parquet(os.path.join(sub_root, f"v={version}"))
    _write_pointer(sub_root, version)
    for name in os.listdir(sub_root):
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        if v != version:
            shutil.rmtree(os.path.join(sub_root, name), ignore_errors=True)


def _read_versioned_moments(spark: SparkSession, root: str, sub: str) -> Optional[DataFrame]:
    # inference, not a fixed schema: the d-row snapshot is never empty,
    # and the decimal precisions vary by write path (raw partials are
    # decimal(38,6)/(38,12); merged baselines carry sum-widened types)
    sub_root = os.path.join(root, sub)
    ptr = _read_pointer(sub_root)
    if ptr is None:
        return None
    return spark.read.parquet(os.path.join(sub_root, f"v={ptr}"))


def bootstrap_ann_lifecycle(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    root: str,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    pq_centroids: int = 256,
    seed: int = 42,
    sample_rows: int = 100_000,
) -> dict:
    """Stand up the lifecycle root: land the bootstrap corpus's raw
    vectors, build the index, and freeze the initial drift baseline =
    the bootstrap corpus's moments (what the quantizers were trained
    on). Returns the index meta."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        build_ann_index,
    )
    from spark_streaming_sql_s3_connector_spark.operators.drift import (
        embedding_moments,
    )

    corpus.select(F.col(id_col), F.col(vec_col)).write.mode("overwrite").parquet(
        os.path.join(_vectors_dir(root), "batch=bootstrap")
    )
    meta = build_ann_index(
        corpus, vec_col, id_col, _index_dir(root),
        n_centroids=n_centroids, m_subspaces=m_subspaces,
        pq_centroids=pq_centroids, seed=seed, sample_rows=sample_rows,
    )
    _write_versioned_moments(embedding_moments(corpus, vec_col), root, _BASELINE, 0)
    return meta


def read_landed_vectors(
    spark: SparkSession, root: str, exclude_batch: Optional[int] = None
) -> DataFrame:
    """The landed raw-vector union (bootstrap + streamed batches),
    optionally excluding the in-flight batch (refresh reads committed
    data only)."""
    df = spark.read.parquet(_vectors_dir(root))
    if exclude_batch is not None:
        df = df.where(F.col("batch") != str(exclude_batch))
    return df.drop("batch")


def _windowed_drift_shift(spark: SparkSession, root: str) -> Optional[float]:
    """Max standardized mean shift of the moments accumulated SINCE the
    last (re)build vs the current quantizers' training-set moments —
    three d-row reads plus exact decimal subtraction, zero corpus IO.
    None when there is no baseline or no post-window mass yet."""
    from spark_streaming_sql_s3_connector_spark.operators.drift import (
        embedding_drift_from_moments,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.drift import (
        read_embedding_moments,
    )

    baseline = _read_versioned_moments(spark, root, _BASELINE)
    if baseline is None:
        return None
    try:
        live = read_embedding_moments(spark, _moments_dir(root))
    except FileNotFoundError:
        return None
    snap = _read_versioned_moments(spark, root, _WINDOW)
    if snap is not None:
        # exact window = live − snapshot (decimal sums subtract exactly)
        s = snap.select(
            "dim",
            F.col("n").alias("_n0"),
            F.col("s").alias("_s0"),
            F.col("ss").alias("_ss0"),
        )
        live = (
            live.join(s, "dim", "left")
            .select(
                "dim",
                (F.col("n") - F.coalesce("_n0", F.lit(0))).alias("n"),
                (F.col("s") - F.coalesce("_s0", F.lit(0))).alias("s"),
                (F.col("ss") - F.coalesce("_ss0", F.lit(0))).alias("ss"),
            )
            .where(F.col("n") > 0)
        )
    mo = baseline.select(
        "dim",
        F.col("n").alias("_n_o"),
        F.col("s").alias("_s_o"),
        F.col("ss").alias("_ss_o"),
    )
    mn = live.select(
        "dim",
        F.col("n").alias("_n_n"),
        F.col("s").alias("_s_n"),
        F.col("ss").alias("_ss_n"),
    )
    row = (
        embedding_drift_from_moments(mo, mn)
        .agg(F.max("mean_shift").alias("m"))
        .collect()[0]
    )
    return float(row.m) if row.m is not None else None


def refresh_lifecycle_if_drifted(
    spark: SparkSession,
    root: str,
    threshold: float = 0.5,
    version: Optional[int] = None,
    sample_rows: int = 100_000,
    exclude_batch: Optional[int] = None,
) -> Optional[float]:
    """The lifecycle's drift actuator: when the WINDOWED shift crosses
    ``threshold``, rebuild the index wholesale from the landed vectors
    (same quantizer geometry and seed as the stored meta), advance the
    baseline to the new training set's moments (old baseline + window —
    an exact d-row merge, no corpus re-scan) and the window snapshot to
    the live moments, both behind atomic pointers. Returns the observed
    shift when the refresh fired, else None (nothing touched)."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        build_ann_index,
        load_index_meta,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.drift import (
        read_embedding_moments,
    )

    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    shift = _windowed_drift_shift(spark, root)
    if shift is None or shift <= threshold:
        return None
    meta = load_index_meta(_index_dir(root))
    corpus = read_landed_vectors(spark, root, exclude_batch=exclude_batch)
    build_ann_index(
        corpus, meta["vec_col"], meta["id_col"], _index_dir(root),
        n_centroids=meta["n_centroids"], m_subspaces=meta["m_subspaces"],
        pq_centroids=meta["pq_centroids"], seed=meta["seed"],
        sample_rows=sample_rows,
    )
    live = read_embedding_moments(spark, _moments_dir(root))
    baseline = _read_versioned_moments(spark, root, _BASELINE)
    # new training set = old training set + window ⇒ its moments are the
    # exact decimal sum of the two partials (mergeable by construction)
    merged = (
        baseline.unionByName(live)
        .groupBy("dim")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("ss").alias("ss"),
        )
    )
    v = version if version is not None else 0
    _write_versioned_moments(merged, root, _BASELINE, v)
    _write_versioned_moments(live, root, _WINDOW, v)
    return shift


def process_ann_lifecycle_batch(
    batch: DataFrame,
    batch_id: int,
    root: str,
    threshold: float = 0.5,
    check_every: int = 4,
    compact_every: Optional[int] = None,
    sample_rows: int = 100_000,
) -> None:
    """One trigger of the self-refreshing lifecycle (see module doc):
    land → moments → (cadenced) drift check/refresh → append with the
    current quantizers → (cadenced) compaction."""
    from spark_streaming_sql_s3_connector_spark.operators.ann_index import (
        append_to_ann_index,
        compact_ann_index,
        load_index_meta,
    )
    from spark_streaming_sql_s3_connector_spark.streaming.drift import (
        embedding_moment_batch,
    )

    spark = batch.sparkSession
    meta = load_index_meta(_index_dir(root))
    vecs = batch.select(F.col(meta["id_col"]), F.col(meta["vec_col"]))
    vecs.write.mode("overwrite").parquet(
        os.path.join(_vectors_dir(root), f"batch={batch_id}")
    )
    embedding_moment_batch(
        vecs, batch_id, _moments_dir(root), meta["vec_col"]
    )
    if check_every and batch_id > 0 and batch_id % check_every == 0:
        # the refresh rebuilds from COMMITTED batches only: the
        # in-flight batch is excluded and appended below either way,
        # so a replayed refresh trigger converges (module doc)
        refresh_lifecycle_if_drifted(
            spark, root, threshold=threshold, version=batch_id,
            sample_rows=sample_rows, exclude_batch=batch_id,
        )
        meta = load_index_meta(_index_dir(root))  # quantizers may be new
    append_to_ann_index(batch, _index_dir(root), batch_id=batch_id, meta=meta)
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_ann_index(spark, _index_dir(root), upto_batch=batch_id)


def streaming_ann_lifecycle(
    stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    check_every: int = 4,
    compact_every: Optional[int] = None,
    sample_rows: int = 100_000,
):
    """Run the self-refreshing index off any stream (incl. the
    s3-connector source). The root must be bootstrapped first
    (:func:`bootstrap_ann_lifecycle`). Returns the StreamingQuery."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_ann_lifecycle_batch(
            batch, batch_id, root,
            threshold=threshold, check_every=check_every,
            compact_every=compact_every, sample_rows=sample_rows,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
