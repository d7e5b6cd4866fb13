"""Corpus snapshot diff + distribution drift — the regression tests a
100 TB data pipeline runs between corpus versions.

Two snapshots of a corpus (yesterday's crawl vs today's, pre- vs
post-curation) differ in membership and in distribution. Before the new
version feeds a training run you want both answers cheaply:

- :func:`snapshot_diff` — per-id reconciliation: how many documents were
  added, removed, changed, unchanged. One null-safe full outer join on
  the id — both sides shuffle ONCE on the id key (zero-Exchange when
  both snapshots are bucketed by id via ``operators/joins.write_bucketed``);
  content comparison is an md5 over the compared columns computed
  map-side BEFORE the join, so only (id, 16-byte hash) rows shuffle,
  never document bodies — the same key-narrowing discipline as
  ``operators/dedup``.
- :func:`categorical_drift` — per-column value-share comparison +
  Population Stability Index. Each snapshot contributes one partial-agg
  groupBy on a low-cardinality column (shuffle rows = distinct values,
  not corpus rows); the share join is value-keyed over tiny frames.
  PSI = Σ (p_new − p_old)·ln(p_new/p_old) with additive smoothing so
  vanished/new values stay finite.
- :func:`numeric_drift` — the same comparison for a numeric column over
  FIXED-WIDTH bins (``floor((x−lo)/w)`` clamped to [0, n_bins)): binning
  is a scan-local expression, cross-engine reproducible (no quantile
  estimation inside the operator — pass explicit bounds, e.g. from a
  prior :func:`~.profile.profile_table` run).

At 100 TB: ``snapshot_diff`` is the only id-wide shuffle and it moves
20–40 B/row; both drift profiles move one row per distinct value/bin per
partition. Nothing here reads a document body except the map-side hash.

Convention: PSI is conventionally read against fixed thresholds
(<0.1 stable, 0.1–0.25 moderate shift, >0.25 major shift).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_TOKEN = "\x20NULL"  # cannot collide with real rendered values


def _content_hash(df: DataFrame, cols: Sequence[str]) -> Column:
    """Null-safe md5 over the compared columns: each value renders as
    ``len:value`` (NULL as a reserved token) so ('ab','c') never equals
    ('a','bc') and NULL never equals ''."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit(_NULL_TOKEN)).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Classify every id across two snapshots.

    Returns ``id_col | status`` with status in
    ``added | removed | changed | unchanged``. ``compare_cols`` defaults
    to every shared non-id column; pass a subset to ignore volatile
    fields (fetch timestamps etc.).

    Rows with a NULL id are rejected up front (a NULL key would silently
    fall out of the join and report nothing) — same discipline as
    ``operators/decontamination``.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c != id_col and c in new.columns]
    compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError("no columns to compare")

    def _keyed(df: DataFrame, side: str) -> DataFrame:
        # the guard IS the join key (coalesce is lazy per row), so a
        # NULL id raises instead of silently falling out of the full
        # outer join — same discipline as operators/decontamination
        guarded = F.coalesce(
            F.col(id_col),
            F.raise_error(
                F.lit(
                    f"snapshot_diff: NULL {id_col} in the {side} snapshot — "
                    "NULL-keyed rows cannot be reconciled; filter or assign "
                    "ids first"
                )
            ),
        )
        return df.select(
            guarded.alias(id_col),
            _content_hash(df, compare_cols).alias(f"_h_{side}"),
        )

    o = _keyed(old, "old")
    n = _keyed(new, "new")
    joined = o.join(n, on=id_col, how="full_outer")
    return joined.select(
        F.col(id_col),
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """``status | n_docs`` counts of :func:`snapshot_diff` (the shape a
    pipeline gate asserts on)."""
    return (
        snapshot_diff(old, new, id_col, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )


def shares_from_counts(counts: DataFrame) -> DataFrame:
    """(bucket, n, share) from a pre-aggregated ``bucket | n`` frame,
    share as an exact DECIMAL(38,18) fraction — the division happens on
    exact counts so the two engines' doubles never enter until the PSI
    log. Public so incrementally-maintained count tables (e.g.
    ``streaming/drift.py``) reuse the identical arithmetic.

    The grand total comes from a single-partition window OVER THE
    COUNTS FRAME (post-agg, |distinct values| rows — single-partition
    is safe there), not a separate ``agg`` branch: a second consumer of
    ``counts`` makes Catalyst re-run the upstream corpus scan per
    branch (observed: 8 scans for the 4-profile drift key; 4 after)."""
    from pyspark.sql import Window

    t = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "bucket",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("decimal(38,18)") / t).alias("share"),
    )


def _share_profile(df: DataFrame, bucket: Column) -> DataFrame:
    return shares_from_counts(
        df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    )


def drift_from_counts(
    old_counts: DataFrame, new_counts: DataFrame, smoothing: float = 1e-6
) -> DataFrame:
    """:func:`categorical_drift` semantics over two pre-aggregated
    ``bucket | n`` frames (same output schema) — the entry point for
    incrementally-maintained counts, where re-scanning the corpora to
    re-bucket would defeat the increment."""
    return _drift_join(
        shares_from_counts(old_counts), shares_from_counts(new_counts), smoothing
    ).orderBy("bucket")


def _drift_join(
    old_p: DataFrame, new_p: DataFrame, smoothing: float
) -> DataFrame:
    eps = float(smoothing)
    j = (
        old_p.withColumnRenamed("n", "n_old")
        .withColumnRenamed("share", "share_old")
        .join(
            new_p.withColumnRenamed("n", "n_new").withColumnRenamed(
                "share", "share_new"
            ),
            on="bucket",
            how="full_outer",
        )
        .na.fill({"n_old": 0, "n_new": 0})
        .na.fill(0.0, ["share_old", "share_new"])
    )
    p_old = F.col("share_old").cast("double") + F.lit(eps)
    p_new = F.col("share_new").cast("double") + F.lit(eps)
    return j.select(
        F.col("bucket"),
        F.col("n_old"),
        F.col("n_new"),
        F.round(F.col("share_old").cast("double"), 9).alias("share_old"),
        F.round(F.col("share_new").cast("double"), 9).alias("share_new"),
        F.round((p_new - p_old) * (F.log(p_new) - F.log(p_old)), 9).alias(
            "psi_term"
        ),
    )


def categorical_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    smoothing: float = 1e-6,
) -> DataFrame:
    """Per-value share comparison of ``col`` across two snapshots.

    Returns ``bucket | n_old | n_new | share_old | share_new | psi_term``
    (one row per distinct value incl. NULL, rendered as a reserved
    token). ``SUM(psi_term)`` is the column's PSI. ``psi_term`` uses
    smoothed shares so values present in only one snapshot contribute a
    finite penalty instead of ±inf.
    """
    b = F.coalesce(F.col(col).cast("string"), F.lit(_NULL_TOKEN))
    return _drift_join(
        _share_profile(old, b), _share_profile(new, b), smoothing
    ).orderBy("bucket")


def numeric_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    smoothing: float = 1e-6,
) -> DataFrame:
    """:func:`categorical_drift` over fixed-width bins of a numeric
    column. Bin ``i`` covers ``[lo + i·w, lo + (i+1)·w)`` with
    ``w = (hi−lo)/n_bins``; values outside clamp to the edge bins, NULL
    gets its own bucket. Bounds are explicit (take them from a profile
    of the OLD snapshot) so the binning is deterministic and
    cross-engine — no quantile estimation on the hot path."""
    if not (hi > lo):
        raise ValueError("hi must be > lo")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    w = (float(hi) - float(lo)) / int(n_bins)
    raw = F.floor((F.col(col).cast("double") - F.lit(float(lo))) / F.lit(w))
    clamped = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw.cast("int")))
    b = F.when(F.col(col).isNull(), F.lit(_NULL_TOKEN)).otherwise(
        F.lpad(clamped.cast("string"), 4, "0")  # zero-pad: text sort == bin order
    )
    return _drift_join(
        _share_profile(old, b), _share_profile(new, b), smoothing
    ).orderBy("bucket")


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    vec_col: str,
) -> DataFrame:
    """Per-dimension drift of an embedding column across two snapshots —
    the embedding-modality member of the drift plane (a model/encoder
    swap or a source-mix change shifts the embedding distribution long
    before any categorical column moves).

    Returns ``dim | mean_old | mean_new | var_old | var_new |
    mean_shift`` (one row per dimension; ``mean_shift`` = |Δmean| /
    √(var_old + ε), a per-dim standardized effect size whose MAX or SUM
    is the drift score). Shape: ONE posexplode + a dim-keyed partial
    agg per side — the shuffle carries d rows per partition, never the
    vectors; cost is linear in corpus with map-side combine, flat in
    dimension count.

    FP discipline (the `_q6` pattern): elements pre-round to 6-dp
    DECIMAL before the sums, so Spark's partial-agg tree and a
    single-threaded SQL fold produce hash-identical totals; only the
    final moments divide back to double (9-dp)."""
    mo = embedding_moments(old, vec_col).select(
        "dim",
        F.col("n").alias("_n_o"),
        F.col("s").alias("_s_o"),
        F.col("ss").alias("_ss_o"),
    )
    mn = embedding_moments(new, vec_col).select(
        "dim",
        F.col("n").alias("_n_n"),
        F.col("s").alias("_s_n"),
        F.col("ss").alias("_ss_n"),
    )
    return embedding_drift_from_moments(mo, mn)


# decimal grids shared by the batch operator and the streaming twin:
# elements pre-round to 6 dp; squares of 6-dp decimals are EXACT at
# scale 12 — summing at (38,12) avoids a per-element re-round whose
# half-cases engines resolve differently (observed 1e-7 var drift at
# scale 6)
_EMB_D6 = "decimal(18,6)"
_EMB_DSUM = "decimal(38,6)"
_EMB_DSQ = "decimal(38,12)"


def embedding_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension MERGEABLE moment partials of an embedding column:
    ``dim | n | s | ss`` (count, exact decimal Σx, exact decimal Σx²).
    Partials from disjoint row sets merge by plain SUM — the property
    the streaming twin's delta log relies on (streaming == batch is an
    identity, law-tested)."""
    e = df.select(F.posexplode(F.col(vec_col)).alias("dim", "_x")).select(
        "dim",
        F.round(F.col("_x").cast("double"), 6).cast(_EMB_D6).alias("_x"),
    )
    return e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(_EMB_DSUM)).alias("s"),
        F.sum((F.col("_x") * F.col("_x")).cast(_EMB_DSQ)).alias("ss"),
    )


def embedding_drift_from_moments(mo: DataFrame, mn: DataFrame) -> DataFrame:
    """Final drift arithmetic over two per-dim moment tables (columns
    ``dim,_n_o,_s_o,_ss_o`` / ``dim,_n_n,_s_n,_ss_n``) — shared by the
    batch operator and the streaming reader so the two can never
    diverge arithmetically."""
    j = mo.join(mn, "dim")
    mean_o = F.col("_s_o").cast("double") / F.col("_n_o")
    mean_n = F.col("_s_n").cast("double") / F.col("_n_n")
    var_o = F.col("_ss_o").cast("double") / F.col("_n_o") - mean_o * mean_o
    var_n = F.col("_ss_n").cast("double") / F.col("_n_n") - mean_n * mean_n
    eps = F.lit(1e-12)
    return j.select(
        F.col("dim").cast("int").alias("dim"),
        F.round(mean_o, 9).alias("mean_old"),
        F.round(mean_n, 9).alias("mean_new"),
        F.round(var_o, 9).alias("var_old"),
        F.round(var_n, 9).alias("var_new"),
        F.round(
            F.abs(mean_n - mean_o) / F.sqrt(var_o + eps), 9
        ).alias("mean_shift"),
    ).orderBy("dim")
