"""Deterministic sampling & splits for training-data pipelines.

Random sampling (``df.sample``) is not reproducible across engines,
partitionings, or reruns — a training pipeline needs the SAME holdout
every run. These operators derive membership from a salted md5 of the
row's id: pure JVM expressions, stable under repartition/rerun/engine,
and cheap (one hash per row, no shuffle).

At 100 TB: membership is a scan-local filter — no shuffle, no state, and
the filter composes with pushdown on everything else. Changing ``salt``
rotates the sample without correlation to the previous one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000): first 8 md5 hex digits of
    ``id || salt`` as an integer, mod 10000. Matches the DuckDB expression
    ``CAST('0x' || substr(md5(id || salt), 1, 8) AS BIGINT) % 10000``."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — same rows every
    run, any partitioning, any engine."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(round(fraction * _BUCKETS))
    return df.where(_hash_bucket(F.col(id_col), salt) < cut)


def with_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'test' (hash split). The complement
    property holds by construction: the same (id, salt) always lands in
    the same split, and train ∪ test is exactly the input."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    cut = int(round(test_fraction * _BUCKETS))
    return df.withColumn(
        split_col,
        F.when(_hash_bucket(F.col(id_col), salt) < cut, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def with_group_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free splits: every row of a GROUP lands in the same
    split, chosen by the salted hash of the group key — never of the row
    id. This is the split you want when groups carry correlated /
    near-duplicate content (domain, dup-cluster canonical id, author):
    an id-hash split scatters a duplicate cluster across train and test
    and the eval leaks; a group-hash split cannot.

    ``fractions`` maps split name → share of the GROUP hash space (sum
    ≤ 1 + ε; shares are of groups, not rows — heavy groups skew row
    counts, by design). Allocation order is the dict's iteration order,
    so the same dict always yields the same assignment. Rows whose
    group key is NULL get their own pseudo-group (all NULLs together —
    the conservative choice for leakage).

    Scale shape: identical to :func:`with_split` — one JVM hash
    expression per row, scan-local, no shuffle, composes with pushdown.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bad = {k: v for k, v in fractions.items() if v < 0}
    if bad:
        raise ValueError(f"negative fractions: {bad}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    key = F.coalesce(F.col(group_col).cast("string"), F.lit("\x20NULL"))
    bucket = _hash_bucket(key, salt)
    cum = 0.0
    expr = None
    for name, frac in fractions.items():
        cum += frac
        cut = int(round(cum * _BUCKETS))
        cond = bucket < cut
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    # groups past the last cut (fractions summing < 1) are held out
    return df.withColumn(split_col, expr.otherwise(F.lit(None).cast("string")))


def group_train_test_split(
    df: DataFrame, group_col: str, test_fraction: float = 0.1, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """Two-way :func:`with_group_split` returning (train, test) frames —
    the drop-in leakage-free replacement for :func:`train_test_split`."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    labeled = with_group_split(
        df, group_col, {"test": test_fraction, "train": 1.0 - test_fraction}, salt
    )
    return (
        labeled.where(F.col("split") == "train").drop("split"),
        labeled.where(F.col("split") == "test").drop("split"),
    )


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    labeled = with_split(df, id_col, test_fraction, salt)
    return (
        labeled.where(F.col("split") == "train").drop("split"),
        labeled.where(F.col("split") == "test").drop("split"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``(shard, pos)`` coordinate derived ONLY from its id and the salt —
    shard = md5 bucket, pos = rank of the full md5 within the shard.
    Reading shards 0..n-1 in pos order visits the corpus in a fixed
    pseudorandom order that is identical across reruns, partitionings,
    and engines (``df.orderBy(rand())`` is none of those), so a training
    run is exactly reproducible and resumable mid-shard. A new ``salt``
    is a fresh epoch permutation, uncorrelated with the last.

    Scale shape: ONE hash-partitioned window per shard — each shard
    sorts ~|corpus|/n_shards rows inside one task (size n_shards so a
    shard's (id, hash) pairs fit a task's sort buffer; the external
    sorter spills gracefully past it). No driver participation; writing
    with ``partitionBy(shard)`` + ``sortWithinPartitions`` streams each
    shard out in final order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).cast(
        "int"
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_shuffle_h").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_shuffle_h", h)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("_shuffle_h")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int,
    salt: str = "",
) -> None:
    """Materialize :func:`shuffle_shards` to disk as the training
    layout: parquet partitioned by ``shard``, rows of each shard stored
    in ``pos`` order, so a trainer streams ``shard=i`` files and reads
    the epoch permutation sequentially with zero sort at read time.

    One shuffle total: ``repartition(shard)`` co-locates each shard in
    one task and ``sortWithinPartitions(pos)`` orders it there (the
    window in :func:`shuffle_shards` already shuffled by shard, so AQE
    coalesces the repartition into the same exchange when it can). Size
    ``n_shards`` so a shard fits a task's sort buffer; the external
    sorter spills past it."""
    coords = shuffle_shards(df, id_col, n_shards, salt)
    (
        coords.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def read_training_shard(spark, out_dir: str, shard: int) -> DataFrame:
    """One shard in stored (pos) order — file-pruned by the ``shard``
    partition column."""
    return (
        spark.read.parquet(out_dir)
        .where(F.col("shard") == shard)
        .orderBy("pos")
    )


def stratified_sample_exact(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``min(n, |stratum|)`` rows per stratum, deterministically:
    rank rows inside each stratum by their salted id hash (a stable
    shuffle order) and keep the first n. Same rows every run, any
    partitioning, any engine — the DuckDB mirror is a QUALIFY over the
    identical md5 ordering.

    Scale shape: one shuffle on the strata columns. For small n Spark
    plans a WindowGroupLimit above the scan — each map task pre-prunes to
    its local top-n BEFORE the exchange, so the shuffle carries ~n rows
    per stratum per task, not the stratum. A skewed hot stratum therefore
    ships n·tasks rows, not its full mass (regression-pinned in
    tests/test_sampling.py)."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_strat_rn", F.row_number().over(w))
        .where(F.col("_strat_rn") <= n_per_stratum)
        .drop("_strat_rn")
    )


def mix_corpus(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    target_shares: dict[str, float],
    token_budget: int,
    salt: str = "",
    default_share: float = 0.0,
) -> DataFrame:
    """Deterministic source-weighted downsampling to a token budget —
    the "data mixing" step of a training run: given target token SHARES
    per source (e.g. web 0.6, code 0.25, books 0.15) and a total token
    budget, keep a hash-stable subset of each source whose expected
    token mass hits ``share × budget``.

    Per-source keep fraction = min(1, share·budget / source_tokens),
    applied through the same salted-md5 bucket filter as
    :func:`deterministic_sample`, so the kept set is stable across
    reruns, partitionings, and engines. Sources missing from
    ``target_shares`` get ``default_share`` (0 ⇒ dropped).

    Scale shape: ONE aggregation producing |sources| rows (map-side
    partial sums), broadcast-joined back onto the corpus; membership is
    then a scan-local filter — the corpus itself never shuffles. An
    oversubscribed source (share·budget > its total tokens) keeps all
    its rows; re-normalize shares upstream if strict shares matter more
    than the budget.

    Returns the kept rows with ``keep_fraction`` attached (useful for
    loss reweighting).
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    bad = {k: v for k, v in target_shares.items() if v < 0}
    if bad:
        raise ValueError(f"negative shares: {bad}")

    totals = df.groupBy(group_col).agg(
        F.sum(F.col(token_col).cast("double")).alias("_grp_tokens")
    ).withColumnRenamed(group_col, "_grp_key")
    share_items = []
    for k, v in sorted(target_shares.items()):
        share_items.extend([F.lit(k), F.lit(float(v))])
    share_map = F.create_map(*share_items) if share_items else None
    share = (
        F.coalesce(
            share_map[F.col(group_col)] if share_map is not None else F.lit(None),
            F.lit(float(default_share)),
        )
    )
    # try_divide: a zero-mass group yields NULL, least() skips it, and the
    # fraction clamps to keep-all (ANSI mode would throw on the division)
    frac = F.least(
        F.lit(1.0),
        F.try_divide(share * F.lit(float(token_budget)), F.col("_grp_tokens")),
    )
    cut = F.floor(frac * _BUCKETS).cast("long")
    # null-safe join: a NULL group is still a group ("unlabeled source")
    # and gets default_share like any other unlisted source — a plain
    # equi-join would silently delete those rows from the mix. A group
    # whose token sum is 0/NULL clamps to keep-all (least skips the
    # NULL/Infinity fraction), which oversamples nothing of zero mass.
    return (
        df.join(
            F.broadcast(totals),
            F.col(group_col).eqNullSafe(F.col("_grp_key")),
        )
        .where(_hash_bucket(F.col(id_col), salt) < cut)
        .withColumn("keep_fraction", frac)
        .drop("_grp_tokens", "_grp_key")
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    token_budget: int,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture resampling — the multilingual-training
    knob (mT5/XLM-R style): target token shares ∝ (group tokens)^α,
    renormalized. α=1 keeps natural proportions; α→0 flattens toward
    uniform, up-weighting tail languages/sources; α≈0.3–0.7 is the
    published sweet spot. Degenerates to :func:`mix_corpus` with the
    derived shares, so membership is the same salted-hash scan-local
    filter (deterministic, zero shuffle on the corpus).

    Scale shape: ONE |groups|-row aggregate collected to the driver
    (bounded — sources/languages, not rows) to derive shares; everything
    after is mix_corpus's broadcast join + hash filter. Rows with a NULL
    group are excluded from the share derivation and dropped (share 0) —
    label sources before mixing."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    totals = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.sum(F.col(token_col).cast("double")).alias("_t"))
        .collect()
    )
    weights = {
        str(r[group_col]): float(r["_t"]) ** alpha
        for r in totals
        if r["_t"] and r["_t"] > 0
    }
    wsum = sum(weights[k] for k in sorted(weights))
    if wsum <= 0:
        raise ValueError("no group has positive token mass")
    # 12-dp rounding makes the share independent of the double-summation
    # ORDER of wsum (python sorted-key sum here vs arbitrary-order SUM in
    # a SQL mirror differ in the last ulp) — cross-engine-stable shares
    shares = {k: round(w / wsum, 12) for k, w in weights.items()}
    return mix_corpus(
        df,
        id_col,
        group_col,
        token_col,
        shares,
        token_budget,
        salt=salt,
        default_share=0.0,
    )


def keep_top_fraction(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stratified quality gate: keep the TOP ``ceil(n · frac)`` rows per
    group by ``(value desc, id asc)`` — "best 40% of each language", the
    per-group-adaptive form of a fixed quality threshold (a fixed cut
    over-prunes low-resource strata).

    Rank-based on purpose: an interpolated quantile threshold
    (percentile/quantile_cont) is float arithmetic whose ULPs differ
    between engines, flipping boundary rows; ``row_number <= ceil(n·frac)``
    is integer-exact everywhere. Cost is one shuffle on the group key and
    a per-group sort; at 100 TB with huge strata, compute an
    approx_percentile threshold instead and broadcast-filter (no sort) —
    the rank form is the exact, oracle-checkable reference.
    """
    if not 0 < frac <= 1:
        raise ValueError("frac must be in (0, 1]")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).desc(), F.col(id_col).asc()
    )
    n = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(n))
        .where(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(frac)))
        .drop("_rn", "_n")
    )


def quantile_gate_approx(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    frac: float,
    accuracy: int = 10_000,
    collect_thresholds: bool = False,
) -> DataFrame:
    """The scale path of :func:`keep_top_fraction`: per-group
    approx_percentile(1-frac) thresholds, broadcast back, filter — no
    per-group sort, one tiny agg shuffle plus a map-side filter. Keeps
    rows with ``value >= threshold``; the kept fraction is approximate
    (sketch accuracy), which is the right trade at 100 TB.

    ``collect_thresholds=True`` (single group column only) collects the
    per-group thresholds to the driver — bounded by |groups|, fine for
    the language/source-keyed gates this exists for — and applies them
    as a LITERAL map lookup instead of a broadcast join. Strictly the
    better plan when the value column is a computed expression: the
    join form's null-filter pushes ``isnotnull(value_expr)`` into BOTH
    scan branches, re-evaluating an expensive expression 2-3× per row
    (profiled on the 6-regexp quality score), while the literal form
    leaves one filter over one evaluation. Same result either way
    (law-tested); rows whose group has no threshold (impossible for
    groups present in ``df``) would drop in both forms."""
    if not 0 < frac <= 1:
        raise ValueError("frac must be in (0, 1]")
    thresholds = df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, 1.0 - frac, accuracy).alias("_thr")
    )
    if collect_thresholds:
        if len(group_cols) != 1:
            raise ValueError(
                "collect_thresholds supports exactly one group column"
            )
        items: list = []
        for r in thresholds.collect():
            if r[0] is None or r["_thr"] is None:
                # NULL group / all-NULL values: the join form drops
                # these rows too (equi-join miss, NULL comparison)
                continue
            items.extend([F.lit(r[0]), F.lit(float(r["_thr"]))])
        if not items:
            return df.limit(0)
        thr_map = F.create_map(*items)
        return df.where(F.col(value_col) >= thr_map[F.col(group_cols[0])])
    return (
        df.join(F.broadcast(thresholds), group_cols)
        .where(F.col(value_col) >= F.col("_thr"))
        .drop("_thr")
    )


def unimax_plan(
    totals: dict[str, int], token_budget: int, max_epochs: int
) -> dict[str, float]:
    """UniMax budget allocation (Chung et al. 2023): spread
    ``token_budget`` across groups as UNIFORMLY as possible, capping
    each group at ``max_epochs`` passes over its data — the
    principled alternative to temperature sampling (no α to tune, and
    tail groups are never repeated past the cap).

    Water-filling closed form, chosen over the equivalent greedy loop
    because it does ONE division: sort caps ``cap_g = total_g ·
    max_epochs`` ascending, find the first boundary where the level
    ``θ_k = (B − Σ_{i≤k} cap_i)/(L−k)`` fits under the next cap, then
    ``alloc_g = min(cap_g, θ)``. All inputs are exact integers, so θ
    and every allocation are bit-identical in any engine that sorts
    the same way (ties break on the group key) — the property the
    DuckDB oracle relies on. Returns epochs per group
    (``alloc_g / total_g``, rounded 12 dp), in (0, max_epochs].

    Groups with zero/negative totals are excluded (nothing to
    allocate)."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    items = sorted(
        ((int(t) * max_epochs, str(g), int(t)) for g, t in totals.items() if t and t > 0),
        key=lambda x: (x[0], x[1]),
    )
    if not items:
        raise ValueError("no group has positive token mass")
    n = len(items)
    caps = [c for c, _, _ in items]
    prefix = 0
    theta = None
    for k in range(n):  # boundary BEFORE group k (k groups saturated)
        level = (token_budget - prefix) / (n - k)
        if level <= caps[k]:
            theta = level
            break
        prefix += caps[k]
    # theta None ⇒ budget ≥ Σ caps: every group saturates at max_epochs
    out = {}
    for cap, g, total in items:
        alloc = cap if theta is None else min(cap, theta)
        out[g] = round(alloc / total, 12)
    return out


def unimax_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    token_budget: int,
    max_epochs: int = 2,
    salt: str = "unimax",
) -> DataFrame:
    """Materialized UniMax mixture: one output row per (kept row,
    epoch). A group assigned ``e`` epochs replicates each of its rows
    ``floor(e)`` times (``epoch`` = 1..floor(e)) and keeps a
    hash-stable ``frac(e)`` of rows one extra epoch — so expected
    token mass per group is ``e · total_g`` and the total hits the
    budget (up to the 1e-4 hash-bucket resolution
    :func:`deterministic_sample` has everywhere else).

    NULL-group and zero-mass rows are dropped (label sources first,
    same contract as :func:`temperature_mix`).

    Scale shape: ONE |groups|-row exact-integer aggregate to the
    driver for the plan; membership/replication is then a broadcast
    map lookup + scan-local ``explode(sequence)`` — the corpus never
    shuffles, and replication multiplies rows only where the plan
    says (bounded by ``max_epochs``)."""
    totals = {
        r["_g"]: r["_t"]
        for r in (
            df.where(F.col(group_col).isNotNull())
            .groupBy(F.col(group_col).cast("string").alias("_g"))
            .agg(F.sum(F.col(token_col).cast("bigint")).alias("_t"))
            .collect()
        )
    }
    plan = unimax_plan(totals, token_budget, max_epochs)
    items = []
    for g, e in sorted(plan.items()):
        items.extend([F.lit(g), F.lit(float(e))])
    emap = F.create_map(*items)
    e = emap[F.col(group_col).cast("string")]
    n_full = F.floor(e).cast("int")
    cut = F.floor((e - n_full) * _BUCKETS).cast("long")
    extra = (_hash_bucket(F.col(id_col), salt) < cut).cast("int")
    n_epochs = (n_full + extra).alias("_n")
    return (
        df.where(F.col(group_col).isNotNull())
        .withColumn("epochs_assigned", e)
        .where(F.col("epochs_assigned").isNotNull())
        .withColumn("_n", n_epochs)
        .withColumn(
            "epoch",
            F.explode(
                F.when(
                    F.col("_n") >= 1, F.sequence(F.lit(1), F.col("_n"))
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("_n")
    )
