"""Temporal joins Spark lacks natively: keyed as-of join and binned
range join.

- ``asof_join``: for every left row, the latest (``backward``) or earliest
  (``forward``) right row with the same key and a timestamp on the correct
  side of the left timestamp, optionally within a tolerance. Implemented
  as the classic union + keyed-window ``last(ignorenulls)`` sweep: ONE
  shuffle on the join key, no self-join, no Python in the path. A
  sort-merge self-join formulation would shuffle both sides and then
  re-aggregate to pick the winner; the union sweep shuffles the same bytes
  once and resolves the winner in the same window pass. Semantics mirror
  DuckDB's ``ASOF JOIN`` (inclusive inequality).

- ``range_join_binned``: point-in-interval equi-ization. A naive
  ``points JOIN ranges ON p BETWEEN lo AND hi`` plans as a broadcast
  nested-loop (or worse, a cartesian) — quadratic at scale. Binning maps
  the inequality onto an equi-join: ranges explode to the fixed-width bins
  they cover, points compute their single bin, the join runs on
  (keys…, bin) through the normal hash/sort-merge machinery, and the exact
  BETWEEN predicate filters residual false positives inside the joined
  bin. Each (point, range) match survives exactly once (a point owns one
  bin), so no post-join dedup. This is the same strategy Databricks'
  range-join optimization and Sedona's spatial binning use.

At 100 TB: asof_join moves each input row across the wire once, keyed by
the join key — the theoretical minimum for a keyed temporal join. The
window sort is per-key and spills via the standard external sorter.
range_join_binned's shuffle volume is points + ranges × bins-per-range;
``max_bins_per_range`` caps the explode fan-out so a pathological
wide interval cannot melt a task (the guard raises rather than silently
degrading).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _numeric(col: F.Column, dtype: Optional[str]):
    """Timestamps compare fine in windows, but bin arithmetic needs a
    number: cast timestamp → double (epoch seconds, microsecond fraction
    preserved)."""
    if dtype and dtype.startswith("timestamp"):
        return col.cast("double")
    return col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join (every left row survives; unmatched → nulls).

    ``backward``: latest right row with ``right.ts <= left.ts`` per key.
    ``forward``: earliest right row with ``right.ts >= left.ts``.
    ``tolerance_seconds``: matches farther than this from the left
    timestamp are nulled out (DuckDB-style post-filtered tolerance).

    Tie behavior: multiple right rows on the same (key, ts) resolve by
    struct order of the carried payload (deterministic, unlike a plain
    ``last`` over an ambiguous sort). Output columns: every left column,
    plus ``<right_ts><suffix>`` and each requested right column as
    ``<col><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    reserved = {"_t", "_side", "_p", "_lrow", "_match"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join: rename reserved columns first: {sorted(clash)}")
    keys = list(on)
    rts = right_ts or left_ts
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != rts
    ]

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    payload_type = T.StructType(
        [T.StructField("_ts", rtypes[rts])]
        + [T.StructField(c, rtypes[c]) for c in rcols]
    )
    lrow_type = T.StructType(list(left.schema.fields))

    right_u = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(rts).alias("_ts"), *[F.col(c).alias(c) for c in rcols]
        ).alias("_p"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
    )
    left_u = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    unioned = right_u.unionByName(left_u)

    # Scan order: within a key, right rows must come before any left row
    # they are allowed to match. backward → ascending time; forward →
    # descending time. _side=0 (right) sorts first at equal timestamps in
    # both cases, making the inequality inclusive. _p as the final sort
    # term makes tie resolution deterministic (last() then picks the
    # struct-order max among same-ts right rows).
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_p").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_side").asc(), F.col("_p").asc()]
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    swept = unioned.withColumn("_match", F.last("_p", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )

    if tolerance_seconds is not None:
        delta = F.abs(F.col("_t").cast("double") - F.col("_match._ts").cast("double"))
        swept = swept.withColumn(
            "_match", F.when(delta <= F.lit(float(tolerance_seconds)), F.col("_match"))
        )

    out_cols = [F.col(f"_lrow.`{c}`").alias(c) for c in left.columns]
    out_cols.append(F.col("_match._ts").alias(f"{rts}{suffix}"))
    out_cols.extend(F.col(f"_match.`{c}`").alias(f"{c}{suffix}") for c in rcols)
    return swept.select(*out_cols)


def range_join_binned(
    points: DataFrame,
    ranges: DataFrame,
    on: Sequence[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    how: str = "inner",
    max_bins_per_range: int = 1024,
) -> DataFrame:
    """Join each point row to every range row with the same key whose
    ``[start, end]`` interval contains the point (inclusive both ends).

    ``bin_width`` is in the column's native numeric unit (seconds for
    timestamps). Pick it near the typical interval length: each range then
    explodes to ~2 bins and shuffle volume stays ~2× the ranges table.
    ``max_bins_per_range`` fails loudly on degenerate inputs (an interval
    spanning > max_bins × width) instead of exploding a task.

    ``how``: ``inner`` or ``left`` (left keeps unmatched point rows with
    null range columns). Output: all point columns, then all non-key range
    columns (caller renames collisions beforehand — enforced).
    """
    if how not in ("inner", "left"):
        raise ValueError("range_join_binned supports inner and left joins")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    keys = list(on)
    overlap = (set(points.columns) & set(ranges.columns)) - set(keys)
    if overlap:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(overlap)}")
    if "_bin" in set(points.columns) | set(ranges.columns):
        raise ValueError("range_join_binned: rename reserved column '_bin' first")

    width = float(bin_width)
    p_dt = dict(points.dtypes)
    r_dt = dict(ranges.dtypes)

    s_num = _numeric(F.col(start_col), r_dt.get(start_col))
    e_num = _numeric(F.col(end_col), r_dt.get(end_col))
    n_bins = (F.floor(e_num / width) - F.floor(s_num / width) + 1).cast("int")
    # the guard lives INSIDE the exploded expression — a standalone guard
    # column would be pruned away by Catalyst before it could ever fire
    bins_or_error = F.when(
        n_bins <= max_bins_per_range,
        F.sequence(F.floor(s_num / width), F.floor(e_num / width)),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("range_join_binned: interval spans "),
                n_bins.cast("string"),
                F.lit(f" bins > max_bins_per_range={max_bins_per_range}; raise bin_width"),
            )
        )
    )
    r_binned = ranges.withColumn("_bin", F.explode(bins_or_error)).alias("_rj")
    p_binned = points.withColumn(
        "_bin", F.floor(_numeric(F.col(point_col), p_dt.get(point_col)) / width)
    ).alias("_pj")

    p_val = _numeric(F.col(f"_pj.`{point_col}`"), p_dt.get(point_col))
    cond = (
        (F.col("_pj.`_bin`") == F.col("_rj.`_bin`"))
        & (p_val >= _numeric(F.col(f"_rj.`{start_col}`"), r_dt.get(start_col)))
        & (p_val <= _numeric(F.col(f"_rj.`{end_col}`"), r_dt.get(end_col)))
    )
    for k in keys:
        cond = cond & (F.col(f"_pj.`{k}`") == F.col(f"_rj.`{k}`"))
    joined = p_binned.join(r_binned, cond, how)

    out = [F.col(f"_pj.`{c}`").alias(c) for c in points.columns]
    out.extend(
        F.col(f"_rj.`{c}`").alias(c) for c in ranges.columns if c not in keys
    )
    return joined.select(*out)
