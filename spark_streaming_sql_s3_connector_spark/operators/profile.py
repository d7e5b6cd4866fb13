"""Dataset profiling: per-column statistics in ONE pass over the data.

Before a corpus feeds a training run you validate it: row counts, null
rates, cardinalities, value ranges — per column, cheaply, at full scale.
This operator computes them all in a single aggregation over one scan
(the reference's relational surface stops at per-query aggregation; this
is the data-quality companion every large-scale pipeline bolts on).

Two cardinality modes:

- ``approx_distinct=True`` (the 100 TB default): HyperLogLog++ sketches
  via ``approx_count_distinct`` — single-pass, mergeable partials, NO
  extra shuffle beyond the 1-row-per-partition partial-agg reduce, and
  no row expansion. Error is ``rsd`` (default 5%).
- ``approx_distinct=False`` (exact, the oracle mode): multiple
  ``COUNT(DISTINCT col)`` in one agg. Catalyst plans this as one Expand
  (k+1 projections for k distinct aggs) followed by a shuffle keyed on
  the distinct values — fully distributed and mergeable, but the scan's
  row volume is multiplied by the number of profiled columns. Correct
  at any scale; pay it when you need exact cardinalities.

Everything else (counts, null counts, min/max) is a plain partial
aggregate: map-side combine into one row per partition, one tiny reduce.
No Python, no UDFs — the whole profile is JVM expressions inside
whole-stage codegen.

Min/max are rendered to STRINGS with a deterministic, engine-portable
format (numerics via DECIMAL(28,6), timestamps via ``yyyy-MM-dd
HH:mm:ss``, dates/booleans/strings via their canonical cast) so one
profile schema covers heterogeneous columns and cross-engine value
hashes agree. Unsupported types (arrays, maps, binary) keep their
counts but emit NULL min/max — counting is type-agnostic, ordering is
not.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fingerprint_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One-row content fingerprint of a dataset — the lineage stamp a
    pipeline writes next to its outputs so a rerun can PROVE it consumed
    the same corpus version without re-reading it.

    The fingerprint is md5 over the exact profile's canonical rendering
    (per column: name, row/null/distinct counts, min/max strings,
    sorted by column name, ``|``/``;``-delimited) — so it is insensitive
    to row order, partitioning, and engine, but flips on any membership
    or value change that moves a count, a cardinality, or a range
    boundary. It is a PROFILE fingerprint, not a cryptographic content
    hash: two corpora that agree on every per-column statistic collide
    by construction (the cheap stamp for 100 TB; use
    ``dedup.dedup_exact``'s md5 keys when row-level identity matters).

    Cost: exactly one :func:`profile_table` pass (exact mode — the
    fingerprint must be deterministic, so no HLL). Returns
    ``n_rows | n_columns | fingerprint``."""
    prof = profile_table(df, columns, approx_distinct=False)
    row_render = F.concat_ws(
        "|",
        F.col("col_name"),
        F.col("n_rows").cast("string"),
        F.col("n_null").cast("string"),
        F.col("n_distinct").cast("string"),
        F.coalesce(F.col("min_value"), F.lit("\x00NULL")),
        F.coalesce(F.col("max_value"), F.lit("\x00NULL")),
    )
    return prof.select(
        "n_rows", F.struct("col_name").alias("_k"), row_render.alias("_r")
    ).groupBy().agg(
        F.max("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_columns"),
        F.md5(
            F.concat_ws(
                ";",
                F.array_sort(F.collect_list(F.struct("_k", "_r"))).getField(
                    "_r"
                ),
            )
        ).alias("fingerprint"),
    )


def _render(col: Column, dtype: T.DataType) -> Optional[Column]:
    """Engine-portable string rendering for min/max values, or None if
    the type has no portable ordering (array/map/struct/binary)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                          T.FloatType, T.DoubleType, T.DecimalType)):
        # DECIMAL(28,6) → string gives the same '123.456700' text in
        # Spark and DuckDB; double formatting ('1.0E7') would not.
        return col.cast("decimal(28,6)").cast("string")
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dtype, (T.TimestampNTZType,)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dtype, (T.DateType, T.BooleanType, T.StringType)):
        return col.cast("string")
    return None


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile of ``df`` in one aggregation pass.

    Returns one row per profiled column, ordered by column name::

        col_name | n_rows | n_null | n_distinct | min_value | max_value

    ``n_distinct`` ignores NULLs (COUNT DISTINCT semantics) and is exact
    unless ``approx_distinct`` (HLL++, tolerance ``rsd``). ``min_value``
    / ``max_value`` are portable strings (see module docstring) and NULL
    for types without portable ordering or for all-NULL columns.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in DataFrame")
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_nn_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col, rsd).alias(f"_nd_{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"_nd_{c}"))
        # aggregate in the NATIVE type, render the result: min of the
        # decimal-string rendering would be lexicographic ('10.0' < '2.0')
        rendered_min = _render(F.min(col), by_name[c])
        if rendered_min is None:
            aggs.append(F.lit(None).cast("string").alias(f"_min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"_max_{c}"))
        else:
            aggs.append(rendered_min.alias(f"_min_{c}"))
            aggs.append(_render(F.max(col), by_name[c]).alias(f"_max_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.col("_n_rows").alias("n_rows"), F.explode(entries).alias("e"))
        .select(
            F.col("e.col_name").alias("col_name"),
            F.col("n_rows"),
            F.col("e.n_null").alias("n_null"),
            F.col("e.n_distinct").alias("n_distinct"),
            F.col("e.min_value").alias("min_value"),
            F.col("e.max_value").alias("max_value"),
        )
        .orderBy("col_name")
    )
