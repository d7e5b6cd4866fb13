"""Z-order (Morton) multi-column clustering — file skipping for scans
that filter on MORE than one column.

Range-clustering on one column (``compact_dataset(cluster_by=...)``)
makes parquet footer min/max stats exact for that column and useless for
every other. Z-ordering interleaves the bits of several columns'
quantile-bucket ranks, so files end up covering a small hyper-rectangle
of the combined key space: predicates on ANY prefix-free subset of the
z-columns skip most files. This is the same maintenance operation as
Delta Lake's ``OPTIMIZE ... ZORDER BY`` — expressed here in three plain
DataFrame steps:

1. per-column quantile boundaries via ``approxQuantile`` (driver gets
   ≤2^bits scalars per column — bounded, the Greenwald-Khanna sketch
   runs distributed);
2. bucket rank per row via ``size(filter(lit(boundaries), b -> b <= x))``
   — an array higher-order function over ≤255 broadcast scalars, fully
   JVM-side, no UDF;
3. Morton code via shiftleft/or arithmetic, then
   ``repartitionByRange(n, z) . sortWithinPartitions(z)`` — ONE shuffle,
   the same shuffle any compaction pays.

Quantile bucketing (not min/max linear scaling) makes the interleave
robust to skew: each bucket holds ~1/2^bits of the rows regardless of the
value distribution.

Column types: numeric and timestamp columns keep range locality
(range + equality predicates prune). String/binary columns are folded in
via ``xxhash64`` — locality is destroyed, but files still cluster by
value, so EQUALITY predicates prune; documented trade-off, loudly chosen
here rather than silently wrong.

At 100 TB: the sketch pass reads each z-column once (column-pruned scan);
the rewrite is one range shuffle of the data being compacted — identical
cost shape to plain compaction. Nulls rank as bucket 0 and cluster
together.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def _rankable(df: DataFrame, col: str) -> Column:
    """A double-valued, order-preserving (or for strings, value-grouping)
    view of the column for quantile bucketing."""
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype.startswith("timestamp") or dtype == "date":
        return c.cast("timestamp").cast("double")
    if any(dtype.startswith(p) for p in _NUMERIC_PREFIXES) or dtype == "boolean":
        return c.cast("double")
    if dtype in ("string", "binary"):
        # hash fold: equality pruning survives, range locality does not
        return F.xxhash64(c).cast("double")
    raise ValueError(f"zorder: unsupported column type {col}: {dtype}")


def zorder_code(df: DataFrame, cols: Sequence[str], bits: int = 8) -> Column:
    """The Morton interleave of ``cols``' quantile-bucket ranks as a
    BIGINT column expression (requires ``len(cols) * bits <= 63``).

    Runs one distributed approxQuantile pass per call to learn bucket
    boundaries; the returned expression itself is pure JVM arithmetic.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder: need at least one column")
    if len(cols) * bits > 63:
        raise ValueError(f"zorder: {len(cols)} cols x {bits} bits exceeds 63-bit code")
    n_buckets = 1 << bits
    probes = [i / n_buckets for i in range(1, n_buckets)]

    ranked = {c: _rankable(df, c) for c in cols}
    probe_df = df.select(*[ranked[c].alias(f"_z{i}") for i, c in enumerate(cols)])
    # one job, all columns: GK sketch per column, driver receives
    # (n_buckets-1) doubles per column
    boundaries = probe_df.stat.approxQuantile(
        [f"_z{i}" for i in range(len(cols))], probes, 1.0 / (4 * n_buckets)
    )

    code = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        arr = F.lit([float(b) for b in boundaries[i]])
        x = ranked[c]
        bucket = F.size(F.filter(arr, lambda b: b <= x)).cast("bigint")
        # spread bucket j's bits to positions j*len(cols)+i of the code
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1).cast("bigint"))
            code = code.bitwiseOR(F.shiftleft(bit, j * len(cols) + i))
    return code


def zorder_dataframe(df: DataFrame, cols: Sequence[str], n_files: int, bits: int = 8) -> DataFrame:
    """Shape ``df`` so a write produces ``n_files`` z-clustered files:
    range-partition + sort on the Morton code (one shuffle)."""
    z = zorder_code(df, cols, bits=bits)
    return (
        df.withColumn("_zorder", z)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
