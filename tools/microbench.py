"""Per-key microbench: bench.py's session/warmup/timing discipline over
an arbitrary subset of registry keys. Usage:

    python tools/microbench.py [-r REPS] key [key ...]

Interleaved reps (round-robin, like bench.py), per-key median printed as
one JSON line. For before/after comparisons during optimization work —
NOT the driver contract (that stays bench.py)."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
# match bench.py's BLAS threading (see the comment there)
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    keys = args
    if not keys:
        print("usage: microbench.py [-r N] key [key ...]", file=sys.stderr)
        sys.exit(2)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("microbench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_streaming_sql_s3_connector_spark.session import (
        apply_engine_defaults,
    )

    apply_engine_defaults(spark)  # discovery threshold (see session.py)

    from spark_streaming_sql_s3_connector_spark.plans.io import load_table

    load_table(spark, SF_DIR, "lineitem").count()
    try:
        from spark_streaming_sql_s3_connector_spark.operators.dedup import (
            minhash_near_dup_pairs,
        )

        warm_docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        minhash_near_dup_pairs(
            warm_docs, "text", "doc_id", jaccard_threshold=0.5
        ).count()
    except Exception as e:
        print(f"# warmup skipped: {e}", file=sys.stderr)

    qs = entrymod.queries()
    samples: dict[str, list[float]] = {}
    for rep in range(reps):
        for name in keys:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"microbench:{name}:rep{rep}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = round(time.time() - t0, 3)
            samples.setdefault(name, []).append(dt)
            print(f"# rep{rep} {name}: {dt}s ({n} rows)", file=sys.stderr, flush=True)
            spark.sparkContext.setJobDescription(None)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    print(json.dumps({k: round(median(v), 3) for k, v in samples.items()}))


if __name__ == "__main__":
    main()
