"""spark_streaming_sql_s3_connector_spark — a PySpark-native analytics engine with the
capabilities of aws-samples/spark-streaming-sql-s3-connector.

The reference (at /root/reference, Scala 2.12 / Spark 3.2.1) is a Spark
Structured Streaming *source* that discovers new S3 files from queue
notifications instead of listing, tracks seen files in a RocksDB metadata
log for exactly-once admission, and delegates all relational work to stock
Spark (reference S3ConnectorSource.scala:159-181).

This package re-expresses that Spark-first for PySpark 4.x:

- ``sources/``    — a Python Data Source (``pyspark.sql.datasource``)
                    registered as ``s3-connector``: batch + stream readers,
                    Arrow-batched executor-side file reads.
- ``state/``      — driver-side exactly-once state plane: file cache,
                    JSON metadata log, file validator (reference
                    S3ConnectorFileCache.scala / RocksDBS3SourceLog.scala /
                    S3ConnectorFileValidator.scala, re-designed per
                    SURVEY.md §7: JSON log instead of RocksDB+JNI).
- ``queueing/``   — pluggable queue clients: local file-queue (tests,
                    no AWS) and SQS via boto3 (import-gated).
- ``streaming/``  — micro-batch orchestrator (foreachBatch-style hybrid)
                    and replay/reprocess tooling.
- ``operators/``  — large-scale training-data pipeline operators built on
                    DataFrames: dedup (exact/minhash-LSH/simhash/ngram/
                    embedding), similarity search (brute-force + LSH ANN).
- ``functions/``  — text analysis (lang-id, quality, tokens, fingerprint)
                    and multimodal (binary column) plumbing.
"""

from spark_streaming_sql_s3_connector_spark.options import S3ConnectorSourceOptions
from spark_streaming_sql_s3_connector_spark.models import FileEntry, FileMetadata, QueueMessageDesc

__version__ = "0.1.0"

__all__ = [
    "S3ConnectorSourceOptions",
    "FileEntry",
    "FileMetadata",
    "QueueMessageDesc",
]
