from spark_streaming_sql_s3_connector_spark.queueing.base import QueueClient, QueueClientMetrics, QueueMessage
from spark_streaming_sql_s3_connector_spark.queueing.events import parse_s3_event
from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient
from spark_streaming_sql_s3_connector_spark.queueing.factory import create_queue_client

__all__ = [
    "QueueClient",
    "QueueClientMetrics",
    "QueueMessage",
    "parse_s3_event",
    "LocalFileQueueClient",
    "create_queue_client",
]
