"""Queue-client construction from parsed source options."""

from __future__ import annotations

from spark_streaming_sql_s3_connector_spark.options import LOCAL_QUEUE, SQS_QUEUE, S3ConnectorSourceOptions
from spark_streaming_sql_s3_connector_spark.queueing.base import QueueClient
from spark_streaming_sql_s3_connector_spark.queueing.local import LocalFileQueueClient


def create_queue_client(options: S3ConnectorSourceOptions) -> QueueClient:
    if options.queue_type.lower() == LOCAL_QUEUE:
        return LocalFileQueueClient(
            options.queue_url,
            visibility_timeout_seconds=options.sqs_visibility_timeout_seconds,
            keep_message_for_consumer_error=options.sqs_keep_message_for_consumer_error,
        )
    if options.queue_type == SQS_QUEUE:
        from spark_streaming_sql_s3_connector_spark.queueing.sqs import SqsQueueClient

        return SqsQueueClient(
            options.queue_url,
            region=options.queue_region,
            long_poll_wait_seconds=options.sqs_long_poll_wait_time_seconds,
            visibility_timeout_seconds=options.sqs_visibility_timeout_seconds,
            max_retries=options.sqs_max_retries,
            max_concurrency=options.sqs_max_concurrency,
            keep_message_for_consumer_error=options.sqs_keep_message_for_consumer_error,
        )
    raise ValueError(f"Unknown queue type: {options.queue_type}")
