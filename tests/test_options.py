"""Ports of S3ConnectorSourceOptionsSuite (reference scala:25-109)."""

import pytest

from spark_streaming_sql_s3_connector_spark.options import (
    ReprocessState,
    S3ConnectorSourceOptions,
    time_string_as_ms,
)

BASE = {
    "spark.s3conn.fileFormat": "csv",
    "spark.s3conn.queueUrl": "https://sqs.us-east-1.amazonaws.com/1/q",
    "spark.s3conn.queueRegion": "us-east-1",
}


def test_defaults():
    o = S3ConnectorSourceOptions.parse(BASE)
    assert o.max_files_per_trigger == 100
    assert o.max_file_age_ms == 15 * 24 * 3600 * 1000
    assert o.sqs_long_poll_wait_time_seconds == 10
    assert o.queue_fetch_wait_timeout_seconds == 20
    assert o.sqs_max_retries == 10
    assert o.sqs_max_concurrency == 50
    assert o.sqs_visibility_timeout_seconds == 60
    assert o.sqs_keep_message_for_consumer_error is False
    assert o.reprocess_state is ReprocessState.NO_REPROCESS
    assert o.reprocess_dry_run is True


def test_max_files_per_trigger_negative_means_unlimited():
    o = S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.maxFilesPerTrigger": "-1"})
    assert o.max_files_per_trigger is None
    o = S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.maxFilesPerTrigger": "0"})
    assert o.max_files_per_trigger is None
    o = S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.maxFilesPerTrigger": "7"})
    assert o.max_files_per_trigger == 7


def test_file_format_mandatory():
    params = {k: v for k, v in BASE.items() if k != "spark.s3conn.fileFormat"}
    with pytest.raises(ValueError, match="fileFormat"):
        S3ConnectorSourceOptions.parse(params)


def test_queue_url_mandatory():
    params = {k: v for k, v in BASE.items() if k != "spark.s3conn.queueUrl"}
    with pytest.raises(ValueError, match="queueUrl"):
        S3ConnectorSourceOptions.parse(params)


def test_queue_region_mandatory_for_sqs_only():
    params = {k: v for k, v in BASE.items() if k != "spark.s3conn.queueRegion"}
    with pytest.raises(ValueError, match="queueRegion"):
        S3ConnectorSourceOptions.parse(params)
    o = S3ConnectorSourceOptions.parse({**params, "spark.s3conn.queueType": "local"})
    assert o.queue_region == ""


def test_long_poll_bounds():
    with pytest.raises(ValueError):
        S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.sqs.longPollingWaitTimeSeconds": "21"})
    with pytest.raises(ValueError):
        S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.sqs.longPollingWaitTimeSeconds": "-1"})
    o = S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.sqs.longPollingWaitTimeSeconds": "0"})
    assert o.sqs_long_poll_wait_time_seconds == 0
    # reference double-dot key spelling also accepted
    o = S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn..sqs.longPollingWaitTimeSeconds": "5"})
    assert o.sqs_long_poll_wait_time_seconds == 5
    assert o.queue_fetch_wait_timeout_seconds == 10


def test_reprocess_state_machine():
    o = S3ConnectorSourceOptions.parse(BASE)
    assert o.reprocess_state is ReprocessState.NO_REPROCESS

    o = S3ConnectorSourceOptions.parse(
        {**BASE, "spark.s3conn.reprocessStartBatchId": "1", "spark.s3conn.reprocessEndBatchId": "3"}
    )
    assert o.reprocess_state is ReprocessState.DRY_RUN  # dryRun defaults true

    o = S3ConnectorSourceOptions.parse(
        {
            **BASE,
            "spark.s3conn.reprocessStartBatchId": "1",
            "spark.s3conn.reprocessEndBatchId": "3",
            "spark.s3conn.reprocessDryRun": "false",
        }
    )
    assert o.reprocess_state is ReprocessState.IN_ACTION

    # only one endpoint given → no reprocess
    o = S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.reprocessStartBatchId": "1"})
    assert o.reprocess_state is ReprocessState.NO_REPROCESS


def test_reprocess_start_greater_than_end_raises():
    with pytest.raises(ValueError, match="less than or equal"):
        S3ConnectorSourceOptions.parse(
            {**BASE, "spark.s3conn.reprocessStartBatchId": "5", "spark.s3conn.reprocessEndBatchId": "3"}
        )


def test_reprocess_negative_id_raises():
    with pytest.raises(ValueError, match="zero or a positive"):
        S3ConnectorSourceOptions.parse({**BASE, "spark.s3conn.reprocessStartBatchId": "-2"})


def test_time_string_parse():
    assert time_string_as_ms("15d") == 15 * 86400_000
    assert time_string_as_ms("100s") == 100_000
    assert time_string_as_ms("250") == 250
    assert time_string_as_ms("2h") == 7200_000
    with pytest.raises(ValueError):
        time_string_as_ms("nope")


def test_reader_options_passthrough():
    o = S3ConnectorSourceOptions.parse({**BASE, "header": "true", "sep": "|", "mode": "DROPMALFORMED"})
    assert o.reader_options["header"] == "true"
    assert o.reader_options["sep"] == "|"
    assert o.reader_options["mode"] == "DROPMALFORMED"
