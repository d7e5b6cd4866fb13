"""S3 event-notification JSON parsing.

Mirrors the reference's parseSqsMessage (AsyncSqsClientImpl.scala:321-360):
extract ``Records[0].s3.bucket.name`` + ``.object.key`` (URL-decoded),
``eventName`` (must contain "ObjectCreated"), ``eventTime``
(ISO8601 ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` → epoch ms, Utils.scala:67-72).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Optional
from urllib.parse import unquote

from spark_streaming_sql_s3_connector_spark.models import FileMetadata


class S3EventParseError(ValueError):
    pass


class S3EventNotCreated(ValueError):
    """Parsed fine but not an ObjectCreated event (discarded + deleted,
    AsyncSqsClientImpl.scala:333-349)."""


def iso8601_to_epoch_ms(s: str) -> int:
    # accept both with and without fractional seconds / trailing Z
    s2 = s.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s2)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def parse_s3_event(body: str, message_id: Optional[str] = None) -> FileMetadata:
    """Parse one S3 event notification body → FileMetadata.

    Raises S3EventNotCreated for non-ObjectCreated events and
    S3EventParseError for malformed bodies (e.g. ``{"Records":"bad message"}``,
    the reference's negative fixture AsyncSqsClientSuite.scala:80-85).
    """
    try:
        doc = json.loads(body)
        records = doc["Records"]
        rec = records[0]
        event_name = rec["eventName"]
        event_time = rec["eventTime"]
        bucket = rec["s3"]["bucket"]["name"]
        key = unquote(rec["s3"]["object"]["key"])
    except (KeyError, IndexError, TypeError, ValueError) as e:
        raise S3EventParseError(f"cannot parse S3 event: {e}") from e
    if "ObjectCreated" not in event_name:
        raise S3EventNotCreated(event_name)
    return FileMetadata(
        file_path=f"s3a://{bucket}/{key}" if "://" not in bucket else f"{bucket}/{key}",
        timestamp_ms=iso8601_to_epoch_ms(event_time),
        message_id=message_id,
    )


def make_s3_event_body(path: str, timestamp_ms: int, event_name: str = "ObjectCreated:Put") -> str:
    """Build an event body in the same shape S3 publishes (and the
    reference's fixtures use) for a local path — used by the file-queue
    tests and streaming fixtures."""
    if "://" in path:
        scheme_rest = path.split("://", 1)[1]
        bucket, _, key = scheme_rest.partition("/")
        bucket_field = bucket
    else:
        # local absolute path: bucket carries the scheme-less marker
        bucket_field = "file://"
        key = path.lstrip("/")
    dt = datetime.fromtimestamp(timestamp_ms / 1000.0, tz=timezone.utc)
    event_time = dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"
    return json.dumps(
        {
            "Records": [
                {
                    "eventVersion": "2.1",
                    "eventSource": "aws:s3",
                    "eventTime": event_time,
                    "eventName": event_name,
                    "s3": {
                        "s3SchemaVersion": "1.0",
                        "bucket": {"name": bucket_field},
                        "object": {"key": key, "size": 0},
                    },
                }
            ]
        }
    )
