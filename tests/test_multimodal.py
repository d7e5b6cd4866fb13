"""Multimodal plumbing: schema, fan-out, and edge cases of the
binary-column operators (fake codecs, real Arrow/mapInPandas shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
    _FAKE_FRAME_BYTES,
    decode_audio_meta,
    decode_image_meta,
    sample_frames,
    with_binary_payload,
)


def _docs(spark):
    rows = [
        (1, "a" * 300, "keep1"),
        (2, "", "keep2"),  # empty payload
        (3, "b" * 64, "keep3"),  # exactly one frame
        (4, "c" * 65, "keep4"),  # one full + one partial frame
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "tag"])


def test_image_meta_schema_and_passthrough(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = decode_image_meta(df.select("doc_id", "tag", "payload"))
    assert out.columns == ["doc_id", "tag", "width", "height", "channels", "format", "n_bytes"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 300 and rows[1].tag == "keep1"
    assert rows[2].n_bytes == 0


def test_audio_meta_deterministic(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = decode_audio_meta(df.select("doc_id", "payload"))
    rows = {r.doc_id: r for r in out.collect()}
    n = 300
    sr = 8000 * (1 + n % 3)
    assert rows[1].sample_rate == sr
    assert rows[1].n_samples == n * 2
    assert rows[1].duration_ms == n * 2 * 1000 // sr


def test_frame_sampling_fanout(spark):
    df = with_binary_payload(_docs(spark), "text")
    out = sample_frames(df.select("doc_id", "tag", "payload"), every_n=2)
    assert out.columns == ["doc_id", "tag", "frame_idx", "frame_offset", "frame_n_bytes"]
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    # 300 bytes → 5 frames (0..4), sampled 0,2,4
    assert [r.frame_idx for r in sorted(by_doc[1], key=lambda r: r.frame_idx)] == [0, 2, 4]
    last = max(by_doc[1], key=lambda r: r.frame_idx)
    assert last.frame_n_bytes == 300 - 4 * _FAKE_FRAME_BYTES
    # empty payload → zero frames, row disappears (not a null row)
    assert 2 not in by_doc
    # exactly one frame → frame 0 only, full size
    assert [(r.frame_idx, r.frame_n_bytes) for r in by_doc[3]] == [(0, 64)]
    # 65 bytes → frames 0 (64 B) and 1 (1 B); every_n=2 samples only frame 0
    assert [(r.frame_idx, r.frame_n_bytes) for r in by_doc[4]] == [(0, 64)]
    # passthrough survives fan-out
    assert all(r.tag == "keep1" for r in by_doc[1])


def test_frame_sampling_partitioning(spark):
    # plumbing must spread small inputs before the codec UDF
    df = with_binary_payload(_docs(spark), "text").select("doc_id", "payload")
    out = sample_frames(df, every_n=1)
    assert out.count() == 5 + 0 + 1 + 2


def test_fused_media_decode_matches_separate_decoders(spark):
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_audio_meta,
        decode_image_meta,
        decode_media_meta,
    )

    df = with_binary_payload(_docs(spark), "text").select("doc_id", "payload")
    fused = {r.doc_id: r for r in decode_media_meta(df).collect()}
    img = {r.doc_id: r for r in decode_image_meta(df).collect()}
    aud = {r.doc_id: r for r in decode_audio_meta(df).collect()}
    assert set(fused) == set(img) == set(aud)
    for d, r in fused.items():
        assert (r.width, r.height, r.n_bytes) == (img[d].width, img[d].height, img[d].n_bytes)
        assert (r.sample_rate, r.n_samples, r.duration_ms) == (
            aud[d].sample_rate,
            aud[d].n_samples,
            aud[d].duration_ms,
        )
