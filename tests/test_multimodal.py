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


# ------------------------------------------------ real-format decoding ----
# These build genuine format bytes with the stdlib only: a fully valid PNG
# (correct chunk CRCs, decompressible IDAT), a structurally valid JPEG
# header sequence (SOI/APP0/DQT/SOF0 — what every real JPEG's metadata
# region looks like), and a WAV written by the `wave` module itself.

import io
import struct
import wave
import zlib

from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
    decode_audio_payload,
    decode_image_payload,
    sniff_format,
)


def make_png(width: int, height: int, color_type: int = 6) -> bytes:
    """Real PNG: signature + IHDR + IDAT (zlib raw scanlines) + IEND,
    with correct per-chunk CRC32s. color_type 6 = RGBA."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * (width * channels) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg_header(width: int, height: int, ncomp: int = 3) -> bytes:
    """Structurally valid JPEG metadata region: SOI, APP0/JFIF, DQT,
    SOF0 (baseline frame header carrying the dimensions)."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)  # table 0, 64 dummy entries
    sof_body = struct.pack(">BHHB", 8, height, width, ncomp) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp)
    )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    return b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt) + seg(0xC0, sof_body)


def make_wav(sample_rate: int, n_frames: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x01" * n_frames * channels)
    return buf.getvalue()


def test_sniff_format():
    assert sniff_format(make_png(3, 2)) == "png"
    assert sniff_format(make_jpeg_header(10, 20)) == "jpeg"
    assert sniff_format(make_wav(8000, 100)) == "wav"
    assert sniff_format(b"plain text payload") == "fake"
    assert sniff_format(b"") == "fake"
    # RIFF but not WAVE (e.g. AVI) is not claimed as wav
    assert sniff_format(b"RIFF\x00\x00\x00\x00AVI LIST") == "fake"


def test_decode_real_png():
    for w, h, ct, ch in [(640, 480, 6, 4), (1, 1, 0, 1), (65535, 3, 2, 3)]:
        assert decode_image_payload(make_png(w, h, ct)) == (w, h, ch, "png")


def test_decode_real_jpeg():
    assert decode_image_payload(make_jpeg_header(1920, 1080)) == (1920, 1080, 3, "jpeg")
    assert decode_image_payload(make_jpeg_header(8, 8, 1)) == (8, 8, 1, "jpeg")
    # progressive (SOF2) carries the same frame-header layout
    prog = make_jpeg_header(320, 240).replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_image_payload(prog) == (320, 240, 3, "jpeg")


def test_decode_real_wav():
    payload = make_wav(16000, 16000, channels=2)  # 1 s stereo
    assert decode_audio_payload(payload) == (16000, 16000, 1000)
    payload = make_wav(44100, 2205)  # 50 ms mono
    assert decode_audio_payload(payload) == (44100, 2205, 50)


def test_decode_wav_truncated_data_chunk():
    # streamed writes often truncate the final data chunk; the parser
    # sizes by available bytes instead of the declared chunk length
    full = make_wav(8000, 800)
    truncated = full[: len(full) - 400]  # drop 200 16-bit mono frames
    sr, n_frames, dur = decode_audio_payload(truncated)
    assert (sr, n_frames) == (8000, 600)


def test_malformed_real_formats_fall_back_to_fake():
    # PNG signature but garbage after it
    bad_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
    assert decode_image_payload(bad_png)[3] == "fake"
    # JPEG SOI then desynced bytes
    bad_jpeg = b"\xff\xd8\xff\xe0\x00\x04zz" + b"no marker here"
    assert decode_image_payload(bad_jpeg)[3] == "fake"
    # JPEG that hits SOS before any SOF
    sos_first = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xDA, 4) + b"\x01\x00"
    assert decode_image_payload(sos_first)[3] == "fake"
    # RIFF/WAVE with no fmt chunk
    bad_wav = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    n = len(bad_wav)
    assert decode_audio_payload(bad_wav) == (8000 * (1 + n % 3), n * 2, n * 2 * 1000 // (8000 * (1 + n % 3)))
    # zero-dimension PNG is rejected, not returned
    assert decode_image_payload(make_png(3, 2)[:16] + struct.pack(">II", 0, 5) + make_png(3, 2)[24:])[3] == "fake"


def test_real_bytes_through_spark_decoders(spark):
    """End-to-end: real PNG/JPEG/WAV payloads mixed with synthetic text
    payloads through the mapInPandas decoders — real formats get real
    metadata, text keeps the fake-codec contract the oracles pin."""
    rows = [
        (1, bytearray(make_png(640, 480))),
        (2, bytearray(make_jpeg_header(1920, 1080))),
        (3, bytearray(make_wav(16000, 8000))),  # 0.5 s
        (4, bytearray(b"just some document text")),
    ]
    df = spark.createDataFrame(rows, "doc_id: int, payload: binary")

    img = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (img[1].width, img[1].height, img[1].channels, img[1].format) == (640, 480, 4, "png")
    assert (img[2].width, img[2].height, img[2].format) == (1920, 1080, "jpeg")
    assert img[4].format == "fake"
    n = len(b"just some document text")
    assert (img[4].width, img[4].height) == (n % 64 + 1, n % 48 + 1)

    aud = {r.doc_id: r for r in decode_audio_meta(df).collect()}
    assert (aud[3].sample_rate, aud[3].n_samples, aud[3].duration_ms) == (16000, 8000, 500)
    assert aud[4].n_samples == n * 2  # fake-codec contract intact


# ------------------------------------------------------------- MP4 ----


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def make_mp4(sample_sizes, chunks, timescale=1000, duration=5000):
    """Minimal but REAL ISO-BMFF file: ftyp + mdat (samples laid out per
    ``chunks`` = list of samples-per-chunk) + moov(mvhd, trak(mdia(hdlr
    'vide', minf(stbl(stsz, stsc, stco))))). Returns (bytes, expected
    [(offset, size)] per sample)."""
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(bytes([i % 251]) * s for i, s in enumerate(sample_sizes))
    mdat = _box(b"mdat", mdat_payload)
    mdat_body = len(ftyp) + 8

    # chunk offsets + expected per-sample (offset, size)
    chunk_offs, expected = [], []
    off = mdat_body
    si = 0
    for per in chunks:
        chunk_offs.append(off)
        for _ in range(per):
            expected.append((off, sample_sizes[si]))
            off += sample_sizes[si]
            si += 1
    assert si == len(sample_sizes)

    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">II", timescale, duration) + b"\x00" * 80,
    )
    hdlr = _box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" + b"vide" + b"\x00" * 12)
    stsz = _box(
        b"stsz",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, len(sample_sizes))
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    # stsc runs: collapse identical consecutive samples-per-chunk
    runs = []
    for ci, per in enumerate(chunks, start=1):
        if not runs or runs[-1][1] != per:
            runs.append((ci, per))
    stsc = _box(
        b"stsc",
        b"\x00\x00\x00\x00" + struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", first, per, 1) for first, per in runs),
    )
    stco = _box(
        b"stco",
        b"\x00\x00\x00\x00" + struct.pack(">I", len(chunk_offs))
        + b"".join(struct.pack(">I", o) for o in chunk_offs),
    )
    stbl = _box(b"stbl", stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov, expected


def test_mp4_mvhd_metadata():
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_video_payload,
        sniff_format,
    )

    mp4, _ = make_mp4([10, 20, 30], [3], timescale=600, duration=1200)
    assert sniff_format(mp4) == "mp4"
    duration_ms, timescale, n_tracks, fmt = decode_video_payload(mp4)
    assert (duration_ms, timescale, n_tracks, fmt) == (2000, 600, 1, "mp4")


def test_mp4_sample_table_offsets():
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        _mp4_video_samples,
    )

    sizes = [10, 20, 30, 40, 50]
    mp4, expected = make_mp4(sizes, [2, 3])
    got = _mp4_video_samples(mp4)
    assert got == expected
    # the declared sample bytes really live inside the file
    for off, size in got:
        assert off + size <= len(mp4)


def test_mp4_malformed_falls_back_to_fake():
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_video_payload,
    )

    junk = _box(b"ftyp", b"isom") + b"\x00" * 32  # ftyp but no moov
    d, ts, nt, fmt = decode_video_payload(junk)
    assert fmt == "fake" and ts == 1000


def test_sample_frames_real_mp4_offsets(spark):
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        sample_frames,
    )

    sizes = [10, 20, 30, 40, 50, 60]
    mp4, expected = make_mp4(sizes, [2, 2, 2])
    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(b"not a video, fake path"))],
        "doc_id: int, payload: binary",
    )
    out = sample_frames(df, every_n=2)
    mp4_rows = sorted(
        ((r.frame_idx, r.frame_offset, r.frame_n_bytes)
         for r in out.where(F.col("doc_id") == 1).collect())
    )
    assert mp4_rows == [(i, expected[i][0], expected[i][1]) for i in (0, 2, 4)]
    # the fake path still follows the 64-byte contract the oracles pin
    fake_rows = out.where(F.col("doc_id") == 2).collect()
    assert all(r.frame_offset == r.frame_idx * 64 for r in fake_rows)


def test_decode_video_meta_mapinpandas(spark):
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_video_meta,
    )

    mp4, _ = make_mp4([16, 16], [2], timescale=1000, duration=250)
    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(b"plain text"))],
        "doc_id: int, payload: binary",
    )
    rows = {r.doc_id: r for r in decode_video_meta(df).collect()}
    assert (rows[1].duration_ms, rows[1].n_tracks, rows[1].format) == (250, 1, "mp4")
    assert rows[2].format == "fake"


def test_mp4_corrupt_counts_fall_back_not_allocate():
    """A corrupt stsz claiming 2^32-1 samples must be rejected by box-
    extent bounds, not allocated (per-row memory bomb otherwise)."""
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        _mp4_video_samples,
        sample_frames,  # noqa: F401  (import parity)
    )

    mp4, _ = make_mp4([10, 20], [2])
    # corrupt the stsz sample count in place: find the stsz box and
    # overwrite its 32-bit count with 0xFFFFFFFF
    i = mp4.index(b"stsz")
    corrupted = bytearray(mp4)
    corrupted[i + 4 + 8 : i + 4 + 12] = b"\xff\xff\xff\xff"
    assert _mp4_video_samples(bytes(corrupted)) is None
    # uniform-size variant: count bounded by payload length
    j = mp4.index(b"stsz")
    corrupted2 = bytearray(mp4)
    corrupted2[j + 4 + 4 : j + 4 + 8] = b"\x00\x00\x00\x10"  # uniform=16
    corrupted2[j + 4 + 8 : j + 4 + 12] = b"\xff\xff\xff\xff"
    assert _mp4_video_samples(bytes(corrupted2)) is None


# ------------------------------------------------------- PNG pixel path


def _png_from_pixels(arr, filters):
    """Forward-filter `arr` (h, w, c uint8) with the given per-row PNG
    filter types and assemble a real PNG — the hand-rolled fixture the
    decoder's unfiltering is checked against (spec §6 reference
    arithmetic, written out longhand here on purpose)."""
    import numpy as np

    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y, ftype in zip(range(h), filters):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        line = bytearray([ftype])
        for x in range(stride):
            a = int(cur[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                v = cur[x]
            elif ftype == 1:
                v = cur[x] - a
            elif ftype == 2:
                v = cur[x] - b
            elif ftype == 3:
                v = cur[x] - ((a + b) >> 1)
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = cur[x] - pred
            line.append(int(v) & 0xFF)
        raw += line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _rand_pixels(h, w, c, seed=7):
    import random

    import numpy as np

    rng = random.Random(seed)
    return np.asarray(
        [[[rng.randrange(256) for _ in range(c)] for _ in range(w)] for _ in range(h)],
        dtype=np.uint8,
    )


def test_png_decode_reverses_every_filter_type():
    """Rows filtered with each of the five spec filters decode back to
    the original pixels (fixture applies the FORWARD filters longhand)."""
    import numpy as np

    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_png_pixels,
    )

    px = _rand_pixels(5, 4, 3)
    payload = _png_from_pixels(px, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png_pixels(payload), px)
    # grayscale + alpha too (different bpp for sub/paeth lookback)
    px2 = _rand_pixels(5, 3, 2, seed=9)
    assert np.array_equal(
        decode_png_pixels(_png_from_pixels(px2, [4, 3, 2, 1, 0])), px2
    )


def test_png_encode_decode_roundtrip_and_determinism():
    import numpy as np

    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    px = _rand_pixels(6, 5, 4, seed=3)
    out = encode_png(px)
    assert sniff_format(out) == "png"
    assert np.array_equal(decode_png_pixels(out), px)
    assert encode_png(px) == out  # byte-identical: md5-oracle-able


def test_png_pixel_decode_rejects_unsupported_honestly():
    import pytest

    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_png_pixels,
    )

    good = _png_from_pixels(_rand_pixels(2, 2, 3), [0, 0])
    with pytest.raises(ValueError, match="bit depth 8"):
        decode_png_pixels(good[:24] + b"\x10" + good[25:])  # depth 16
    with pytest.raises(ValueError, match="bit depth 8"):  # palette
        decode_png_pixels(good[:25] + b"\x03" + good[26:])
    with pytest.raises(ValueError, match="interlaced"):
        decode_png_pixels(good[:28] + b"\x01" + good[29:])


def test_resize_nearest_known_values():
    import numpy as np

    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        _resize_nearest,
    )

    # 4x4 single-channel ramp -> 2x2 picks pixel centers (1,1),(1,3),...
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    got = _resize_nearest(px, (2, 2))
    assert got[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # upscale replicates
    up = _resize_nearest(np.asarray([[[1], [2]]], dtype=np.uint8), (4, 2))
    assert up[:, :, 0].tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]


def test_resize_images_dataframe_path(spark):
    """The Spark surface: PNG rows come back re-encoded at the target
    size (decodable, deterministic), non-PNG codecs are rejected
    per-row with a reason — never faked."""
    import numpy as np

    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        decode_png_pixels,
        resize_images,
    )

    px = _rand_pixels(8, 6, 3, seed=5)
    rows = [
        (1, bytearray(_png_from_pixels(px, [0, 1, 2, 3, 4, 0, 1, 2]))),
        (2, bytearray(make_jpeg_header(64, 32))),
        (3, bytearray(b"\x00" * 40)),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r.id: r for r in resize_images(df, size=(4, 4)).collect()}
    assert set(out[1].asDict()) == {
        "id", "payload", "width", "height", "channels", "resize_error"
    }
    assert (out[1].width, out[1].height, out[1].channels) == (4, 4, 3)
    assert out[1].resize_error is None
    got = decode_png_pixels(bytes(out[1].payload))
    assert got.shape == (4, 4, 3)
    # resized pixels are the nearest-neighbor mapping of the source
    from spark_streaming_sql_s3_connector_spark.functions.multimodal import (
        _resize_nearest,
    )

    assert np.array_equal(got, _resize_nearest(px, (4, 4)))
    assert out[2].payload is None and "unsupported codec: jpeg" in out[2].resize_error
    assert out[3].payload is None and "unsupported codec" in out[3].resize_error
