"""Sequence-packing laws.

Concat-and-split: offsets are an exact exclusive prefix sum per shard
(stream reconstruction), sequence spans match floor arithmetic, and the
total token stream length is preserved. First-fit: capacity respected,
every doc assigned exactly once, oversize docs isolated, bin count
within the FFD guarantee of the lower bound.
"""

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.operators.packing import (
    pack_concat,
    pack_first_fit,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "tok " * ((i * 37) % 211 + 1)) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_concat_offsets_are_exclusive_prefix_sums(spark, docs):
    out = pack_concat(docs, "doc_id", capacity=256, text_col="text", num_shards=8)
    rows = out.orderBy("shard", "doc_id").collect()
    stream_pos = {}
    for r in rows:
        expect = stream_pos.get(r.shard, 0)
        assert r.start_offset == expect, (r.doc_id, r.start_offset, expect)
        stream_pos[r.shard] = expect + r.n_tokens
    # total stream length = total token count
    total = docs.select(F.sum(F.size(F.split(F.trim("text"), r"\s+")))).collect()[0][0]
    assert sum(stream_pos.values()) == total


def test_concat_sequence_span_arithmetic(spark, docs):
    cap = 256
    out = pack_concat(docs, "doc_id", capacity=cap, text_col="text", num_shards=8)
    for r in out.collect():
        assert r.seq_first == r.start_offset // cap
        last_tok = max(r.start_offset + r.n_tokens - 1, r.start_offset)
        assert r.seq_last == last_tok // cap
        assert r.seq_last >= r.seq_first


def test_concat_empty_doc_attaches_at_offset(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (8, ""), (16, "d e")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in
           pack_concat(docs, "doc_id", capacity=4, text_col="text", num_shards=8).collect()}
    assert out[8].n_tokens == 0
    assert out[8].seq_first == out[8].seq_last == out[8].start_offset // 4


def test_concat_keep_cols_carry_through_unchanged(spark):
    """r14: ``keep_cols`` carries extra input columns verbatim onto each
    manifest row (the curation finalize folds lang/qscore in this way)
    WITHOUT touching the packing arithmetic — the packing columns equal
    the default call's row-for-row, and each kept value matches its
    input row's."""
    rows = [(i, ["en", "de", "fr"][i % 3], float(i) / 7.0, "tok " * (i % 11 + 1))
            for i in range(60)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, qscore double, text string"
    )
    plain = {
        r.doc_id: r
        for r in pack_concat(
            docs, "doc_id", capacity=16, text_col="text", num_shards=4
        ).collect()
    }
    kept = pack_concat(
        docs, "doc_id", capacity=16, text_col="text", num_shards=4,
        keep_cols=("lang", "qscore"),
    )
    assert kept.columns == [
        "doc_id", "lang", "qscore", "shard", "start_offset", "n_tokens",
        "seq_first", "seq_last",
    ]
    want = {(i, lang, q) for i, lang, q, _ in rows}
    got = kept.collect()
    assert {(r.doc_id, r.lang, r.qscore) for r in got} == want
    for r in got:
        p = plain[r.doc_id]
        assert (r.shard, r.start_offset, r.n_tokens, r.seq_first, r.seq_last) == (
            p.shard, p.start_offset, p.n_tokens, p.seq_first, p.seq_last
        )


def test_concat_rejects_bad_args(spark, docs):
    with pytest.raises(ValueError):
        pack_concat(docs, "doc_id", capacity=0, text_col="text")
    with pytest.raises(ValueError):
        pack_concat(docs, "doc_id", capacity=8)  # neither text nor token col
    with pytest.raises(ValueError):
        pack_concat(docs, "doc_id", capacity=8, text_col="text", token_col="text")


def test_first_fit_capacity_and_coverage(spark, docs):
    cap = 300
    out = pack_first_fit(docs, "doc_id", capacity=cap, text_col="text", num_shards=8)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc exactly once
    assert len({r.doc_id for r in rows}) == docs.count()
    fills = {}
    for r in rows:
        fills[(r.shard, r.bin_id)] = fills.get((r.shard, r.bin_id), 0) + r.n_tokens
    oversize = [r for r in rows if r.n_tokens >= cap]
    for key, fill in fills.items():
        members = [r for r in rows if (r.shard, r.bin_id) == key]
        if any(m.n_tokens >= cap for m in members):
            assert len(members) == 1  # oversize docs isolated
        else:
            assert fill <= cap
    # FFD bound per shard: bins <= 11/9 * optimal + 1, optimal >= ceil(total/cap)
    import collections
    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for shard, members in by_shard.items():
        n_bins = len({m.bin_id for m in members})
        small_total = sum(m.n_tokens for m in members if m.n_tokens < cap)
        n_over = sum(1 for m in members if m.n_tokens >= cap)
        lower = math.ceil(small_total / cap) + n_over
        assert n_bins <= math.ceil(11 / 9 * lower) + 1


def test_first_fit_only_ids_flow(spark, docs):
    out = pack_first_fit(docs, "doc_id", capacity=128, text_col="text", num_shards=4)
    assert set(out.columns) == {"doc_id", "shard", "bin_id", "n_tokens"}


def test_token_col_path_matches_text_col_path(spark, docs):
    with_counts = docs.withColumn("ntok", F.size(F.split(F.trim("text"), r"\s+")))
    a = pack_concat(docs, "doc_id", capacity=64, text_col="text", num_shards=4)
    b = pack_concat(with_counts, "doc_id", capacity=64, token_col="ntok", num_shards=4)
    assert a.exceptAll(b.select(*a.columns)).count() == 0
    assert b.select(*a.columns).exceptAll(a).count() == 0


def test_first_fit_tree_matches_naive_scan():
    """Differential: the segment-tree placement must equal the naive
    leftmost-bin-that-fits loop item for item, across random workloads
    including oversize and zero-token items."""
    import random

    from spark_streaming_sql_s3_connector_spark.operators.packing import (
        _FirstFitTree,
    )

    rng = random.Random(1234)
    for trial in range(30):
        cap = rng.choice([16, 100, 257])
        items = [rng.choice([0, 1, cap // 3, cap // 2, cap - 1, cap, cap + 7])
                 for _ in range(rng.randint(1, 400))]
        # naive reference
        fills = []
        naive = []
        for n in items:
            placed = -1
            if n < cap:
                for b, f in enumerate(fills):
                    if f + n <= cap:
                        placed = b
                        break
            if placed < 0:
                fills.append(0)
                placed = len(fills) - 1
            fills[placed] += n
            naive.append(placed)
        ff = _FirstFitTree(cap)
        fast = [ff.place(n) for n in items]
        assert fast == naive, (trial, cap, items[:20])


def test_first_fit_tree_scales():
    # 50k items with tight capacity: must finish fast (the naive scan
    # would do ~hundreds of millions of comparisons here)
    import time

    from spark_streaming_sql_s3_connector_spark.operators.packing import (
        _FirstFitTree,
    )

    ff = _FirstFitTree(100)
    t0 = time.time()
    for i in range(50_000):
        ff.place((i * 37) % 99 + 1)
    assert time.time() - t0 < 5.0
    assert len(ff.rem) > 100


def test_sequence_manifest_reconstructs_streams(spark, docs):
    """Manifest laws: per sequence, slices tile [0, capacity) contiguously
    (except the shard's last sequence); per doc, slices tile [0, n_tokens)
    in order; slice arithmetic is consistent with pack_concat offsets."""
    from spark_streaming_sql_s3_connector_spark.operators.packing import (
        sequence_manifest,
    )

    cap = 128
    man = sequence_manifest(docs, "doc_id", capacity=cap, text_col="text", num_shards=4)
    rows = man.collect()
    assert all(0 <= r.pos_in_seq < cap for r in rows)
    assert all(0 <= r.doc_from < r.doc_to for r in rows)

    import collections
    by_seq = collections.defaultdict(list)
    by_doc = collections.defaultdict(list)
    for r in rows:
        by_seq[(r.shard, r.seq)].append(r)
        by_doc[r.doc_id].append(r)

    # per-doc tiling: ordered slices cover exactly [0, n_tokens)
    tok = {
        r.doc_id: r.n
        for r in docs.selectExpr(
            "doc_id", "size(split(trim(text), '\\\\s+')) AS n"
        ).collect()
    }
    for doc, slices in by_doc.items():
        slices.sort(key=lambda r: r.doc_from)
        assert slices[0].doc_from == 0
        assert slices[-1].doc_to == tok[doc]
        for a, b in zip(slices, slices[1:]):
            assert a.doc_to == b.doc_from  # contiguous, no gap/overlap

    # per-sequence tiling: slices are contiguous from 0; full sequences
    # (any but the shard's last) sum to exactly `cap` tokens
    last_seq = {}
    for (shard, seq) in by_seq:
        last_seq[shard] = max(last_seq.get(shard, -1), seq)
    for (shard, seq), slices in by_seq.items():
        slices.sort(key=lambda r: r.pos_in_seq)
        assert slices[0].pos_in_seq == 0
        total = 0
        for r in slices:
            assert r.pos_in_seq == total
            total += r.doc_to - r.doc_from
        if seq < last_seq[shard]:
            assert total == cap
        else:
            assert total <= cap


def test_sequence_manifest_skips_empty_docs(spark):
    from spark_streaming_sql_s3_connector_spark.operators.packing import (
        sequence_manifest,
    )

    docs = spark.createDataFrame(
        [(0, "a b"), (8, ""), (16, "c")], "doc_id bigint, text string"
    )
    man = sequence_manifest(docs, "doc_id", capacity=4, text_col="text", num_shards=8)
    assert sorted(r.doc_id for r in man.collect()) == [0, 16]


def test_materialize_sequences_exact_capacity_and_reconstruction(spark, docs):
    """Every non-final sequence holds exactly `capacity` tokens; the
    concatenation of a shard's sequences equals the concatenation of its
    docs' tokens in doc_id order (lossless stream reconstruction)."""
    from spark_streaming_sql_s3_connector_spark.operators.packing import (
        materialize_sequences,
    )

    cap = 128
    out = materialize_sequences(docs, "doc_id", "text", capacity=cap, num_shards=4)
    rows = sorted(out.collect(), key=lambda r: (r.shard, r.seq))
    import collections
    last = collections.defaultdict(int)
    for r in rows:
        last[r.shard] = max(last[r.shard], r.seq)
    for r in rows:
        assert r.seq_tokens == len(r.seq_text.split())
        if r.seq < last[r.shard]:
            assert r.seq_tokens == cap, (r.shard, r.seq, r.seq_tokens)
        else:
            assert 0 < r.seq_tokens <= cap
    # stream reconstruction per shard
    docs_rows = sorted(
        ((r.doc_id, r.text) for r in docs.collect()), key=lambda t: t[0]
    )
    streams = collections.defaultdict(list)
    for did, text in docs_rows:
        streams[did % 4].extend(text.split())
    got = collections.defaultdict(list)
    for r in rows:
        got[r.shard].extend(r.seq_text.split())
    for shard in streams:
        assert got[shard] == streams[shard], f"shard {shard} stream mismatch"
