"""Sharded seen-files snapshot (state/metadata_log.py): compaction must
rewrite ONLY dirty shards (the JSON-log analog of RocksDB incremental
checkpointing, RocksDBFileManager.scala:157-312), recovery parity must
hold across reopen, and legacy monolithic snapshots must migrate.

Plus the driver-state stress canary: 10^5 files through
add/purge/compact/recover in bounded wall time."""

import json
import os
import time

from spark_streaming_sql_s3_connector_spark.models import FileEntry
from spark_streaming_sql_s3_connector_spark.state.metadata_log import (
    COMPACT_EVERY_N_ADDS,
    N_SEEN_SHARDS,
    JsonMetadataLog,
)


def entries(batch_id, *paths_ts):
    return [FileEntry(p, ts, batch_id) for p, ts in paths_ts]


def _shard_states(log_dir):
    d = os.path.join(log_dir, "seen-shards")
    out = {}
    for name in os.listdir(d):
        if name.endswith(".json"):
            p = os.path.join(d, name)
            st = os.stat(p)
            out[name] = (st.st_mtime_ns, st.st_ino)
    return out


def _fill_to_compact(log, start_bid, path_fn, ts=1000):
    """Run exactly COMPACT_EVERY_N_ADDS adds so a snapshot fires."""
    for i in range(COMPACT_EVERY_N_ADDS):
        bid = start_bid + i
        log.add(bid, entries(bid, (path_fn(i), ts)), timestamp=ts)
    return start_bid + COMPACT_EVERY_N_ADDS


def test_compaction_rewrites_only_dirty_shards(tmp_path):
    d = str(tmp_path / "log")
    log = JsonMetadataLog(d)
    nxt = _fill_to_compact(log, 0, lambda i: f"round1/file-{i}")
    before = _shard_states(d)
    assert before  # first compaction wrote some shards
    # second window touches DIFFERENT paths; shards holding only round-1
    # paths must not be rewritten
    _fill_to_compact(log, nxt, lambda i: f"round2/other-{i}")
    after = _shard_states(d)
    zl = __import__("zlib")
    round2_shards = {
        f"seen-{zl.crc32(f'round2/other-{i}'.encode()) % N_SEEN_SHARDS:02d}.json"
        for i in range(COMPACT_EVERY_N_ADDS)
    }
    untouched = [n for n in before if n not in round2_shards]
    assert untouched, "test needs at least one round-1-only shard"
    for n in untouched:
        assert after[n] == before[n], f"clean shard {n} was rewritten"
    for n in round2_shards:
        assert after[n] != before.get(n), f"dirty shard {n} was not rewritten"


def test_shard_contents_partition_seen(tmp_path):
    d = str(tmp_path / "log")
    log = JsonMetadataLog(d)
    _fill_to_compact(log, 0, lambda i: f"p/{i}")
    log.close()
    union = {}
    zl = __import__("zlib")
    for name in os.listdir(os.path.join(d, "seen-shards")):
        if not name.endswith(".json"):
            continue
        shard_no = int(name[len("seen-"):-len(".json")])
        with open(os.path.join(d, "seen-shards", name)) as f:
            seen = json.load(f)["seen"]
        for path, ts in seen.items():
            assert zl.crc32(path.encode()) % N_SEEN_SHARDS == shard_no
            assert path not in union
            union[path] = ts
    assert union == {f"p/{i}": 1000 for i in range(COMPACT_EVERY_N_ADDS)}


def test_recovery_parity_with_shards(tmp_path):
    d = str(tmp_path / "log")
    log = JsonMetadataLog(d)
    nxt = _fill_to_compact(log, 0, lambda i: f"a/{i}", ts=500)
    # a few more adds past the compaction point (live only in batch files)
    log.add(nxt, entries(nxt, ("tail/x", 900)), timestamp=900)
    log.close()
    log2 = JsonMetadataLog(d)
    assert log2.get_file("a/0") == 500
    assert log2.get_file("tail/x") == 900
    assert log2.get_latest_batch_id() == nxt
    assert not log2.is_new_file("a/3", 100)
    assert log2.is_new_file("a/3", 501)  # expired → re-admittable


def test_legacy_monolithic_snapshot_migrates(tmp_path):
    d = str(tmp_path / "log")
    os.makedirs(os.path.join(d, "batches"))
    legacy = {"v": 1, "seen": {"legacy/a": 111, "legacy/b": 222}}
    with open(os.path.join(d, "seen-snapshot.json"), "w") as f:
        json.dump(legacy, f)
    log = JsonMetadataLog(d)
    assert log.get_file("legacy/a") == 111  # loaded
    # first compaction persists legacy entries into shards and removes the
    # monolithic file
    _fill_to_compact(log, 0, lambda i: f"new/{i}")
    assert not os.path.exists(os.path.join(d, "seen-snapshot.json"))
    log.close()
    log2 = JsonMetadataLog(d)
    assert log2.get_file("legacy/a") == 111
    assert log2.get_file("legacy/b") == 222


def test_purged_paths_leave_shards_on_next_compaction(tmp_path):
    purge_ts = [0]
    d = str(tmp_path / "log")
    log = JsonMetadataLog(d, purge_timestamp_provider=lambda: purge_ts[0])
    nxt = _fill_to_compact(log, 0, lambda i: f"old/{i}", ts=100)
    assert log.get_file("old/0") == 100
    purge_ts[0] = 5_000  # everything from round 1 is now expired
    _fill_to_compact(log, nxt, lambda i: f"fresh/{i}", ts=10_000)
    assert log.get_file("old/0") is None
    log.close()
    log2 = JsonMetadataLog(d)
    assert log2.get_file("old/0") is None, "purged path resurrected from shards"
    assert log2.get_file("fresh/0") == 10_000


def test_stress_canary_100k_files(tmp_path):
    """Driver-state canary: 10^5 tracked files through add / compact /
    purge / recover, bounded wall time (pairs with sharded snapshots to
    prove the 100x driver-state story: compaction cost follows churn, not
    corpus size)."""
    purge_ts = [0]
    d = str(tmp_path / "log")
    t0 = time.time()
    log = JsonMetadataLog(d, purge_timestamp_provider=lambda: purge_ts[0])
    files_per_batch = 1000
    n_batches = 100  # => 10^5 file entries, 4 compactions
    for b in range(n_batches):
        ents = entries(
            b, *((f"s3://bucket/part-{b:03d}-{i:04d}.parquet", 1000 + b) for i in range(files_per_batch))
        )
        log.add(b, ents, timestamp=1000 + b)
    assert log.get_file("s3://bucket/part-000-0000.parquet") == 1000
    # purge the first half, admit one more batch to trigger bounded GC
    purge_ts[0] = 1000 + n_batches // 2
    log.add(n_batches, entries(n_batches, ("tail", 10_000)), timestamp=10_000)
    log.close()
    log2 = JsonMetadataLog(d)
    assert log2.get_file("tail") == 10_000
    assert log2.get_file(f"s3://bucket/part-{n_batches-1:03d}-0000.parquet") == 1000 + n_batches - 1
    elapsed = time.time() - t0
    assert elapsed < 30, f"10^5-file canary took {elapsed:.1f}s (budget 30s)"


def test_compaction_ages_pre_horizon_seen_entries(tmp_path):
    """r13: rewriting a dirty shard drops entries whose ts is below the
    purge horizon — the snapshot tracks the ACTIVE window, not every
    file ever admitted. Aged entries are exactly the is_new_file==True
    set, so admission verdicts are unchanged, and an aged file that
    re-arrives is admitted and re-tracked."""
    import json as _json

    from spark_streaming_sql_s3_connector_spark.state.metadata_log import (
        JsonMetadataLog,
        N_SEEN_SHARDS,
    )
    from spark_streaming_sql_s3_connector_spark.models import FileEntry

    horizon = {"ts": 0}
    log = JsonMetadataLog(str(tmp_path / "log"), lambda: horizon["ts"])
    old = [
        FileEntry(path=f"s3://b/old-{i}.parquet", timestamp=1_000 + i, batch_id=0)
        for i in range(20)
    ]
    assert log.add(0, old, timestamp=1_000)
    log.close()  # snapshot all dirty shards at horizon 0: nothing aged

    # move the horizon past the old files; new batch churns some shards
    horizon["ts"] = 500_000
    fresh = [
        FileEntry(path=f"s3://b/new-{i}.parquet", timestamp=600_000 + i, batch_id=1)
        for i in range(20)
    ]
    assert log.add(1, fresh, timestamp=600_000)
    log.close()  # rewrites dirty shards -> ages pre-horizon entries there

    shards_dir = tmp_path / "log" / "seen-shards"
    on_disk: dict[str, int] = {}
    for f in shards_dir.iterdir():
        on_disk.update(_json.loads(f.read_text())["seen"])
    # every fresh path tracked; aged old paths gone from every shard a
    # fresh path churned (old entries in never-churned shards may linger
    # -- the bound is cost-follows-churn by design)
    assert all(e.path in on_disk for e in fresh)
    churned = {log._shard_of(e.path) for e in fresh}
    for e in old:
        if log._shard_of(e.path) in churned:
            assert e.path not in on_disk
    # verdicts unchanged: pre-horizon files re-admit, fresh ones do not
    assert log.is_new_file(old[0].path, horizon["ts"])
    assert not log.is_new_file(fresh[0].path, horizon["ts"])

    # a restart reads the aged snapshot and the behavior holds
    log2 = JsonMetadataLog(str(tmp_path / "log"), lambda: horizon["ts"])
    assert log2.is_new_file(old[0].path, horizon["ts"])
    assert not log2.is_new_file(fresh[0].path, horizon["ts"])
