"""Sink family: null counting, JSONL rolling, topic-log key ordering.

Reference behaviors: NullStreamChangeConsumer counting (K11), S3 sink
JSONL + Roller thresholds (K3/K3a, RollerTest.java:19-67,
RollingOutputStreamTest.java:76-133 file-count-by-threshold cases), and
the keyed-stream per-key ordering contract (K1/K5/K6).
"""

import gzip
import json
import os

import numpy as np
import pyarrow as pa

from cdcsdk_server_ray.config import SynthConfig
from cdcsdk_server_ray.sinks.jsonl import JsonlDirSink, Roller
from cdcsdk_server_ray.sinks.null import NullSink
from cdcsdk_server_ray.sinks.topic_log import TopicLogSink
from cdcsdk_server_ray.sources.changelog import synth_flat_batch

CFG = SynthConfig(num_keys=100, max_versions=5)
BATCH = synth_flat_batch(CFG, np.arange(1, 301))


def test_roller_thresholds():
    r = Roller(max_bytes=100, max_records=10)
    r.update(5, 50)
    assert not r.should_roll()
    r.update(5, 10)
    assert r.should_roll()      # records threshold
    r.reset()
    r.update(1, 200)
    assert r.should_roll()      # bytes threshold
    r.reset()
    assert not r.should_roll()


def test_null_sink_counts():
    sink = NullSink()
    out1 = sink(BATCH)
    out2 = sink(BATCH)
    assert out1["records_written"][0].as_py() == BATCH.num_rows
    assert sink.records_written == 2 * BATCH.num_rows
    assert sink.bytes_written > 0
    assert out2.schema.names == ["destination", "records_written", "bytes_written"]


def test_jsonl_sink_rolls_by_records(tmp_path):
    """≙ RollingOutputStreamTest: N records with threshold T ⇒ ceil(N/T)
    objects after drain."""
    out = str(tmp_path / "jsonl")
    sink = JsonlDirSink(out, max_records=100)
    sink(BATCH)                       # 300 rows → 3 rolls at threshold 100
    sink.finish()
    d = os.path.join(out, "events")
    files = sorted(os.listdir(d))
    assert len(files) == 3
    lines = []
    for f in files:
        with open(os.path.join(d, f)) as fh:
            lines.extend(fh.read().splitlines())
    assert len(lines) == BATCH.num_rows
    rec = json.loads(lines[0])
    assert rec["lsn"] == 1 and "content" in rec


def test_jsonl_sink_gzip_and_tombstone_drop(tmp_path):
    out = str(tmp_path / "gz")
    sink = JsonlDirSink(out, max_records=10_000, compress=True,
                        drop_tombstones=True)
    sink(BATCH)
    sink.finish()
    d = os.path.join(out, "events")
    files = os.listdir(d)
    assert files and files[0].endswith(".jsonl.gz")
    with gzip.open(os.path.join(d, files[0]), "rt") as fh:
        lines = fh.read().splitlines()
    n_tomb = BATCH.filter(pa.compute.equal(BATCH["op"], "d")).num_rows
    assert len(lines) == BATCH.num_rows - n_tomb
    assert all(json.loads(ln)["op"] != "d" for ln in lines)


def test_topic_log_preserves_per_key_order(tmp_path):
    out = str(tmp_path / "log")
    sink = TopicLogSink(out, shards=4)
    # deliver in two batches, in lsn order (as the engine's per-partition
    # stream would)
    sink(BATCH.slice(0, 150))
    sink(BATCH.slice(150))
    seen: dict[tuple, list[int]] = {}
    d = os.path.join(out, "events")
    for f in sorted(os.listdir(d)):
        with open(os.path.join(d, f)) as fh:
            for ln in fh.read().splitlines():
                r = json.loads(ln)
                seen.setdefault((r["repo"], r["path"]), []).append(r["lsn"])
    total = sum(len(v) for v in seen.values())
    assert total == BATCH.num_rows
    for key, lsns in seen.items():
        assert lsns == sorted(lsns), f"out-of-order for {key}"


def test_json_lines_escaping():
    t = pa.table({"a": ['he said "hi"', "back\\slash", None],
                  "b": [1.5, None, 3.0]})
    lines = JsonlDirSink.to_json_lines(t).to_pylist()
    parsed = [json.loads(ln) for ln in lines]
    assert parsed[0] == {"a": 'he said "hi"', "b": 1.5}
    assert parsed[1]["a"] == "back\\slash" and parsed[1]["b"] is None
    assert parsed[2]["a"] is None


def test_sink_actor_pool_end_to_end(ray_session, tmp_path):
    """Sinks as Ray actor pools fed by a Dataset — the delivery shape of
    every reference sink (engine → handleBatch → broker/object store)."""
    import ray.data

    from cdcsdk_server_ray.sources.changelog import changelog_dataset
    ds = changelog_dataset(CFG, 1, CFG.max_lsn, mode="flat", batch_size=128)
    out = str(tmp_path / "pool_out")
    receipts = ds.map_batches(
        lambda b: b, batch_format="pyarrow").map_batches(
        JsonlDirSink, fn_constructor_args=(out,),
        fn_constructor_kwargs={"max_records": 50},
        batch_format="pyarrow", batch_size=128, concurrency=2).to_pandas()
    total_events = synth_flat_batch(CFG, np.arange(1, CFG.max_lsn)).num_rows
    assert receipts["records_written"].sum() == total_events
    # rolled files exist (drain happens at actor teardown; threshold files
    # are already on disk)
    d = os.path.join(out, "events")
    assert os.path.isdir(d) and len(os.listdir(d)) >= total_events // 50 - 2


def test_serializers_cloudevents_and_protobuf():
    """T7 converter family: CloudEvents structured JSON + protobuf Struct
    wire format roundtrip (≙ ConvertingEngineBuilder formats)."""
    from google.protobuf import struct_pb2

    from cdcsdk_server_ray.stages.serializers import (to_cloudevents,
                                                      to_json, to_protobuf)
    small = BATCH.slice(0, 20).select(["lsn", "op", "repo", "path"])
    js = to_json(small)
    assert json.loads(js["payload"][0].as_py())["lsn"] == 1
    ce = to_cloudevents(small)
    ev = json.loads(ce["payload"][3].as_py())
    assert ev["specversion"] == "1.0"
    assert ev["id"] == str(small["lsn"][3].as_py())
    assert ev["data"]["repo"] == small["repo"][3].as_py()
    pb = to_protobuf(small)
    s = struct_pb2.Struct()
    s.ParseFromString(pb["payload"][0].as_py())
    assert s["repo"] == small["repo"][0].as_py()
