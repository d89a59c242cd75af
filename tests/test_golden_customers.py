"""Golden-record parity with the reference's end-to-end IT fixture.

The reference's integration tests assert that the 4 inventory.customers
rows arrive at every sink as exact flattened JSON
(/root/reference/cdcsdk-server/cdcsdk-server-s3/src/test/java/com/yugabyte/cdcsdk/sink/s3/S3ConsumerIT.java:111-150;
expected line documented at README.md:317-328:
``{"id":1004,"first_name":"Anne","last_name":"Kretchmar","email":"annek@noanswer.org"}``).

Same fixture, same expected bytes, through THIS engine's envelope chain
and JSONL sink.
"""

import json
import os

import pyarrow as pa

from cdcsdk_server_ray.sinks.jsonl import JsonlDirSink
from cdcsdk_server_ray.stages.envelope import flatten_chain

CUSTOMERS = [
    (1001, "Sally", "Thomas", "sally.thomas@acme.com"),
    (1002, "George", "Bailey", "gbailey@foobar.com"),
    (1003, "Edward", "Walker", "ed@walker.com"),
    (1004, "Anne", "Kretchmar", "annek@noanswer.org"),
]

GOLDEN = [
    '{"id":1001,"first_name":"Sally","last_name":"Thomas","email":"sally.thomas@acme.com"}',
    '{"id":1002,"first_name":"George","last_name":"Bailey","email":"gbailey@foobar.com"}',
    '{"id":1003,"first_name":"Edward","last_name":"Walker","email":"ed@walker.com"}',
    '{"id":1004,"first_name":"Anne","last_name":"Kretchmar","email":"annek@noanswer.org"}',
]


def _envelope_batch(yb_wrap: bool) -> pa.Table:
    """The 4 snapshot-read events, envelope form (op='r' ≙ snapshot)."""
    ids = pa.array([c[0] for c in CUSTOMERS], pa.int64())
    cols = {
        "first_name": pa.array([c[1] for c in CUSTOMERS]),
        "last_name": pa.array([c[2] for c in CUSTOMERS]),
        "email": pa.array([c[3] for c in CUSTOMERS]),
    }
    children = [ids] + list(cols.values())
    names = ["id"] + list(cols)
    if yb_wrap:
        children = [pa.StructArray.from_arrays([c], ["value"]) for c in children]
    after = pa.StructArray.from_arrays(children, names)
    key = pa.StructArray.from_arrays([ids], ["id"])
    n = len(CUSTOMERS)
    source = pa.StructArray.from_arrays(
        [pa.array(range(1, n + 1), pa.int64()),
         pa.array([1] * n, pa.int64()),
         pa.nulls(n, pa.string()).fill_null("customers"),
         pa.nulls(n, pa.string()).fill_null("postgres")],
        ["lsn", "tx_id", "table", "connector"])
    return pa.table({
        "key": key, "before": pa.nulls(n, after.type), "after": after,
        "source": source,
        "op": pa.array(["r"] * n),
        "ts_ms": pa.array([0] * n, pa.int64()).cast(pa.timestamp("ms")),
    })


def test_flatten_matches_reference_golden_lines(tmp_path):
    """envelope → unwrap+flatten → JSONL sink produces the reference's
    exact expected lines (payload columns only, reference column order)."""
    for yb in (False, True):
        flat = flatten_chain(yb=yb)(_envelope_batch(yb_wrap=yb))
        payload = flat.select(["id", "first_name", "last_name", "email"])
        lines = JsonlDirSink.to_json_lines(payload).to_pylist()
        assert lines == GOLDEN, f"yb={yb}"


def test_golden_lines_through_sink_files(tmp_path):
    out = str(tmp_path / "golden")
    sink = JsonlDirSink(out, max_records=10_000)
    flat = flatten_chain(yb=True)(_envelope_batch(yb_wrap=True))
    sink(flat.select(["id", "first_name", "last_name", "email"]))
    sink.finish()
    d = os.path.join(out, "events")
    files = os.listdir(d)
    assert len(files) == 1
    with open(os.path.join(d, files[0])) as fh:
        lines = fh.read().splitlines()
    assert lines == GOLDEN
    assert json.loads(lines[3])["email"] == "annek@noanswer.org"
