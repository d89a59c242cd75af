"""FileStreamSource: line tailing with byte-offset resume.

Mirrors the reference's FileStreamSourceConnector flow
(EmbeddedEngineTest.java:194-240): consume a file, persist the byte
offset, append while "down", resume — appended lines arrive exactly once.
"""

from __future__ import annotations

import pandas as pd

from cdcsdk_server_ray.sources.filestream import (FileStreamSource,
                                                  load_file_offset,
                                                  save_file_offset)


def _lines(n, start=0):
    return [f"line-{i:05d} payload {i * i}" for i in range(start, start + n)]


def _poll_df(src, off):
    ds, nxt = src.poll(off)
    return ds.to_pandas(), nxt


def test_initial_consume_then_resume(ray_session, tmp_path):
    f = tmp_path / "input.txt"
    first = _lines(10)
    f.write_text("\n".join(first) + "\n")
    src = FileStreamSource(str(f), topic="topicX")

    df, off = _poll_df(src, 0)
    assert list(df["value"]) == first
    assert set(df["topic"]) == {"topicX"}
    assert off == f.stat().st_size
    # position = byte offset after each line; last position == next offset
    assert df["position"].is_monotonic_increasing
    assert int(df["position"].iloc[-1]) == off

    store = str(tmp_path / "offsets.json")
    save_file_offset(store, off)

    # "engine down": more lines appended, plus one unterminated tail
    second = _lines(5, start=10)
    with open(f, "a") as fh:
        fh.write("\n".join(second) + "\n")
        fh.write("partial-without-newline")

    df2, off2 = _poll_df(src, load_file_offset(store))
    assert list(df2["value"]) == second        # no re-delivery, no partial
    save_file_offset(store, off2)

    # writer completes the partial line → next poll delivers exactly it
    with open(f, "a") as fh:
        fh.write(" now-done\n")
    df3, off3 = _poll_df(src, load_file_offset(store))
    assert list(df3["value"]) == ["partial-without-newline now-done"]
    assert off3 == f.stat().st_size


def test_empty_poll_and_no_newline_yet(ray_session, tmp_path):
    f = tmp_path / "input.txt"
    f.write_text("")
    src = FileStreamSource(str(f))
    df, off = _poll_df(src, 0)
    assert len(df) == 0 and off == 0
    f.write_text("no newline yet")
    df, off = _poll_df(src, 0)
    assert len(df) == 0 and off == 0


def test_chunked_read_matches_single_chunk(ray_session, tmp_path):
    f = tmp_path / "big.txt"
    lines = _lines(2000)
    f.write_text("\n".join(lines) + "\n")
    whole, off_a = _poll_df(FileStreamSource(str(f)), 0)
    # chunk boundary protocol: tiny chunks force mid-line splits
    chunked, off_b = _poll_df(FileStreamSource(str(f), chunk_bytes=257), 0)
    assert off_a == off_b == f.stat().st_size
    # block completion order is not guaranteed (preserve_order=False);
    # each record carries its byte position, which IS the total order
    chunked = chunked.sort_values("position").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole.reset_index(drop=True), chunked)
    assert list(chunked["value"]) == lines


def test_truncated_file_refuses_stored_offset(ray_session, tmp_path):
    f = tmp_path / "input.txt"
    f.write_text("a\nb\nc\n")
    src = FileStreamSource(str(f))
    _, off = _poll_df(src, 0)
    f.write_text("a\n")
    try:
        src.poll(off)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError on truncation")


def test_offset_store_roundtrip(tmp_path):
    store = str(tmp_path / "offsets.json")
    assert load_file_offset(store) == 0
    save_file_offset(store, 12345)
    assert load_file_offset(store) == 12345
