"""Resumable partitioned export: skip-finished-partitions semantics."""

import os
import shutil

import pyarrow.parquet as pq

from cdcsdk_server_ray.pipelines.export import export_partitioned

SF = "/root/testdata/sf0.001"
OUT = "/tmp/export_test"


def _docs():
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])


def test_export_then_resume_skips_finished(ray_session):
    shutil.rmtree(OUT, ignore_errors=True)
    r1 = export_partitioned(_docs(), OUT, by="lang")
    assert r1["skipped"] == [] and len(r1["written"]) >= 2
    total = sum(pq.read_table(os.path.join(OUT, d, "part-0.parquet"))
                .num_rows for d in os.listdir(OUT) if d.startswith("lang="))
    assert total == pq.read_table(f"{SF}/documents.parquet").num_rows

    # simulate a crashed partition: kill one partition's data AND marker
    victim = r1["written"][0]
    shutil.rmtree(os.path.join(OUT, f"lang={victim}"))
    os.unlink(os.path.join(OUT, f"_SUCCESS.{victim}"))
    r2 = export_partitioned(_docs(), OUT, by="lang")
    assert r2["written"] == [victim]            # only the victim rewrote
    assert set(r2["skipped"]) == set(r1["written"]) - {victim}
    total2 = sum(pq.read_table(os.path.join(OUT, d, "part-0.parquet"))
                 .num_rows for d in os.listdir(OUT) if d.startswith("lang="))
    assert total2 == total


def test_export_full_resume_writes_nothing(ray_session):
    r3 = export_partitioned(_docs(), OUT, by="lang")
    assert r3["written"] == []
