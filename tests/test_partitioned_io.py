"""Resumable partitioned-Parquet writer (ops/io.py): atomicity, skip-on-
resume, and content integrity."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _rows(n=40):
    return [{"doc_id": i, "lang": ["en", "fr", "de", "es"][i % 4], "x": i * i}
            for i in range(n)]


def test_write_partitioned_layout_and_content(ray_session, tmp_path):
    from spider_ray.ops.io import write_partitioned

    out = str(tmp_path / "out")
    manifest = write_partitioned(_ds(_rows()), out, by="lang").take_all()
    assert sorted(m["partition"] for m in manifest) == ["de", "en", "es", "fr"]
    assert all(not m["skipped"] for m in manifest)
    files = sorted(glob.glob(os.path.join(out, "lang=*", "part.parquet")))
    assert len(files) == 4
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 40
    en = pq.read_table(os.path.join(out, "lang=en", "part.parquet"))
    assert sorted(en.column("doc_id").to_pylist()) == list(range(0, 40, 4))


def test_write_partitioned_resume_skips_finished(ray_session, tmp_path):
    from spider_ray.ops.io import write_partitioned

    out = str(tmp_path / "out")
    write_partitioned(_ds(_rows()), out, by="lang").take_all()
    # simulate a failed run: delete one partition, corrupt-in-progress another
    os.remove(os.path.join(out, "lang=fr", "part.parquet"))
    stray = os.path.join(out, "lang=de", "part.parquet.tmp.999")
    open(stray, "w").close()

    manifest = {m["partition"]: m for m in
                write_partitioned(_ds(_rows()), out, by="lang").take_all()}
    assert manifest["fr"]["skipped"] is False      # rewritten
    assert manifest["en"]["skipped"] is True        # untouched
    assert manifest["de"]["skipped"] is True        # tmp file does not count
    fr = pq.read_table(os.path.join(out, "lang=fr", "part.parquet"))
    assert fr.num_rows == 10
