"""WARC/1.1 export sink — ``spider/src/utils/warc.rs:1-120``.

The reference funnels pages through an MPSC channel into a single
``BufWriter``; our Ray-native shape is a per-partition formatter: each block
of the pages Dataset becomes one ``.warc`` file (resumable, parallel,
no single-writer bottleneck).  Record layout mirrors the reference's
``response`` records: WARC-Target-URI, WARC-Date (from ``warc_ts`` when
present), Content-Type application/http, payload = raw html bytes.
"""

from __future__ import annotations

import os
import uuid


def format_warc_record(url: str, body: bytes, date: str, status: int = 200) -> bytes:
    http = (
        f"HTTP/1.1 {status} {'OK' if status == 200 else 'NOT FOUND'}\r\n"
        "Content-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    record_id = uuid.uuid5(uuid.NAMESPACE_URL, url)
    header = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return header + http + b"\r\n\r\n"


class WarcWriter:
    """``map_batches`` sink stage: writes one WARC file per batch under
    ``out_dir`` and emits (url, warc_path, offset, length) manifest rows.

    ``url_set_ref`` (optional ``ray.put`` of a lowercase-url frozenset —
    broadcast once, read per actor/task, the download-sink convention)
    restricts the archive to the crawl's visited pages for the CLI
    ``--warc`` surface."""

    def __init__(self, out_dir: str, url_column: str = "url", html_column: str = "html",
                 ts_column: str = "warc_ts", status_column: str = "status",
                 url_set_ref=None):
        self.out_dir = out_dir
        self.url_column = url_column
        self.html_column = html_column
        self.ts_column = ts_column
        self.status_column = status_column
        if url_set_ref is not None:
            import ray

            self.urls = ray.get(url_set_ref)
        else:
            self.urls = None
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch):
        import pyarrow as pa

        if self.urls is not None and batch.num_rows:
            keep = pa.array(
                [u.lower() in self.urls
                 for u in batch.column(self.url_column).to_pylist()],
                pa.bool_(),
            )
            batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "warc_path": pa.array([], pa.string()),
                    "offset": pa.array([], pa.int64()),
                    "length": pa.array([], pa.int64()),
                }
            )
        urls = batch.column(self.url_column).to_pylist()
        htmls = batch.column(self.html_column).to_pylist()
        names = batch.column_names
        statuses = (
            batch.column(self.status_column).to_pylist()
            if self.status_column in names
            else [200] * len(urls)
        )
        if self.ts_column in names:
            dates = [
                (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else "1970-01-01T00:00:00Z")
                for ts in batch.column(self.ts_column).to_pylist()
            ]
        else:
            dates = ["1970-01-01T00:00:00Z"] * len(urls)
        # deterministic per-batch file name from the first url
        part = uuid.uuid5(uuid.NAMESPACE_URL, urls[0] if urls else "empty").hex[:16]
        path = os.path.join(self.out_dir, f"part-{part}.warc")
        offsets, lengths = [], []
        with open(path, "wb") as f:
            for url, html, date, status in zip(urls, htmls, dates, statuses):
                record = format_warc_record(url, html or b"", date, status)
                offsets.append(f.tell())
                lengths.append(len(record))
                f.write(record)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_path": pa.array([path] * len(urls), pa.string()),
                "offset": pa.array(offsets, pa.int64()),
                "length": pa.array(lengths, pa.int64()),
            }
        )


def read_warc_record(path: str, offset: int, length: int) -> tuple[dict, bytes]:
    """Read back one record (header dict, payload bytes) — used by tests."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    head, _, rest = data.partition(b"\r\n\r\n")
    headers = {}
    for line in head.decode().split("\r\n")[1:]:
        k, _, v = line.partition(": ")
        headers[k] = v
    http_head, _, payload = rest.partition(b"\r\n\r\n")
    return headers, payload.rstrip(b"\r\n")


def iter_warc_records(data: bytes):
    """Sequential record parser over raw ``.warc`` bytes — the read-back
    side of the sink (payload length comes from Content-Length, never from
    delimiter guessing, so binary payloads with embedded CRLFs are safe).
    Yields ``{url, date, status, payload}`` per response record."""
    pos, n = 0, len(data)
    while pos < n and data.startswith(b"WARC/1.1\r\n", pos):
        hdr_end = data.index(b"\r\n\r\n", pos)
        fields: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        clen = int(fields["Content-Length"])
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # + record-separator \r\n\r\n
        http_end = block.index(b"\r\n\r\n")
        status = int(block.split(b" ", 2)[1])
        yield {
            "url": fields["WARC-Target-URI"],
            "date": fields["WARC-Date"],
            "status": status,
            "payload": block[http_end + 4 :],
        }


def write_warc_archive(corpus_dir: str, out_dir: str,
                       visited: set[str] | None = None,
                       concurrency: int | None = None):
    """The CLI ``--warc`` surface (reference ``-W/--warc``,
    ``spider_cli/src/options/args.rs:120-122``: store the crawl in a WARC
    archive): write the visited pages' raw bytes as WARC/1.1 files under
    ``out_dir`` and return the ``(url, warc_path, offset, length)``
    manifest table.

    Distributed consumer, the download-sink shape: the corpus IS the
    content store, so archive = pruned Parquet scan filtered to the
    visited set (lowercased, broadcast ONCE via ``ray.put``) with one
    writer task per batch — no single-writer funnel, no driver
    materialization of html bytes.  ``out_dir`` must be shared storage on
    a multi-node cluster (standard file-sink contract)."""
    import ray
    import ray.data

    url_set_ref = (
        ray.put(frozenset(u.lower() for u in visited))
        if visited is not None else None
    )
    ds = ray.data.read_parquet(
        corpus_dir, columns=["url", "html", "warc_ts", "status"]
    )
    out = ds.map_batches(
        WarcWriter,
        fn_constructor_args=(out_dir,),
        fn_constructor_kwargs={"url_set_ref": url_set_ref},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
        num_cpus=0.5,
        batch_size=64,
    )
    import pyarrow as pa

    refs = out.materialize().to_arrow_refs()
    tables = [t for t in map(ray.get, refs) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "warc_path": pa.array([], pa.string()),
                "offset": pa.array([], pa.int64()),
                "length": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables)


def warc_export_roundtrip(corpus_dir: str, out_dir: str,
                          url_prefix: str | None = None):
    """Write the corpus as WARC files then READ THE BYTES BACK and emit one
    digest row per record: ``(url, warc_date, http_status, content_length,
    payload_md5)`` where ``payload_md5 = md5(base64(payload))`` (the
    base64 step makes the digest SQL-expressible — DuckDB's md5 takes
    VARCHAR).  A value match against the corpus-side oracle proves the
    sink's byte layout round-trips exactly.

    Shape: one writer task per block (parallel, no single-writer funnel),
    one reader task per produced file.  ``out_dir`` must be shared storage
    on a multi-node cluster (standard file-sink contract)."""
    import base64
    import glob as _glob
    import hashlib
    import shutil

    import pyarrow as pa
    import ray.data

    shutil.rmtree(out_dir, ignore_errors=True)
    scan_filter = None
    if url_prefix is not None:
        import pyarrow.compute as _pc
        import pyarrow.dataset as pads

        scan_filter = _pc.starts_with(pads.field("url"), pattern=url_prefix)
    ds = ray.data.read_parquet(
        corpus_dir, columns=["url", "html", "warc_ts", "status"],
        filter=scan_filter,
    )
    # drive the writes; manifest rows are O(corpus) slim but we only need
    # the side effect here — read-back is the verified surface
    ds.map_batches(
        WarcWriter(out_dir), batch_format="pyarrow"
    ).materialize()

    files = sorted(_glob.glob(os.path.join(out_dir, "*.warc")))

    def readback(batch: pa.Table) -> pa.Table:
        urls, dates, statuses, lens, digests = [], [], [], [], []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            for rec in iter_warc_records(data):
                urls.append(rec["url"])
                dates.append(rec["date"])
                statuses.append(rec["status"])
                lens.append(len(rec["payload"]))
                digests.append(
                    hashlib.md5(base64.b64encode(rec["payload"])).hexdigest()
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_date": pa.array(dates, pa.string()),
                "http_status": pa.array(statuses, pa.int64()),
                "content_length": pa.array(lens, pa.int64()),
                "payload_md5": pa.array(digests, pa.string()),
            }
        )

    files_ds = ray.data.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})
    )
    return files_ds.map_batches(readback, batch_format="pyarrow")
