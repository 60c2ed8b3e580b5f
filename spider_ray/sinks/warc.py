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
    ``out_dir`` and emits (url, warc_path, offset, length) manifest rows."""

    def __init__(self, out_dir: str, url_column: str = "url", html_column: str = "html",
                 ts_column: str = "warc_ts", status_column: str = "status"):
        self.out_dir = out_dir
        self.url_column = url_column
        self.html_column = html_column
        self.ts_column = ts_column
        self.status_column = status_column
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch):
        import pyarrow as pa

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
