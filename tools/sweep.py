"""Full driver-style correctness sweep: run EVERY queries() entry at a given
sf dir and compare rows + schema + values against oracle_sql() via DuckDB,
using the driver's comparison (columns sorted by name, rows sorted, values
hashed order-insensitively).

Usage:  python tools/sweep.py [sf_dir] [query ...]
        (default sf_dir /root/testdata/sf0.01; no query args = all)

Prints one PASS/FAIL line per query and a final JSON summary.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as m

    queries, oracles = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    fails = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
            want = canon(con.execute(oracles[name]).df())
            rows = len(got) == len(want)
            schema = list(got.columns) == list(want.columns)
            if rows and schema:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=False, atol=1e-6, rtol=1e-6
                    )
                    values = True
                except AssertionError:
                    values = False
            else:
                values = False
            ok = rows and schema and values
            results[name] = {
                "rows_match": rows, "schema_match": schema, "hash_match": values,
                "sec": round(time.time() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            ok = False
            results[name] = {"error": f"{type(exc).__name__}: {exc}",
                             "sec": round(time.time() - t0, 2)}
        print(f"{'PASS' if ok else 'FAIL'}  {name}  ({results[name]['sec']}s)", flush=True)
        if not ok:
            fails.append(name)

    n = len(results)
    print(json.dumps({"total": n, "pass": n - len(fails), "fail": fails}))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
