"""Local replica of the driver's correctness gate: run every queries() entry
on sf0.01 and compare against oracle_sql() via DuckDB (row count, column
names, order-insensitive value comparison).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        refs = result.to_arrow_refs()
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return pd.DataFrame()
        result = pa.concat_tables(tables, promote_options="default")
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
            dt = time.perf_counter() - t0
            if name in oracles:
                want = canon(con.execute(oracles[name]).fetchdf())
                ok_rows = len(got) == len(want)
                ok_cols = list(got.columns) == list(want.columns)
                ok_vals = False
                if ok_rows and ok_cols:
                    g, w = got.fillna("∅"), want.fillna("∅")
                    try:
                        # dtype-strict, like the driver's value hash: an int64
                        # result vs a DECIMAL/HUGEINT oracle must FAIL here too.
                        pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
                        ok_vals = True
                    except AssertionError as ex:
                        ok_vals = False
                        detail = str(ex).splitlines()[:6]
                status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
                if status != "OK":
                    failures += 1
                    print(f"[{status}] {name} ({dt:.1f}s) rows {len(got)}/{len(want)} cols_ok={ok_cols}")
                    if ok_rows and ok_cols:
                        for line in detail:
                            print("   ", line)
                    else:
                        print("    got cols ", list(got.columns))
                        print("    want cols", list(want.columns))
                else:
                    print(f"[OK] {name} ({dt:.1f}s) rows={len(got)}")
            else:
                print(f"[ROWS-ONLY] {name} ({dt:.1f}s) rows={len(got)} cols={list(got.columns)}")
        except Exception:
            failures += 1
            print(f"[ERROR] {name}")
            traceback.print_exc(limit=8)
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
