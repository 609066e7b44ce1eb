#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev-tool only (NOT part of the shipped library; the library is pure
Scala/Spark). Runs after `graft.Verify` has dumped query results:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

For each query: run the oracle SQL in DuckDB over the same parquet
tables, load the Spark parquet output, sort columns by name + rows by
all columns, compare exactly. Reports per-query PASS/FAIL with the
first differing cells.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    import time
    # batch/stream twins share oracle SQL verbatim (st17=s18's,
    # st23=s28's, …): memoize by exact SQL string so each distinct
    # oracle runs once per sweep (r18: the duplicated MMR twin alone
    # was ~20 min of redundant DuckDB work).
    memo: dict = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.monotonic()
        try:
            if sql in memo:
                want = memo[sql]
            else:
                want = memo[sql] = con.execute(sql).fetchdf()
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            n_fail += 1
            continue
        # surface slow oracles immediately (flush: the run is long)
        dt = time.monotonic() - t0
        if dt > 30:
            print(f"SLOW {name}: oracle took {dt:.0f}s", flush=True)
        want, got = norm(want), norm(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        # dtype-kind-strict: the driver's hash compare distinguishes 1.0
        # from 1 (bit r3's q59: DuckDB window SUM → HUGEINT → float64 vs
        # Spark int64 passed the lenient == below but hash-failed at the
        # driver) but NOT int32 from int64 (q08/q09/s01 are driver-green
        # with DuckDB ROW_NUMBER int64 vs Spark row_number int32), so
        # compare dtype KINDS (int/float/bool/object), not widths.
        wd = [d.kind for d in want.dtypes]
        gd = [d.kind for d in got.dtypes]
        if wd != gd:
            bad = [(c, w, g) for c, w, g in
                   zip(want.columns, wd, gd) if w != g]
            print(f"FAIL {name}: dtype kinds differ {bad}")
            n_fail += 1
            continue
        # exact compare (dtype-lenient: compare as python objects)
        diff_cols = []
        for c in want.columns:
            wv, gv = want[c], got[c]
            try:
                eq = (wv.isna() & gv.isna()) | (wv == gv)
            except Exception:
                eq = wv.astype(str) == gv.astype(str)
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                diff_cols.append(
                    (c, i, wv.iloc[i], gv.iloc[i],
                     int((~eq).sum())))
        if diff_cols:
            print(f"FAIL {name}:")
            for c, i, w, g, n in diff_cols[:4]:
                print(f"   col={c} row={i} want={w!r} got={g!r} ({n} cells)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows, {dt:.1f}s)", flush=True)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
