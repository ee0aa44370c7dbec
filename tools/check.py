#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads the parquet files written by `graft.Verify` plus its oracle_sql.json,
runs each oracle statement in DuckDB against the same testdata parquet, sorts
columns by name (as the driver does), and compares cell-by-cell.

Every oracle runs under a per-query runtime budget (BUDGET_S, default 30 s,
override with CHECK_BUDGET_S): a watchdog thread calls con.interrupt() when
the budget expires, so a DuckDB-pathological oracle (e.g. a chained CTE
referenced twice per level without AS MATERIALIZED, which inlining re-expands
exponentially) FAILS in seconds instead of hanging the whole gate — this is
exactly how round 7's correctness artifact got zeroed.
"""
import glob
import json
import os
import sys
import threading
import time

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BUDGET_S = float(os.environ.get("CHECK_BUDGET_S", "30"))


def run_with_budget(con, sql):
    """Run one oracle; interrupt + raise TimeoutError past BUDGET_S."""
    timed_out = threading.Event()

    def watchdog():
        if not done.wait(BUDGET_S):
            timed_out.set()
            con.interrupt()

    done = threading.Event()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    t0 = time.monotonic()
    try:
        df = con.execute(sql).fetchdf()
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle exceeded {BUDGET_S:.0f}s budget")
    finally:
        done.set()
    elapsed = time.monotonic() - t0
    if timed_out.is_set():
        raise TimeoutError(f"oracle exceeded {BUDGET_S:.0f}s budget")
    return df, elapsed


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no verify parquet written")
                failures += 1
                continue
            got = pq.read_table(files[0]).to_pandas()
            exp, oracle_s = run_with_budget(con, sql)
            if oracle_s > BUDGET_S / 3:
                print(f"warn {name}: oracle took {oracle_s:.1f}s "
                      f"(budget {BUDGET_S:.0f}s) — check CTE materialization")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        # Normalize dtypes before the string compare: the two engines can
        # materialize the same column differently (nullable BIGINT becomes
        # float64 '1.0' in one frame and int64 '1' in the other; NaN-vs-<NA>
        # spellings differ). convert_dtypes() maps both to pandas nullable
        # dtypes so equal values stringify identically. BUT a float-vs-int
        # kind mismatch with NO nulls on either side is a genuine engine
        # type divergence (e.g. a lost cast emitting DOUBLE vs BIGINT) that
        # normalization would mask — fail it before converting.
        kind_bad = None
        for c in got.columns:
            ka, kb = got[c].dtype.kind, exp[c].dtype.kind
            if {ka, kb} == {"f", "i"}:
                if not got[c].isna().any() and not exp[c].isna().any():
                    kind_bad = (c, got[c].dtype, exp[c].dtype)
                    break
                # With nulls present the float side may just be pandas'
                # nullable-int materialization — but it could ALSO be a lost
                # cast whose integral-valued DOUBLEs normalize away below.
                # Surface it so a genuine divergence is never silent.
                print(f"warn {name}: col={c} dtype kind {ka} vs {kb} with "
                      f"nulls present — normalized by convert_dtypes(); "
                      f"verify the engine types if this column is new")
        if kind_bad:
            print(f"FAIL {name}: col={kind_bad[0]} dtype {kind_bad[1]} vs "
                  f"{kind_bad[2]} (no nulls: real type divergence, not a "
                  f"nullable-int artifact)")
            failures += 1
            continue
        got = got.convert_dtypes()
        exp = exp.convert_dtypes()
        bad = None
        for c in got.columns:
            a = got[c].astype(str).values
            b = exp[c].astype(str).values
            neq = a != b
            if neq.any():
                i = int(neq.argmax())
                bad = (c, i, got[c].iloc[i], exp[c].iloc[i])
                break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} "
                  f"spark={bad[2]!r} duckdb={bad[3]!r}")
            failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"== {len(oracle) - failures}/{len(oracle)} matched ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
