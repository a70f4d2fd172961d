#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the same parquet tables and compare with Verify's parquet output.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell (floats repr'd, NaN→None)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    sdf = df.apply(lambda c: c.map(cell))
    sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    return sdf

def fresh_con(sf_dir):
    """One connection PER ORACLE: DuckDB refuses SET temp_directory once
    the current temp dir has been used (spilled) on a connection — the
    heavy oracles' memory-robustness prologue must always run before any
    spill, which only a fresh connection guarantees (probe-verified:
    even a same-value re-SET after a spill raises)."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"ROWS {name}: rows={len(got)} (no oracle)"); n_noracle += 1
            continue
        # the wandering-OOM host class (CLAUDE.md round-10/11): DuckDB's
        # allocator can transiently fail tiny mallocs under external host
        # pressure with 100+ GB "free" — the failure set wanders between
        # identical runs and vanishes on retry. Retry OOM (and only OOM)
        # twice with a pause; anything else fails immediately.
        exp = err = None
        for attempt in range(3):
            try:
                con = fresh_con(sf_dir)
                try:
                    exp = con.sql(oracle[name]).df()
                finally:
                    con.close()  # a failing oracle must not leak its buffer pool
                err = None
                break
            except Exception as e:
                err = e
                if "Out of Memory" not in str(e):
                    break
                if attempt < 2:
                    print(f"  [retry] {name}: transient DuckDB OOM "
                          f"(attempt {attempt + 1}), sleeping 10s")
                    import time; time.sleep(10)
        if err is not None:
            print(f"FAIL {name}: oracle error: {err}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            i = diff[diff].index[0]
            print(f"FAIL {name}: first diff row {i}:\n  got {g.loc[i].to_dict()}\n  exp {e.loc[i].to_dict()}")
            n_fail += 1; continue
        print(f"PASS {name}: {len(g)} rows")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
