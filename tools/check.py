#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each query's
parquet dump (written by graft.Verify), run its DuckDB oracle SQL over the
same sf dir, and compare schema + sorted rows. Builder-side tool only —
not part of the Spark library."""
import json, sys, glob, os
import duckdb

def canon(df):
    # driver compare: columns sorted by name, rows sorted, values hashed
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures, ok, rows_only = [], 0, 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        if name not in oracle:
            rows_only += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns differ: {list(g.columns)} vs {list(w.columns)}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"row count {len(g)} vs {len(w)}"))
            continue
        if not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            i = bad[bad].index[0] if bad.any() else None
            dt = [f"{c}: {g[c].dtype} vs {w[c].dtype}" for c in g.columns if g[c].dtype != w[c].dtype]
            failures.append((name, f"values differ (dtypes: {dt}) first bad row idx {i}:\n  got  {g.loc[i].to_dict() if i is not None else ''}\n  want {w.loc[i].to_dict() if i is not None else ''}"))
            continue
        ok += 1
    # A query that threw inside graft.Verify produces no dump dir at all;
    # without this diff the gate would silently skip it and still report
    # FAIL=0. Every declared oracle key must have a dumped result.
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - dumped):
        failures.append((name, "no result dumped (query failed in Verify?)"))
    print(f"\nOK={ok} rows_only={rows_only} FAIL={len(failures)}")
    for n, msg in failures:
        print(f"FAIL {n}: {msg}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
