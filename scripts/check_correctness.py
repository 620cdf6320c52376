#!/usr/bin/env python3
"""Local driver-mimic: compare Verify.scala's parquet dumps against the
DuckDB oracle SQL, the way the driver's correctness gate does (sort
columns by name, sort rows, exact value compare).

Usage: python scripts/check_correctness.py <sfdir> <outdir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok, bad, noracle = [], [], []
    qdirs = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    if only:
        sel = set(only.split(","))
        qdirs = [d for d in qdirs if d in sel]
    import time

    def verdict(kind, name, t0, msg=""):
        print(f"[compare] {kind} {name} ({time.time() - t0:.1f}s) {msg}",
              file=sys.stderr, flush=True)

    for name in qdirs:
        t0 = time.time()
        print(f"[compare] {name} ...", file=sys.stderr, flush=True)
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            bad.append((name, "no spark output"))
            verdict("FAIL", name, t0, "no spark output")
            continue
        got = con.sql(f"SELECT * FROM '{os.path.join(outdir, name)}/*.parquet'").df()
        if name not in oracle:
            noracle.append((name, len(got)))
            verdict("ROWS", name, t0)
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}"))
            verdict("FAIL", name, t0, f"oracle SQL error: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            bad.append((name, f"columns differ: spark={list(g.columns)} oracle={list(e.columns)}"))
            verdict("FAIL", name, t0, "columns differ")
            continue
        if len(g) != len(e):
            bad.append((name, f"row count differs: spark={len(g)} oracle={len(e)}"))
            verdict("FAIL", name, t0, f"rows {len(g)} vs {len(e)}")
            continue
        if g.equals(e):
            ok.append(name)
            verdict("OK", name, t0)
        else:
            diff = (g != e) & ~(g.isna() & e.isna())
            cols = [c for c in g.columns if diff[c].any()]
            i = diff.any(axis=1).idxmax()
            bad.append((name, f"values differ in {cols}; first row {i}: "
                              f"spark={g.iloc[i].to_dict()} oracle={e.iloc[i].to_dict()}"))
            verdict("FAIL", name, t0, f"values differ in {cols}")
    print(f"== MATCH   ({len(ok)}): {' '.join(ok)}")
    for n, rows in noracle:
        print(f"== NOORACLE {n}: {rows} rows")
    for n, msg in bad:
        print(f"== FAIL    {n}: {msg}")
    print(f"\n{len(ok)} match, {len(noracle)} rows-only, {len(bad)} fail")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
