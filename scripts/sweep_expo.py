#!/usr/bin/env python3
"""Exponent table for the cross-SF stress sweep: combines the x10/x30
Verify walls ([verify] done lines) and output row counts into the
SWEEP_SF3.md markdown table. time exp = ln(t30/t10)/ln 3; rows exp
likewise (blank when rows are gate rows / shrink by design).

Usage: python3 scripts/sweep_expo.py <x10.log> <x30.log> <out10> <out30>
"""
import sys, os, re, math
import duckdb


def walls(path):
    out = {}
    for line in open(path):
        m = re.search(r"\[verify\] done (\S+) ([0-9.]+)s", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def rows(outdir):
    # a .json arg is a saved {name: count} map (sweep reruns clobber
    # the output dir; counts survive in the sidecar)
    if outdir.endswith(".json"):
        import json
        return {k: int(v) for k, v in json.load(open(outdir)).items()}
    r = {}
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p):
            r[d] = duckdb.sql(
                f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
    return r


def fmt_rows(n):
    if n >= 1e6:
        return f"{n/1e6:.2f} M"
    if n >= 1e3:
        return f"{n/1e3:.1f} k"
    return str(n)


def main(l10, l30, o10, o30):
    w10, w30 = walls(l10), walls(l30)
    r10, r30 = rows(o10), rows(o30)
    print("| entry | t ×10 (s) | t ×30 (s) | time exp | rows ×10 → ×30 | rows exp |")
    print("|---|---|---|---|---|---|")
    for name in sorted(set(w10) & set(w30), key=lambda n: -w30[n]):
        t10, t30 = w10[name], w30[name]
        texp = math.log(t30 / t10) / math.log(3) if t10 > 0 else float("nan")
        a, b = r10.get(name, 0), r30.get(name, 0)
        if a > 0 and b >= a and not name.startswith("qs"):
            rexp = f"{math.log(b / a) / math.log(3):.2f}" if b > a else "1.0"
            rtxt = f"{fmt_rows(a)} → {fmt_rows(b)}"
        else:
            rexp, rtxt = "—", ("gates" if name.startswith("qs")
                               else f"{fmt_rows(a)} → {fmt_rows(b)}")
        texp_s = "flat" if texp <= 0.05 else f"{texp:.2f}"
        print(f"| {name} | {t10:.1f} | {t30:.1f} | {texp_s} | {rtxt} | {rexp} |")


if __name__ == "__main__":
    main(*sys.argv[1:5])
