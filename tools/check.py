#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL (oracle_sql.json) in
DuckDB over the SFDIR tables, sort columns by name, sort rows, compare.

Usage: python3 tools/check.py <sfdir> <outdir>
"""
import sys, os, json, glob
import duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    fail = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); fail += 1; continue
        got_rel = con.sql(f"SELECT * FROM '{files[0]}'")
        got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}"); fail += 1
        elif got != exp:
            fail += 1
            diffs = [(a, b) for a, b in zip(got, exp) if a != b]
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows, "
                  f"{len(diffs)} mismatched; first: "
                  f"{diffs[0] if diffs else (got[:2], exp[:2])}")
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{'ALL GREEN' if fail == 0 else f'{fail} FAILURES'} "
          f"({len(names)} queries)")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
