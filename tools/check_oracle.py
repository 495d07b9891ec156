#!/usr/bin/env python3
"""Dev-loop stand-in for the driver's t2 gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: row count, column names/dtypes (sorted by name), and exact
values after sorting columns by name (mirrors the driver hash compare).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            # the driver smoke-checks rows>0, so an empty rows-only result
            # must fail the local gate too
            if len(got) > 0:
                print(f"[rows-only] {name}: {len(got)} rows OK")
            else:
                print(f"[FAIL] {name}: rows-only result is EMPTY")
                n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(got.columns) != sorted(exp.columns):
            ok = False
            msgs.append(f"columns differ: spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        elif len(got) != len(exp):
            ok = False
            msgs.append(f"rowcount differ: spark={len(got)} duck={len(exp)}")
        else:
            g = got[sorted(got.columns)].reset_index(drop=True)
            e = exp[sorted(exp.columns)].reset_index(drop=True)
            for c in g.columns:
                gv, ev = g[c], e[c]
                if str(gv.dtype) != str(ev.dtype):
                    msgs.append(f"  dtype {c}: spark={gv.dtype} duck={ev.dtype}")
                try:
                    same = (gv.fillna('\x00') == ev.fillna('\x00')).all() if gv.dtype == object \
                        else ((gv.isna() == ev.isna()) & ((gv == ev) | gv.isna())).all()
                except Exception as ex:
                    same = False
                    msgs.append(f"  compare error {c}: {ex}")
                if not same:
                    ok = False
                    diff = None
                    try:
                        mask = ~((gv.isna() & ev.isna()) | (gv == ev))
                        diff = pd.DataFrame({"spark": gv[mask], "duck": ev[mask]}).head(5)
                    except Exception:
                        pass
                    msgs.append(f"  VALUES differ in {c}:\n{diff}")
        if ok:
            n_pass += 1
            print(f"[pass] {name}: {len(got)} rows" + ("" if not msgs else "  (" + "; ".join(msgs) + ")"))
        else:
            n_fail += 1
            print(f"[FAIL] {name}:")
            for m in msgs:
                print("   ", m)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
