#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare (columns sorted by name, rows sorted)
against the Verify parquet dump. Usage:
  python3 tools/oracle_parity.py <sfDir> <verifyOut> [only_query ...]
"""
import duckdb, json, sys, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf, vout = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            o = con.sql(sql)
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_bad += 1
            continue
        files = glob.glob(f"{vout}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        s = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = s.columns, s.fetchall()
        oc, orws = canon(orows, ocols)
        sc, srws = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_bad += 1
            continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rows spark={len(srws)} oracle={len(orws)}")
            so, ss = set(orws), set(srws)
            for x in list(ss - so)[:3]:
                print(f"   spark-only: {str(x)[:300]}")
            for x in list(so - ss)[:3]:
                print(f"   oracle-only: {str(x)[:300]}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(srws, orws) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} row diffs of {len(srws)}")
            for a, b in diffs[:3]:
                print(f"   spark : {str(a)[:300]}")
                print(f"   oracle: {str(b)[:300]}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(srws)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

main()
