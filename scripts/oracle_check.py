#!/usr/bin/env python3
"""Round-6 local oracle check (mirrors the driver's DuckDB compare):
reads the Verify.scala dump (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the sf tables, and compares row count, column
names, and the full ordered value matrix.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, math
import duckdb

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "nation", "region", "part",
          "supplier", "documents", "events", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = [tuple(norm(v) for v in r) for r in con.execute(sql).fetchall()]
        wcols = [d[0] for d in con.description]
        got_rel = con.execute(
            f"SELECT * FROM '{out}/{name}/*.parquet'")
        got = [tuple(norm(v) for v in r) for r in got_rel.fetchall()]
        gcols = [d[0] for d in con.description]
        ok = (wcols == gcols) and (want == got)
        if not ok:
            fails.append(name)
            print(f"FAIL {name}: cols {wcols==gcols} rows {len(want)} vs {len(got)}")
            for i, (w, g) in enumerate(zip(want, got)):
                if w != g:
                    print(f"  first diff at row {i}: oracle={w} spark={g}")
                    break
        else:
            print(f"ok   {name} ({len(want)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {e}")
print("RESULT:", "FAIL " + ",".join(fails) if fails else "ALL GREEN",
      f"({len(oracle)} oracled queries)")
sys.exit(1 if fails else 0)
