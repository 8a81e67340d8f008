#!/usr/bin/env python3
"""Replicates the driver's DuckDB oracle compare for a graft.Verify dump:
  python3 tools/oracle_check.py <sfdir> <verifyout>
For every query in oracle_sql.json: run the SQL in DuckDB over the sf
parquet tables, load the Spark result parquet, sort columns by name on
both sides, compare row-by-row. Exit 1 on any mismatch."""
import duckdb, json, sys, glob, os, math

sfdir, vdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in sorted(glob.glob(f"{sfdir}/*.parquet")):
    name = os.path.basename(t)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{vdir}/oracle_sql.json"))
bad = 0
for name in sorted(oracle):
    try:
        cur = con.execute(oracle[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        bad += 1
        continue
    files = sorted(glob.glob(f"{vdir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark result")
        bad += 1
        continue
    cur2 = con.execute(f"SELECT * FROM read_parquet({files!r})")
    scols = [d[0] for d in cur2.description]
    srows = cur2.fetchall()
    order_o = [ocols.index(c) for c in sorted(ocols)]
    order_s = [scols.index(c) for c in sorted(scols)]
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: schema {sorted(scols)} vs oracle {sorted(ocols)}")
        bad += 1
        continue
    if len(orows) != len(srows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        bad += 1
        continue
    mism = None
    for i, (orow, srow) in enumerate(zip(orows, srows)):
        ov = [orow[j] for j in order_o]
        sv = [srow[j] for j in order_s]
        for a, b in zip(ov, sv):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if (math.isnan(a) and math.isnan(b)):
                    continue
                if a == b:
                    continue
                mism = (i, ov, sv, "float")
                break
            mism = (i, ov, sv, "value")
            break
        if mism:
            break
    if mism:
        print(f"FAIL {name}: row {mism[0]} ({mism[3]}) spark={mism[2]} oracle={mism[1]}")
        bad += 1
    else:
        print(f"ok   {name}: {len(srows)} rows")
print(f"{'RED ' + str(bad) if bad else 'ALL GREEN'} / {len(oracle)} oracle queries")
sys.exit(1 if bad else 0)
