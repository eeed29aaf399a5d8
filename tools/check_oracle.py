#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf tables, compare
row count, schema (column names sorted), and value hash. Dev tool only —
the engine itself is pure Scala/Spark."""
import sys, os, json, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    eng = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in oracle:
        results[name] = {"rows": len(eng), "check": "rows-only",
                         "ok": len(eng) > 0}
        continue
    try:
        ora = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = {"check": "oracle-error", "ok": False, "err": str(e)[:300]}
        continue
    ecols, ocols = sorted(eng.columns), sorted(ora.columns)
    schema_ok = ecols == ocols
    rows_ok = len(eng) == len(ora)
    val_ok = False
    if schema_ok and rows_ok:
        e2 = eng[ecols].sort_values(ecols).reset_index(drop=True)
        o2 = ora[ocols].sort_values(ocols).reset_index(drop=True)
        try:
            val_ok = all(
                (e2[c].values.tolist() == o2[c].values.tolist())
                for c in ecols)
        except Exception as ex:
            val_ok = False
    results[name] = {"rows": len(eng), "oracle_rows": len(ora),
                     "schema_ok": schema_ok, "rows_ok": rows_ok,
                     "values_ok": val_ok,
                     "ok": schema_ok and rows_ok and val_ok}
    if not results[name]["ok"]:
        results[name]["eng_cols"] = ecols
        results[name]["ora_cols"] = ocols
        if schema_ok and rows_ok:
            e2 = eng[ecols].sort_values(ecols).reset_index(drop=True)
            o2 = ora[ocols].sort_values(ocols).reset_index(drop=True)
            for c in ecols:
                le, lo = e2[c].values.tolist(), o2[c].values.tolist()
                bad = [i for i in range(len(le)) if le[i] != lo[i]][:3]
                if bad:
                    results[name].setdefault("diff", {})[c] = [
                        (i, le[i], lo[i]) for i in bad]

nfail = sum(1 for r in results.values() if not r["ok"])
for k, v in results.items():
    flag = "OK " if v["ok"] else "FAIL"
    print(flag, k, json.dumps({kk: vv for kk, vv in v.items() if kk != "ok"}, default=str)[:500])
print(f"\n{len(results) - nfail}/{len(results)} pass")
sys.exit(1 if nfail else 0)
