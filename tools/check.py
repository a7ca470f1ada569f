#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each
oracle_sql.json query in DuckDB against the sf tables and compares with
the Spark parquet dump (columns sorted by name, rows sorted, values
hashed). Usage: check.py <sfDir> <outDir> [jsonOut]
With jsonOut, also writes {query: {"status": ok|fail|skip, "rows": n,
"detail": str}} — committed per round as CORRECTNESS_local.json so the
repo carries its own correctness record even when the driver's write
fails (round-8 shipped an empty driver file)."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
verdicts = {}
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

ok = fail = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
    name = os.path.basename(qdir)
    try:
        spark_df = canon(con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fail += 1
        verdicts[name] = {"status": "fail", "rows": 0, "detail": f"cannot read spark output: {e}"}
        continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
        verdicts[name] = {"status": "skip", "rows": len(spark_df), "detail": "no oracle"}
        continue
    try:
        duck_df = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1
        verdicts[name] = {"status": "fail", "rows": len(spark_df), "detail": f"oracle sql error: {e}"}
        continue
    problems = []
    if list(spark_df.columns) != list(duck_df.columns):
        problems.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
    elif [str(t) for t in spark_df.dtypes] != [str(t) for t in duck_df.dtypes]:
        problems.append(f"dtypes spark={list(map(str, spark_df.dtypes))} duck={list(map(str, duck_df.dtypes))}")
    elif len(spark_df) != len(duck_df):
        problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
    else:
        neq = (spark_df.fillna("__N__") != duck_df.fillna("__N__"))
        if neq.any().any():
            cols = [c for c in spark_df.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            problems.append(f"values differ cols={cols} first_row={i} "
                            f"spark={spark_df.loc[i].to_dict()} duck={duck_df.loc[i].to_dict()}")
    if problems:
        print(f"FAIL {name}: {'; '.join(problems)}"); fail += 1
        verdicts[name] = {"status": "fail", "rows": len(spark_df), "detail": "; ".join(problems)}
    else:
        print(f"OK   {name} rows={len(spark_df)}"); ok += 1
        verdicts[name] = {"status": "ok", "rows": len(spark_df), "detail": ""}
print(f"\n{ok} ok, {fail} fail")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"summary": {"ok": ok, "fail": fail,
                               "skip": len([v for v in verdicts.values() if v["status"] == "skip"])},
                   "queries": verdicts}, f, indent=1, sort_keys=True)
sys.exit(1 if fail else 0)
