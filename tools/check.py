#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each
oracle_sql.json query in DuckDB against the sf tables and compares with
the Spark parquet dump (columns sorted by name, rows sorted, values
hashed). Usage: check.py <sfDir> <outDir> [jsonOut]
With jsonOut, also writes {query: {"status": ok|fail|skip, "rows": n,
"detail": str}} — committed per round as CORRECTNESS_local.json so the
repo carries its own correctness record even when the driver's write
fails (round-8 shipped an empty driver file).

Hardened (round-9 verdict item 6, the same lesson Verify learned one
stage upstream): a killed or timed-out compare must leave a
partial-but-real record, never an empty file —
 - every print flushes;
 - the verdict JSON is rewritten after EVERY query (393 tiny dicts;
   the rewrite is microseconds), so kill-at-50% leaves a loadable
   partial JSON with a summary of what completed;
 - each oracle runs under a watchdog (ORACLE_TIMEOUT_S, default 60 s)
   that fires duckdb's connection interrupt — one pathological oracle
   becomes one "fail: timeout" row instead of a dead compare. (The
   exponential-CTE blowup itself is fixed at the source: graft's
   OracleSql.materializeCtes fences every CTE, full catalog ~17 s.)
"""
import sys, os, json, glob, threading
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
TIMEOUT_S = float(os.environ.get("ORACLE_TIMEOUT_S", "60"))
verdicts = {}
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def say(msg):
    print(msg, flush=True)

def flush_json(done, total):
    if not json_out:
        return
    tmp = json_out + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"summary": {"ok": ok, "fail": fail,
                               "skip": len([v for v in verdicts.values() if v["status"] == "skip"]),
                               "done": done, "total": total},
                   "queries": verdicts}, f, indent=1, sort_keys=True)
    os.replace(tmp, json_out)

_wd_lock = threading.Lock()

def run_sql(sql):
    """Run one oracle under an interrupt watchdog; raises on timeout.

    The interrupt is guarded by a per-query done flag under a lock:
    without it the timer could fire in the window between con.sql()
    returning and timer.cancel(), interrupting an idle connection and
    potentially killing the NEXT oracle instead of this one."""
    done = [False]
    def fire():
        with _wd_lock:
            if not done[0]:
                con.interrupt()
    timer = threading.Timer(TIMEOUT_S, fire)
    timer.start()
    try:
        return con.sql(sql).df()
    finally:
        with _wd_lock:
            done[0] = True
        timer.cancel()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

ok = fail = 0
qdirs = sorted(glob.glob(os.path.join(out_dir, "q_*")))
for done, qdir in enumerate(qdirs, 1):
    name = os.path.basename(qdir)
    try:
        spark_df = canon(con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
    except Exception as e:
        say(f"FAIL {name}: cannot read spark output: {e}"); fail += 1
        verdicts[name] = {"status": "fail", "rows": 0, "detail": f"cannot read spark output: {e}"}
        flush_json(done, len(qdirs)); continue
    if name not in oracle:
        say(f"SKIP {name}: no oracle (rows={len(spark_df)})")
        verdicts[name] = {"status": "skip", "rows": len(spark_df), "detail": "no oracle"}
        flush_json(done, len(qdirs)); continue
    try:
        duck_df = canon(run_sql(oracle[name]))
    except duckdb.InterruptException:
        say(f"FAIL {name}: timeout after {TIMEOUT_S}s"); fail += 1
        verdicts[name] = {"status": "fail", "rows": len(spark_df), "detail": f"timeout after {TIMEOUT_S}s"}
        flush_json(done, len(qdirs)); continue
    except Exception as e:
        say(f"FAIL {name}: oracle sql error: {e}"); fail += 1
        verdicts[name] = {"status": "fail", "rows": len(spark_df), "detail": f"oracle sql error: {e}"}
        flush_json(done, len(qdirs)); continue
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
        say(f"FAIL {name}: {'; '.join(problems)}"); fail += 1
        verdicts[name] = {"status": "fail", "rows": len(spark_df), "detail": "; ".join(problems)}
    else:
        say(f"OK   {name} rows={len(spark_df)}"); ok += 1
        verdicts[name] = {"status": "ok", "rows": len(spark_df), "detail": ""}
    flush_json(done, len(qdirs))
say(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
