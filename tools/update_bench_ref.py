#!/usr/bin/env python3
"""Refresh BENCH_REF.json from a RefSweep log.

Policy (round 14): a reference is the BEST-KNOWN HONEST time for the
CURRENT code, not an all-time trophy.
 - queries whose code changed this round (CHANGED): the fresh sweep
   value replaces the committed one even when higher (the old number
   measured different code);
 - STALE-LOW refs (the round-13 verdict's aging rule): an unchanged
   query whose ref has been exceeded by >1.5x in three consecutive
   recorded rounds — or by every recording of the last three rounds it
   appeared in — is provably weather-anchored; the fresh isolated
   min-of-3 REPLACES it. Computed automatically from BENCH_r*.json;
 - other unchanged queries: min(committed, sweep) — a noisy sweep must
   not inflate a good reference, a quieter sweep deflates a mild one;
 - new queries: the sweep value.

Usage: update_bench_ref.py <refsweep.log> [round]
"""
import glob
import json
import re
import sys

CHANGED = {
    # round 15: the snapshot family re-measured again — the LogStore
    # commit plane, hidden partitioning (write clustering + tuple
    # derivation on every writeBatch), defaults-enriched read schemas,
    # and INT64-micros timestamp writes all sit on these paths
    "q_snapshot_timetravel", "q_snapshot_changes", "q_snapshot_merge",
    "q_snapshot_delete", "q_snapshot_update", "q_snapshot_diff",
    "q_snapshot_dv", "q_snapshot_mor", "q_snapshot_colmap",
    "q_snapshot_stats", "q_snapshot_optimize", "q_snapshot_widen",
    "q_bucketed_join", "q_bucketed_join_mapped", "q_bloom_point_lookup",
    "q_incremental_stats",
}

# round-13 verdict's judge-adjudicated stale-low refs ("re-record ...
# at minimum") — explicitly reset on top of whatever the automatic
# aging rule finds (some are sparse in the recorded history and the
# rule alone can't see them)
RESET = {
    "q_itemset_triples", "q_ivf_tuning", "q_lsh_recall",
    "q_tfidf_cosine", "q_tpch_q5",
}


def recorded_rounds():
    """queries-map per round, parsed from each BENCH_rNN.json's tail."""
    recs = {}
    for path in sorted(glob.glob("BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            tail = json.load(open(path)).get("tail", "")
            jm = re.search(r'\{"metric":.*', tail)
            if jm:
                recs[rnd] = json.loads(jm.group(0)).get("queries", {})
        except Exception:
            pass
    return recs


def stale_low(old):
    """Aging rule: refs provably below every honest recent run."""
    recs = recorded_rounds()
    rounds = sorted(recs)
    out = set()
    for q, rv in old.items():
        vals = [(r, recs[r].get(q)) for r in rounds]
        # (a) any 3 CONSECUTIVE rounds all recorded >1.5x the ref
        seq = [v for _, v in vals]
        for i in range(len(seq) - 2):
            w = seq[i:i + 3]
            if all(v is not None and v > 1.5 * rv for v in w):
                out.add(q)
                break
        # (b) sparse recordings: every recording of the last THREE
        # rounds it appeared in exceeded 1.5x (two outlier rounds must
        # not age out an honest reference — judge-named sparse cases go
        # through the explicit RESET set instead)
        present = [(r, v) for r, v in vals if v is not None]
        if q not in out and len(present) >= 3:
            last = present[-3:]
            if all(v > 1.5 * rv for _, v in last):
                out.add(q)
    return out


def main():
    log = sys.argv[1]
    rnd = sys.argv[2] if len(sys.argv) > 2 else "14"
    sweep = {}
    quiet = None
    for line in open(log, encoding="utf-8"):
        m = re.match(r"^REF (\S+) ([0-9.]+)", line)
        if m:
            sweep[m.group(1)] = float(m.group(2))
        m = re.match(r"^SWEEP_QUIET (\w+)", line)
        if m:
            quiet = m.group(1) == "true"
    assert sweep, "no REF lines found"
    assert quiet is True, f"sweep not quiet (SWEEP_QUIET={quiet}) - re-run"

    ref = json.load(open("BENCH_REF.json"))
    old = {k: v for k, v in ref.items()
           if not k.startswith("_") and not k.startswith("ic:")}
    old_ic = {k[3:]: v for k, v in ref.items() if k.startswith("ic:")}
    stale = stale_low(old) | RESET
    # start from the committed refs: a SUBSET sweep (RefSweep's
    # query-name filter) must refresh only what it measured, never
    # wipe the rest. A FULL sweep (covering >= 90% of the committed
    # refs) additionally PRUNES refs for queries that left the
    # catalog — they appear in neither the REF nor the REF_FAILED
    # lines of a full run.
    failed = set(re.findall(r"^REF_FAILED (\S+)", open(log).read(), re.M))
    full_sweep = old and len(sweep) + len(failed) >= 0.9 * len(old)
    out = (
        {q: v for q, v in old.items() if q in sweep or q in failed}
        if full_sweep else dict(old))
    n_low, n_chg, n_new, n_aged = 0, 0, 0, 0
    for q, t in sorted(sweep.items()):
        t = round(max(t, 0.01), 3)
        if q in CHANGED or q not in old or q in stale:
            out[q] = t
            if q in stale and q in old and q not in CHANGED:
                n_aged += 1
            elif q in CHANGED:
                n_chg += 1
            else:
                n_new += 1
        else:
            out[q] = min(old[q], t)
            if t < old[q]:
                n_low += 1
    # IN-CATALOG references (round 15, the round-14 verdict's basis
    # ask): `ic:`-prefixed entries record each query's best recent
    # full-catalog minimum — the SAME POPULATION the bench measures —
    # from the committed BENCH_DETAIL.json (post-retry mins). The
    # retry/tier-3 triggers in Bench.scala prefer this basis; the
    # isolated entries stay for quiet-window comparisons and for
    # queries not yet recorded in-catalog. Same policy: changed/new/
    # aged take the fresh value, unchanged keep min(committed, fresh).
    ic_out = {}
    try:
        detail = json.load(open("BENCH_DETAIL.json")).get("queries", {})
    except Exception:
        detail = {}
    ic_stale = stale_low(old_ic) if old_ic else set()
    for q, t in detail.items():
        t = round(max(t, 0.01), 3)
        if q in CHANGED or q not in old_ic or q in ic_stale or q in RESET:
            ic_out[q] = t
        else:
            ic_out[q] = min(old_ic[q], t)
    # carry ic refs for queries missing from this detail (subset runs)
    for q, v in old_ic.items():
        ic_out.setdefault(q, v)

    meta = {
        "_meta_recorded_round": int(rnd),
        "_meta_note": (
            "round-15 record, TWO BASES per query: plain entries are "
            "isolated RefSweep min-of-3 (quiet JVM); ic:-prefixed "
            "entries are in-catalog minima from full-bench "
            "BENCH_DETAIL recordings — the same population the bench "
            "measures, which is the basis the retry/tier-3 triggers "
            "key on (isolated minima carry a systematic -35..-50% "
            "offset in a 400-query shared session and would read as "
            "phantom drift). Aging rule kept on both bases: a ref "
            "exceeded >1.5x by 3 consecutive recorded rounds (or every "
            "recent sparse recording) is REPLACED by the fresh "
            "measurement; changed-code and new queries take fresh."
        ),
    }
    merged = {**meta, **out, **{f"ic:{q}": v for q, v in sorted(ic_out.items())}}
    json.dump(merged, open("BENCH_REF.json", "w"), indent=1, sort_keys=True)
    print(f"wrote {len(out)} isolated + {len(ic_out)} in-catalog refs: "
          f"{n_low} lowered, {n_chg} changed-code, "
          f"{n_new} new, {n_aged} aged (stale-low replaced); quiet={quiet}")
    print("aged set:", sorted(q for q in stale if q in sweep))
    for q in ["q_itemset_triples", "q_ivf_tuning", "q_lsh_recall",
              "q_tfidf_cosine", "q_tpch_q5", "q_user_cf",
              "q_snapshot_colmap"]:
        print(f"  {q}: {old.get(q)} -> {out.get(q)}")


if __name__ == "__main__":
    main()
