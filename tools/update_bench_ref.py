#!/usr/bin/env python3
"""Refresh BENCH_REF.json from a RefSweep log.

Policy (round 12): a reference is the BEST-KNOWN HONEST time.
 - unchanged queries: min(committed, sweep) — a noisy sweep must not
   inflate a good reference, and a quieter sweep deflates a stale one;
 - queries whose code changed this round (listed in CHANGED): the
   fresh sweep value replaces the committed one even when higher
   (the old number measured different code);
 - new queries: the sweep value.

Usage: update_bench_ref.py <refsweep.log> [round]
"""
import json
import re
import sys

CHANGED = {
    # round 12: 2 EM rounds now run inside the segmenter's shared fit
    "q_unigram_segment",
    # round 12: half the corpus now ships per-record-gzip members
    "q_warc_extract",
}

def main():
    log = sys.argv[1]
    rnd = sys.argv[2] if len(sys.argv) > 2 else "12"
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
    old = {k: v for k, v in ref.items() if not k.startswith("_")}
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
    n_low, n_chg, n_new = 0, 0, 0
    for q, t in sorted(sweep.items()):
        t = round(max(t, 0.01), 3)
        if q in CHANGED or q not in old:
            out[q] = t
            if q in CHANGED:
                n_chg += 1
            else:
                n_new += 1
        else:
            out[q] = min(old[q], t)
            if t < old[q]:
                n_low += 1
    meta = {
        "_meta_recorded_round": int(rnd),
        "_meta_note": (
            "round-12 full re-record: isolated min-of-3 per query "
            "(RefSweep, anchor-gated quiet window: q_lsh_tuning/q_mrmr/"
            "q_url_canonical <= 1.3x committed at start/mid/end); "
            "unchanged queries keep min(committed, sweep), changed "
            "(q_unigram_segment, q_warc_extract) and new queries take "
            "the fresh measurement"
        ),
    }
    merged = {**meta, **out}
    json.dump(merged, open("BENCH_REF.json", "w"), indent=1, sort_keys=True)
    print(f"wrote {len(out)} refs: {n_low} lowered, {n_chg} changed-code, "
          f"{n_new} new; quiet={quiet}")
    for q in ["q_simhash_eval", "q_tokenizer_fertility", "q_user_cf",
              "q_tpch_q21", "q_price_index", "q_mmr_rerank"]:
        print(f"  {q}: {old.get(q)} -> {out.get(q)}")

if __name__ == "__main__":
    main()
