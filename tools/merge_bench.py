#!/usr/bin/env python3
"""Merge N raw graft.Bench JSON lines into one min-of-N artifact.

Usage: merge_bench.py out.json pass1.json pass2.json [pass3.json ...]

Per-query count/full series take the MIN across passes (the recorded
clean-bench convention — box noise only ever inflates); totals are the
sums of the merged series; sentinel fields keep the per-query MIN with
the verdict 'quiet' only if every pass was quiet. Errors union.
"""
import json
import sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    passes = [json.load(open(p)) for p in paths]
    base = dict(passes[0])
    queries = sorted(passes[0]["queries"].keys())
    for d in passes[1:]:
        assert sorted(d["queries"].keys()) == queries, "query sets differ"
    merged_q = {q: min(d["queries"][q] for d in passes) for q in queries}
    merged_f = {q: min(d["full_s"][q] for d in passes) for q in queries}
    merged_s = {q: min(d["sentinel_ms"][q] for d in passes) for q in queries}
    base["queries"] = merged_q
    base["full_s"] = merged_f
    base["sentinel_ms"] = merged_s
    base["value"] = sum(merged_q.values())
    base["total_full_s"] = sum(merged_f.values())
    # Round-14: the deliberately-exact baseline series (absent in older
    # recordings) min-merges the same way, outside the headline totals.
    if "baselines" in passes[0]:
        bq = sorted(passes[0]["baselines"].keys())
        base["baselines"] = {q: min(d["baselines"][q] for d in passes) for q in bq}
        base["baselines_full_s"] = {
            q: min(d["baselines_full_s"][q] for d in passes) for q in bq}
        base["total_baseline_full_s"] = sum(base["baselines_full_s"].values())
        base["total_headline_full_s"] = (
            base["total_full_s"] - base["total_baseline_full_s"])
    base["sentinel_pre_ms"] = min(d["sentinel_pre_ms"] for d in passes)
    base["sentinel_verdict"] = (
        "quiet" if all(d["sentinel_verdict"] == "quiet" for d in passes)
        else "noisy")
    base["errors"] = sorted({e for d in passes for e in d["errors"]})
    base["merge"] = f"min-of-{len(passes)}"
    base["pass_totals_full_s"] = [round(d["total_full_s"], 1) for d in passes]
    json.dump(base, open(out, "w"))
    print(out, base["value"], base["total_full_s"], base["sentinel_verdict"])


if __name__ == "__main__":
    main()
