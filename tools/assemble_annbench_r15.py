#!/usr/bin/env python3
"""Fold diagnostics/annbench_r15.jsonl (AnnBenchR15's per-mode append
log) into ANNBENCH_r15.json in the committed ANNBENCH schema, so the
addendum's <!--check:--> / <!--tiers:--> assertions validate the
round's rows exactly like prior artifacts.

Round-15 schema notes (VERDICT r14 items 1 and 6): every entry carries
BOTH environment yardsticks — `spin_s` (single-thread loop) and
`eff_cores` (parallel-spin effective cores, the measure the r14 driver
run proved necessary; check_addendum.py's envgate rule enforces a
floor on it) — and an explicit `kind` field (build/probe/oracle), so
no field is ever overloaded the way r14's kernel-isolation rows
overloaded `probe_s`.

Later duplicates of the same (dist, n, kind, algo) key win — a re-run
of a mode supersedes its earlier rows (the JSONL keeps the history).
"""
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "diagnostics", "annbench_r15.jsonl")
DST = os.path.join(ROOT, "ANNBENCH_r15.json")

entries = {}
with open(SRC) as f:
    for line in f:
        line = line.strip()
        if not line:
            continue
        e = json.loads(line)
        entries[(e["dist"], e["n"], e.get("kind", ""), e["algo"])] = e

out = {
    "artifact": "annbench",
    "master": "local[32]",
    "note": ("round-15 rows: the 100M clustered conf-auto tier "
             "(build + park + parked probe + exact-oracle recall) and "
             "the aniso OPQ auto-select decision rows; every entry "
             "carries spin_s AND eff_cores (parallel-spin effective "
             "cores — the r14 blind-spot fix, envgated by "
             "check_addendum.py) and an explicit kind field"),
    "entries": sorted(entries.values(),
                      key=lambda e: (e["dist"], e["n"], e.get("kind", ""),
                                     e["algo"])),
}
with open(DST, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"wrote {DST} with {len(entries)} entries")
