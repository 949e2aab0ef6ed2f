#!/usr/bin/env python3
"""Fold diagnostics/annbench_r14.jsonl (AnnBenchR14's per-mode append
log — one JSON entry per measured row, each with its own `spin_s`
environment fingerprint) into ANNBENCH_r14.json in the committed
ANNBENCH schema, so the addendum's <!--check:--> / <!--tiers:-->
assertions validate the round's targeted rows exactly like the grid
artifacts of rounds 9-13.

Later duplicates of the same (dist, n, algo) key win — a re-run of a
mode supersedes its earlier rows (the JSONL keeps the full history).
"""
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "diagnostics", "annbench_r14.jsonl")
DST = os.path.join(ROOT, "ANNBENCH_r14.json")

entries = {}
with open(SRC) as f:
    for line in f:
        line = line.strip()
        if not line:
            continue
        e = json.loads(line)
        entries[(e["dist"], e["n"], e["algo"])] = e

out = {
    "artifact": "annbench",
    "master": "local[32]",
    "note": ("round-14 TARGETED rows (not a grid re-run): conf-auto vs "
             "hand-tuned probe ratio in strict alternation, nlist=4096 "
             "two-level vs flat-forced, plateau-stop A/B/A; every entry "
             "carries spin_s, the single-thread loop seconds measured "
             "immediately before it (quiet host ~= the committed "
             "baseline; see SURVEY addendum r14)"),
    "entries": sorted(entries.values(),
                      key=lambda e: (e["dist"], e["n"], e["algo"])),
}
with open(DST, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"wrote {DST} with {len(entries)} entries")
