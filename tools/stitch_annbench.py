#!/usr/bin/env python3
"""Assemble/refresh a multi-tier ANNBENCH artifact from per-tier runs.

Usage:
    stitch_annbench.py OUT.json SRC1.json:n1[,n2...] SRC2.json:n3 ...

Each SRC contributes its entries whose `n` is in the listed set. Used
when a tier is re-measured after a code fix that cannot affect the
other tiers — the addendum must say which run produced which tier.

MERGE semantics (round 12 — the r11 version REPLACED the whole
artifact with whatever the last stitch named, which is how the
committed ANNBENCH_r11.json lost its 200k and 10M tiers, VERDICT r11
item 1):

  * If OUT already exists, its entries are the starting set.
  * For every tier `n` named by a source, ALL existing entries at that
    `n` are replaced by the source's rows (a re-measured tier
    supersedes the stale one wholesale — no mixing of old and new rows
    within a tier).
  * Tiers present in OUT but NOT named by any source are KEPT — a
    one-tier re-stitch can no longer shrink the artifact.
  * Belt-and-braces: the tool still refuses to write a result covering
    fewer tiers than OUT had, unless each dropped tier is named via
    `--drop n`.

`--selftest` proves it: a one-tier re-stitch keeps the other tiers and
replaces the named tier wholesale.
"""
import json
import os
import sys
import tempfile


def load_entries(path):
    return json.load(open(path))["entries"]


def stitch(out, srcs, drops):
    kept = load_entries(out) if os.path.exists(out) else []
    if kept:
        print(f"{out}: merging into {len(kept)} existing entries")
    prev_tiers = {e["n"] for e in kept}
    for spec in srcs:
        fname, ns = spec.rsplit(":", 1)
        replace = {int(x) for x in ns.split(",")}
        got = [e for e in load_entries(fname) if e["n"] in replace]
        if not got:
            sys.exit(f"stitch: {fname} has no entries with n in {sorted(replace)}")
        kept = [e for e in kept if e["n"] not in replace] + got
        print(f"{fname}: {len(got)} rows replace tier(s) n in {sorted(replace)}")
    kept = [e for e in kept if e["n"] not in set(drops)]
    new_tiers = {e["n"] for e in kept}
    lost = prev_tiers - new_tiers - set(drops)
    if lost:
        sys.exit(f"stitch: REFUSING to drop tier(s) n in {sorted(lost)} present "
                 f"in {out} — name them with --drop n to shrink deliberately")
    art = {"artifact": "annbench", "master": "local[32]", "entries": kept}
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    by_tier = sorted({n: sum(1 for e in kept if e["n"] == n) for n in new_tiers}.items())
    print(f"wrote {out} with {len(kept)} entries across tiers: "
          + ", ".join(f"n={n}: {c}" for n, c in by_tier))


def selftest():
    def entry(n, algo):
        return {"dist": "uniform", "n": n, "algo": algo, "recall": 1.0}
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "out.json")
        src = os.path.join(d, "src.json")
        json.dump({"artifact": "annbench",
                   "entries": [entry(200, "a"), entry(1000, "a"),
                               entry(1000, "b"), entry(5000, "a")]},
                  open(out, "w"))
        json.dump({"entries": [entry(1000, "c")]}, open(src, "w"))
        # the r11 failure replay: re-stitch ONE tier — the others must
        # survive and the named tier must be replaced wholesale
        stitch(out, [f"{src}:1000"], [])
        got = load_entries(out)
        tiers = sorted({e["n"] for e in got})
        assert tiers == [200, 1000, 5000], f"unnamed tiers were lost: {tiers}"
        assert [e["algo"] for e in got if e["n"] == 1000] == ["c"], \
            "re-measured tier must replace the stale rows wholesale"
        # deliberate shrink works only when named
        stitch(out, [f"{src}:1000"], [5000])
        assert sorted({e["n"] for e in load_entries(out)}) == [200, 1000]
    print("SELFTEST OK: one-tier re-stitch keeps unnamed tiers; "
          "replacement is wholesale; shrink requires --drop")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    args = list(sys.argv[1:])
    drops = []
    while "--drop" in args:
        i = args.index("--drop")
        drops.append(int(args[i + 1]))
        del args[i:i + 2]
    out, *srcs = args
    stitch(out, srcs, drops)


if __name__ == "__main__":
    main()
