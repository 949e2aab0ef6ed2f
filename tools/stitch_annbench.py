#!/usr/bin/env python3
"""Assemble a final ANNBENCH artifact from per-tier runs.

Usage:
    stitch_annbench.py OUT.json SRC1.json:n1[,n2...] SRC2.json:n3 ...

Each SRC contributes only its entries whose `n` is in the listed set;
tiers appear in the order given. Used when a tier is re-measured after
a code fix that cannot affect the other tiers (e.g. the r11 mini-batch
trainer fix only engages above the 1.25M training cap, so the <=1M
rows of the earlier run remain valid measurements of the same code
path) — the addendum must say which run produced which tier.
"""
import json
import sys


def main():
    out, *srcs = sys.argv[1:]
    entries = []
    for spec in srcs:
        fname, ns = spec.split(":")
        keep = {int(x) for x in ns.split(",")}
        data = json.load(open(fname))
        got = [e for e in data["entries"] if e["n"] in keep]
        if not got:
            sys.exit(f"stitch: {fname} has no entries with n in {sorted(keep)}")
        entries.extend(got)
        print(f"{fname}: took {len(got)} rows for n in {sorted(keep)}")
    art = {"artifact": "annbench", "master": "local[32]", "entries": entries}
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out} with {len(entries)} entries")


if __name__ == "__main__":
    main()
