#!/usr/bin/env python3
"""Mechanized addendum-figure integrity check (VERDICT r10 item 2).

Two rounds in a row, SURVEY addendum prose quoted figures that the
committed artifacts contradicted (r9: a stale bench total; r10: a
retuned-away ANN tier + a mid-round bench total + a stale test count).
The process fix: every number an addendum quotes must be backed by an
inline assertion the snapshot re-evaluates against the committed
artifact, so prose cannot drift from artifacts without this script
failing.

Convention — anywhere in SURVEY.md (typically right after the prose
that quotes the figure):

    <!--check: <artifact> <selector> <expected> [tol]-->

where <artifact> is either
  * a JSON file path relative to the repo root (dotted-key selector
    with [i] list indexing, e.g. `bench_sf0.1.json total_median_sec`
    or `BENCH_r10.json queries.ann_ivfpq`), or
  * the pseudo-artifact `testreports` with selector `count` — the
    number of <testcase> elements across target/test-reports/*.xml, or
  * the pseudo-artifact `annbench:<file>` with selector
    `<dist>|<n>|<algo>|<field>` over the entries list (| because algo
    labels contain slashes).

<expected> is a number; [tol] an optional absolute tolerance (default:
exact for ints, 1e-9 for floats — quote artifact values verbatim).

Exit 0 iff every check passes; prints one line per check.
`--selftest` additionally proves a deliberately stale figure fails.
"""
import json
import re
import sys
import glob
import os
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHECK_RE = re.compile(r"<!--check:\s*(\S+)\s+(\S+)\s+(-?[\d.]+)(?:\s+([\d.eE+-]+))?\s*-->")


def select(obj, selector):
    for part in selector.split("."):
        while True:
            m = re.match(r"^([^\[]*)\[(\d+)\](.*)$", part)
            if not m:
                break
            key, idx, rest = m.group(1), int(m.group(2)), m.group(3)
            if key:
                obj = obj[key]
            obj = obj[idx]
            part = rest.lstrip(".")
            if not part:
                break
        if part:
            obj = obj[part]
    return obj


def testcase_count():
    n = 0
    for f in glob.glob(os.path.join(ROOT, "target/test-reports/*.xml")):
        n += sum(1 for _ in ET.parse(f).getroot().iter("testcase"))
    return n


def annbench_value(fname, selector):
    dist, n, algo, field = selector.split("|")
    data = json.load(open(os.path.join(ROOT, fname)))
    for e in data["entries"]:
        if e["dist"] == dist and str(e["n"]) == n and e["algo"] == algo:
            return e[field]
    raise KeyError(f"no entry {dist}/{n}/{algo} in {fname}")


def opqcheck_value(fname, selector):
    ksub, opq, shortlist, field = selector.split("|")
    data = json.load(open(os.path.join(ROOT, fname)))
    for e in data["entries"]:
        if (str(e["ksub"]), str(e["opq"]), str(e["shortlist"])) == (ksub, opq, shortlist):
            return e[field]
    raise KeyError(f"no entry {ksub}/{opq}/{shortlist} in {fname}")


def evaluate(artifact, selector):
    if artifact == "testreports":
        assert selector == "count", "testreports only supports `count`"
        return testcase_count()
    if artifact.startswith("annbench:"):
        return annbench_value(artifact.split(":", 1)[1], selector)
    if artifact.startswith("opqcheck:"):
        return opqcheck_value(artifact.split(":", 1)[1], selector)
    return select(json.load(open(os.path.join(ROOT, artifact))), selector)


def run_checks(text):
    failures = []
    checks = CHECK_RE.findall(text)
    if not checks:
        print("check_addendum: NO check comments found — closing numbers "
              "must carry <!--check: ...--> assertions")
        return ["no checks present"]
    for artifact, selector, expected, tol in checks:
        exp = float(expected)
        tol_v = float(tol) if tol else (0.0 if exp == int(exp) and "." not in expected else 1e-9)
        try:
            got = float(evaluate(artifact, selector))
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            failures.append(f"{artifact} {selector}: quoted {expected}, unreadable ({e})")
            print(f"ERR  {artifact} {selector}: {e}")
            continue
        ok = abs(got - exp) <= tol_v
        print(f"{'OK  ' if ok else 'FAIL'} {artifact} {selector}: "
              f"quoted {expected}, artifact {got}")
        if not ok:
            failures.append(f"{artifact} {selector}: quoted {expected} != artifact {got}")
    return failures


def main():
    path = os.path.join(ROOT, "SURVEY.md")
    text = open(path).read()
    failures = run_checks(text)
    if "--selftest" in sys.argv:
        stale = '<!--check: bench_sf0.1.json total_median_sec 999.9-->'
        bad = run_checks(text + "\n" + stale)
        if not any("999.9" in f for f in bad):
            print("SELFTEST FAIL: a deliberately stale figure did not fail")
            sys.exit(2)
        print("SELFTEST OK: stale figure detected")
    if failures:
        print(f"== {len(failures)} figure(s) drifted from artifacts ==")
        sys.exit(1)
    print("== all quoted figures match committed artifacts ==")


if __name__ == "__main__":
    main()
