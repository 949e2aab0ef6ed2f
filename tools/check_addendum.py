#!/usr/bin/env python3
"""Mechanized addendum-figure integrity check (VERDICT r10 item 2,
hardened per VERDICT r11 item 2).

Two rounds in a row, SURVEY addendum prose quoted figures that the
committed artifacts contradicted (r9: a stale bench total; r10: a
retuned-away ANN tier + a mid-round bench total + a stale test count),
and in r11 the addendum shipped literal ⟪placeholder⟫ tokens plus an
artifact whose tiers the assembly section contradicted — and this
script passed vacuously because it only validated the checks that
existed. The process fix: every number an addendum quotes must be
backed by an inline assertion the snapshot re-evaluates against the
committed artifact, AND the checker now fails on what r11 shipped:

  1. any unexpanded ⟪…⟫ placeholder anywhere in SURVEY.md;
  2. a `tiers` assertion whose artifact is missing a named tier;
  3. a current-round measurement artifact (ANNBENCH_/SKYBENCH_/
     OPQCHECK_ at the highest committed round number) that no check
     references — current-round ANNBENCH files additionally require a
     `tiers` assertion, so the assembly section's tier claims are
     machine-checked against the committed file. (Driver-written
     BENCH_r*/CORRECTNESS_r* appear AFTER snapshot time and are
     exempt; their figures are covered via bench_sf0.1.json checks.)

Conventions — anywhere in SURVEY.md (typically right after the prose
that quotes the figure):

    <!--check: <artifact> <selector> <expected> [tol]-->
    <!--tiers: <annbench-file> n1,n2,...-->

where <artifact> is either
  * a JSON file path relative to the repo root (dotted-key selector
    with [i] list indexing, e.g. `bench_sf0.1.json total_median_sec`
    or `BENCH_r10.json queries.ann_ivfpq`), or
  * the pseudo-artifact `testreports` with selector `count` — the
    number of <testcase> elements across target/test-reports/*.xml, or
  * the pseudo-artifact `annbench:<file>` with selector
    `<dist>|<n>|<algo>|<field>` over the entries list (| because algo
    labels contain slashes), or
  * the pseudo-artifact `opqcheck:<file>` with selector
    `<ksub>|<opq>|<shortlist>|<field>`.

<expected> is a number; [tol] an optional absolute tolerance (default:
exact for ints, 1e-9 for floats — quote artifact values verbatim).

Exit 0 iff every check passes; prints one line per check.
`--selftest` additionally proves all four failure modes fail: a stale
figure, a ⟪placeholder⟫, a missing tier, and an unreferenced
current-round artifact.
"""
import json
import re
import sys
import glob
import os
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHECK_RE = re.compile(r"<!--check:\s*(\S+)\s+(\S+)\s+(-?[\d.]+)(?:\s+([\d.eE+-]+))?\s*-->")
TIERS_RE = re.compile(r"<!--tiers:\s*(\S+)\s+([\d,]+)\s*-->")
ENVREF_RE = re.compile(r"<!--envref:\s*([\d.]+)\s*-->")
PLACEHOLDER_RE = re.compile(r"⟪[^⟫\n]{0,120}⟫")
ROUND_FILE_RE = re.compile(r"^(ANNBENCH|SKYBENCH|OPQCHECK)_r(\d+)\.json$")


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
    # 4-part selector: dist|n|algo|field (rounds <= 14); 5-part adds the
    # r15 `kind` discriminator: dist|n|kind|algo|field (build and probe
    # rows may share an algo label and differ only in kind)
    parts = selector.split("|")
    if len(parts) == 5:
        dist, n, kind, algo, field = parts
    else:
        dist, n, algo, field = parts
        kind = None
    data = json.load(open(os.path.join(ROOT, fname)))
    for e in data["entries"]:
        if (e["dist"] == dist and str(e["n"]) == n and e["algo"] == algo
                and (kind is None or e.get("kind") == kind)):
            return e[field]
    raise KeyError(f"no entry {dist}/{n}/{kind or '*'}/{algo} in {fname}")


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


def current_round_files(names):
    """The measurement artifacts of the HIGHEST committed round among
    the builder-owned prefixes — the files rule 3 makes mandatory to
    reference."""
    rounds = {}
    for name in names:
        m = ROUND_FILE_RE.match(name)
        if m:
            rounds.setdefault(int(m.group(2)), []).append(name)
    if not rounds:
        return []
    return sorted(rounds[max(rounds)])


def current_round_number(names):
    """Highest round among the builder-owned round-stamped artifacts —
    the round whose figures must validate against the live tree."""
    rounds = [int(m.group(2)) for m in
              (ROUND_FILE_RE.match(n) for n in names) if m]
    return max(rounds) if rounds else 0


def run_checks(text, repo_files=None, dirty_checker=None):
    failures = []
    if repo_files is None:
        repo_files = os.listdir(ROOT)
    cur_round = current_round_number(repo_files)

    # rule 1: no unexpanded placeholders anywhere
    for tok in PLACEHOLDER_RE.findall(text):
        print(f"FAIL placeholder token shipped in SURVEY.md: {tok}")
        failures.append(f"unexpanded placeholder {tok}")

    # rule 2: tier assertions — every named tier exists in the artifact
    tier_refs = set()
    for fname, ns in TIERS_RE.findall(text):
        tier_refs.add(fname)
        try:
            present = {str(e["n"]) for e in
                       json.load(open(os.path.join(ROOT, fname)))["entries"]}
        except Exception as e:  # noqa: BLE001
            print(f"ERR  tiers {fname}: {e}")
            failures.append(f"tiers {fname}: unreadable ({e})")
            continue
        for n in ns.split(","):
            ok = n in present
            print(f"{'OK  ' if ok else 'FAIL'} tiers {fname}: n={n} "
                  f"{'present' if ok else 'MISSING — the addendum names a tier the artifact lacks'}")
            if not ok:
                failures.append(f"tiers {fname}: tier n={n} missing from artifact")

    checks = CHECK_RE.findall(text)
    if not checks:
        print("check_addendum: NO check comments found — closing numbers "
              "must carry <!--check: ...--> assertions")
        return failures + ["no checks present"]
    checked_files = set(tier_refs)
    for artifact, selector, expected, tol in checks:
        # Round-scoped testreports checks (`testreports@rN count X`): the
        # live-tree test count GROWS every round, so a historical
        # addendum's count is a snapshot of its own round, not an
        # invariant of the current tree (the r13 checker design flaw:
        # r12's `count 316` failed forever once r13 added tests). Only
        # the check tagged with the CURRENT round (or an untagged one)
        # validates against the live tree; older tags print HIST and
        # pass — they were validated by their own round's snapshot.
        m_tr = re.match(r"^testreports@r(\d+)$", artifact)
        if m_tr and int(m_tr.group(1)) < cur_round:
            print(f"HIST {artifact} {selector}: quoted {expected} "
                  f"(frozen at r{m_tr.group(1)} snapshot; live tree is r{cur_round})")
            continue
        if m_tr:
            artifact = "testreports"
        checked_files.add(artifact.split(":", 1)[1] if ":" in artifact else artifact)
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

    # rule 3: every current-round measurement artifact is referenced by
    # at least one check; current-round ANNBENCH files also need tiers
    if repo_files is None:
        repo_files = os.listdir(ROOT)
    for name in current_round_files(repo_files):
        if name not in checked_files:
            print(f"FAIL current-round artifact {name} has NO inline check — "
                  "the round's own headline must be assertion-backed")
            failures.append(f"current-round artifact {name} unreferenced by any check")
        if name.startswith("ANNBENCH") and name not in tier_refs:
            print(f"FAIL current-round artifact {name} has no <!--tiers:--> "
                  "assertion — assembly-section tier claims must be machine-checked")
            failures.append(f"current-round artifact {name} missing tiers assertion")

    # rule 5 (VERDICT r14 item 1): effective-cores gating. The r14
    # driver bench ran 45% slow while the single-thread spin read quiet
    # — only multi-core load could see the contention — so r15+
    # artifacts carry a parallel-spin `eff_cores` figure (EnvProbe) and
    # the addendum declares the session's reference with
    # `<!--envref: N-->`. Any CHECKED artifact whose eff_cores falls
    # more than 20% below the reference fails: its timings are
    # machine-classified as environmentally poisoned instead of judge-
    # adjudicated. Artifacts without eff fields (pre-r15) pass untouched.
    envrefs = ENVREF_RE.findall(text)
    envref = float(envrefs[-1]) if envrefs else None
    for name in sorted(checked_files):
        fpath = os.path.join(ROOT, name)
        if not os.path.exists(fpath):
            continue
        try:
            data = json.load(open(fpath))
        except Exception:  # noqa: BLE001 — non-JSON pseudo artifacts
            continue
        effs = []
        env = data.get("env") if isinstance(data, dict) else None
        if isinstance(env, dict):
            effs += [env[k] for k in ("eff_cores_start", "eff_cores_end")
                     if isinstance(env.get(k), (int, float))]
        if isinstance(data, dict):
            for e in data.get("entries", []) or []:
                if isinstance(e, dict) and isinstance(e.get("eff_cores"), (int, float)):
                    effs.append(e["eff_cores"])
        if not effs:
            continue
        if envref is None:
            print(f"FAIL {name} carries eff_cores figures but SURVEY.md "
                  "declares no <!--envref: N--> reference")
            failures.append(f"{name} has eff_cores but no envref declared")
            continue
        # Two floors (r16, ADVICE r15: the r15 single-floor rule was
        # back-fitted to the session's worst self-load reading and could
        # not reject any run it had actually seen — and one ULP the other
        # way it would have failed its own artifact):
        #  - MEDIAN >= 0.8*envref: pervasive contention (the r14 driver
        #    shape — most readings low) poisons an artifact even when no
        #    single reading is catastrophic. The envref is now derived
        #    from the quiet-reading band's median, not the worst point,
        #    so this floor has real margin.
        #  - MIN >= 0.6*envref: one deep reading (self-load right after a
        #    heavy job, or a contention spike) fails outright; a single
        #    mild dip does NOT sink an otherwise-quiet artifact, which is
        #    the self-load special case ADVICE r15 asked for.
        srt = sorted(effs)
        med = (srt[len(srt) // 2] if len(srt) % 2 == 1
               else (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2)
        worst = srt[0]
        ok_med = med >= 0.8 * envref
        ok_min = worst >= 0.6 * envref
        print(f"{'OK  ' if ok_med and ok_min else 'FAIL'} envgate {name}: "
              f"median eff_cores {med} (floor {0.8 * envref:.2f}), "
              f"min {worst} (floor {0.6 * envref:.2f}) vs reference {envref}")
        if not ok_med:
            failures.append(
                f"envgate {name}: median eff_cores {med} < 80% of reference "
                f"{envref} — timings environmentally poisoned (pervasive)")
        if not ok_min:
            failures.append(
                f"envgate {name}: min eff_cores {worst} < 60% of reference "
                f"{envref} — at least one timing deeply poisoned")

    # rule 4 (VERDICT r12 item 1): a checked artifact whose WORKING-TREE
    # copy differs from its committed (HEAD) blob fails — the r12
    # defect was exactly this: the driver's post-snapshot bench re-run
    # overwrote bench_sf0.1.json in place, so the committed checks
    # silently validated drifted figures. Round-stamped artifact names
    # (bench_sf0.1_r13.json, ...) are the prevention; this rule is the
    # detection, so any future same-named write trips the checker
    # instead of the judge. `--allow-dirty` (or dirty_checker=None at
    # selftest time) skips it during pre-commit iteration.
    if dirty_checker is not None:
        for name in sorted(checked_files):
            if not os.path.exists(os.path.join(ROOT, name)):
                continue  # unreadable files already ERR'd above
            state = dirty_checker(name)
            if state == "dirty":
                print(f"FAIL checked artifact {name} is MODIFIED vs HEAD — "
                      "the quoted figures validate a working-tree copy the "
                      "commit does not contain (round-stamp the artifact)")
                failures.append(f"checked artifact {name} dirty vs HEAD")
    return failures


def git_dirty_state(name):
    """'dirty' if `name` is tracked in HEAD and its working-tree copy
    differs; 'clean' if tracked and identical; 'untracked' otherwise
    (a brand-new artifact awaiting its first commit is not drift)."""
    import subprocess
    tracked = subprocess.run(
        ["git", "-C", ROOT, "cat-file", "-e", f"HEAD:{name}"],
        capture_output=True).returncode == 0
    if not tracked:
        return "untracked"
    differs = subprocess.run(
        ["git", "-C", ROOT, "diff", "--quiet", "HEAD", "--", name],
        capture_output=True).returncode != 0
    return "dirty" if differs else "clean"


def selftest(text):
    # mode 0 (r10): a deliberately stale figure fails
    stale = '<!--check: bench_sf0.1.json total_median_sec 999.9-->'
    bad = run_checks(text + "\n" + stale)
    assert any("999.9" in f for f in bad), "stale figure did not fail"
    # mode 1 (r11): an unexpanded placeholder fails
    bad = run_checks(text + "\n⟪10M-NUMBERS⟫")
    assert any("placeholder" in f for f in bad), "placeholder did not fail"
    # mode 2 (r11): a tier named by the addendum but missing from the
    # artifact fails (99 is no tier of any committed annbench)
    art = sorted(f for f in os.listdir(ROOT) if ROUND_FILE_RE.match(f)
                 and f.startswith("ANNBENCH"))[-1]
    bad = run_checks(text + f"\n<!--tiers: {art} 99-->")
    assert any("n=99 missing" in f for f in bad), "missing tier did not fail"
    # mode 3 (r11): a current-round artifact nothing references fails
    bad = run_checks(text, repo_files=list(os.listdir(ROOT)) + ["ANNBENCH_r99.json"])
    assert any("ANNBENCH_r99.json" in f for f in bad), \
        "unreferenced current-round artifact did not fail"
    # mode 4 (r12): a checked artifact overwritten in the working tree
    # after commit fails — injected dirty state replays the r12 driver
    # collision without touching any real file
    bad = run_checks(text, dirty_checker=lambda name: "dirty")
    assert any("dirty vs HEAD" in f for f in bad), \
        "dirty checked artifact did not fail"
    # mode 5 (r15, two-floor form since r16): envgate. Injected via a
    # scratch artifact, four scenarios: (a) pervasively-contended
    # readings fail the MEDIAN floor (the r14 driver shape); (b) one
    # deep self-load reading among quiet ones passes the median floor
    # but fails the MIN floor only when under 60%; (c) a single MILD dip
    # among quiet readings passes both (the self-load allowance); (d)
    # eff-carrying artifacts with NO envref declaration fail.
    import tempfile

    def eff_artifact(*effs):
        scratch = tempfile.NamedTemporaryFile(
            "w", dir=ROOT, suffix=".json", delete=False)
        json.dump({"total_median_sec": 1.0,
                   "entries": [{"eff_cores": e} for e in effs]}, scratch)
        scratch.close()
        return scratch.name

    for effs, expect_fail, tag in (
            ((17.0, 17.5, 16.8), True, "pervasive contention (median floor)"),
            ((25.0, 26.0, 11.0), True, "deep self-load dip (min floor)"),
            ((25.0, 26.0, 19.5), False, "mild dip among quiet readings"),
            ((25.0, 27.0, 26.0), False, "quiet artifact")):
        fp = eff_artifact(*effs)
        rel = os.path.basename(fp)
        try:
            bad = run_checks(
                text + f"\n<!--envref: 24-->\n<!--check: {rel} total_median_sec 1.0-->")
            hit = any("envgate" in f and rel in f for f in bad)
            assert hit == expect_fail, \
                f"envgate selftest: {tag} expected fail={expect_fail}, got {hit}"
        finally:
            os.unlink(fp)
    fp = eff_artifact(25.0)
    rel = os.path.basename(fp)
    try:
        stripped = ENVREF_RE.sub("", text)
        bad = run_checks(stripped + f"\n<!--check: {rel} total_median_sec 1.0-->")
        assert any("no envref" in f for f in bad), \
            "eff-carrying artifact without envref did not fail"
    finally:
        os.unlink(fp)
    print("SELFTEST OK: stale figure, placeholder, missing tier, "
          "unreferenced current-round artifact, dirty checked artifact, "
          "and contended/undeclared eff_cores all fail")


def main():
    path = os.path.join(ROOT, "SURVEY.md")
    text = open(path).read()
    dirty = None if "--allow-dirty" in sys.argv else git_dirty_state
    failures = run_checks(text, dirty_checker=dirty)
    if "--selftest" in sys.argv:
        selftest(text)
    if failures:
        print(f"== {len(failures)} figure(s)/invariant(s) drifted from artifacts ==")
        sys.exit(1)
    print("== all quoted figures match committed artifacts ==")


if __name__ == "__main__":
    main()
