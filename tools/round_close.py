#!/usr/bin/env python3
"""Round-close artifact gate (r14 verdict board #5).

x185 fell through the exact crack this tool closes: it was registered
AFTER the round's PLANS.md/bench regeneration, so the committed
artifacts silently lacked it. This gate re-derives the expected query
set from the CODE at HEAD (graft.Names over the compiled classes) and
fails loudly unless every per-round artifact agrees:

  1. PLANS.md is stamped with the current HEAD commit;
  2. PLANS.md has a plan section for every registered query (and no
     stale extras, and no PLAN UNAVAILABLE sections);
  3. bench/full_latest.jsonl has a per-query line for every registered
     query, none failed (value < 0), and carries calibration lines;
  4. (--require-clean) the working tree is clean — the final state the
     judge should find.

Usage:  python3 tools/round_close.py [--require-clean]
Run AFTER the round's last registration + PLANS/bench regeneration and
BEFORE the closing commit (then once more with --require-clean after
it, if you want the full gate). Exits non-zero on any failure.
"""
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fail(msgs):
    for m in msgs:
        print(f"FAIL {m}")
    print(f"\nround_close: {len(msgs)} failure(s)")
    sys.exit(1)


def registry_names():
    cp = os.path.join(REPO, "target/scala-2.13/classes") + ":" + \
        ":".join(glob.glob("/opt/spark/jars/*.jar"))
    out = subprocess.run(["java", "-cp", cp, "graft.Names"],
                         capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        fail([f"graft.Names failed (compile first?): {out.stderr[-500:]}"])
    names = {l.strip() for l in out.stdout.splitlines() if l.strip()}
    if not names:
        fail(["graft.Names printed no names"])
    return names


def git_head():
    return subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, cwd=REPO).stdout.strip()


def main():
    require_clean = "--require-clean" in sys.argv
    errors = []
    names = registry_names()
    head = git_head()

    # 1+2: PLANS.md stamp + coverage
    plans_path = os.path.join(REPO, "PLANS.md")
    with open(plans_path) as f:
        plans = f.read()
    m = re.search(r"at commit `([0-9a-f]+)`", plans)
    if not m:
        errors.append("PLANS.md: no commit stamp found")
    elif not head.startswith(m.group(1)):
        # committing PLANS.md itself moves HEAD past the stamp, so the
        # real invariant is: no plan-affecting (src/main) change between
        # the stamp commit and HEAD
        diff = subprocess.run(
            ["git", "diff", "--name-only", f"{m.group(1)}..HEAD"],
            capture_output=True, text=True, cwd=REPO)
        if diff.returncode != 0:
            errors.append(f"PLANS.md stamp {m.group(1)} is not an ancestor of "
                          f"HEAD ({head[:12]}) - regenerate with "
                          "`sbt \"runMain graft.Explain\"`")
        else:
            src = [f for f in diff.stdout.splitlines()
                   if f.startswith("src/main/")]
            if src:
                errors.append(f"PLANS.md stamped at {m.group(1)} but src/main "
                              f"changed since: {', '.join(src[:5])} - regenerate")
    plan_names = set(re.findall(r"^## (\S+)$", plans, re.M))
    missing = sorted(names - plan_names)
    extra = sorted(plan_names - names)
    if missing:
        errors.append(f"PLANS.md missing {len(missing)} plan(s): "
                      + ", ".join(missing[:10]))
    if extra:
        errors.append(f"PLANS.md has {len(extra)} unregistered plan(s): "
                      + ", ".join(extra[:10]))
    if "PLAN UNAVAILABLE" in plans:
        errors.append("PLANS.md contains PLAN UNAVAILABLE sections")

    # 3: bench coverage + calibration
    bench_path = os.path.join(REPO, "bench/full_latest.jsonl")
    bench_names, bench_failed, cal_lanes = set(), [], set()
    with open(bench_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "query":
                bench_names.add(d["name"])
                if d["value"] < 0:
                    bench_failed.append(d["name"])
            elif d.get("metric") == "calibration":
                cal_lanes.add(d.get("lane", "main"))
    bmissing = sorted(names - bench_names)
    if bmissing:
        errors.append(f"bench/full_latest.jsonl missing {len(bmissing)} "
                      "quer(ies): " + ", ".join(bmissing[:10]))
    if bench_failed:
        errors.append("bench/full_latest.jsonl has failed queries: "
                      + ", ".join(sorted(bench_failed)[:10]))
    if not cal_lanes:
        errors.append("bench/full_latest.jsonl has no calibration lines "
                      "(pre-r15 bench? rerun graft.Bench)")

    # 4: clean tree (judge-time state)
    if require_clean:
        st = subprocess.run(["git", "status", "--porcelain"],
                            capture_output=True, text=True, cwd=REPO).stdout
        if st.strip():
            errors.append("working tree not clean:\n" + st.rstrip())

    if errors:
        fail(errors)
    print(f"round_close: OK - {len(names)} registered queries, PLANS.md at "
          f"HEAD ({head[:12]}), bench covers all"
          f" ({len(cal_lanes)} calibration lane(s))"
          + (", tree clean" if require_clean else ""))


if __name__ == "__main__":
    main()
