"""End-of-round artifact gate (r8, VERDICT r7 item 4): one command
that makes the per-round plan audit and change log unskippable.

Usage: python scratch/end_of_round.py

1. Runs scratch/explain_audit.py -> docs/PLANS_r{N}.md (N = latest
   BENCH round + 1, i.e. the round in progress) and fails loudly on
   any plan-check violation.
2. Verifies docs/CHANGES_r{N}.md exists; if not, writes a stub and
   exits nonzero so the round cannot end without a filled-in log.

Run this before the final commit of every round — short rounds
included (r7 skipped it silently; this script is the fix).
"""

import glob
import os
import re
import subprocess
import sys

REPO = "/root/repo"


def current_round() -> int:
    rounds = [int(re.search(r"BENCH_r(\d+)", p).group(1))
              for p in glob.glob(f"{REPO}/BENCH_r*.json")]
    return (max(rounds) if rounds else 0) + 1


def main() -> int:
    rnd = current_round()
    print(f"== end-of-round gate for r{rnd} ==")
    rc = subprocess.call([sys.executable, f"{REPO}/scratch/explain_audit.py"])
    plans = f"{REPO}/docs/PLANS_r{rnd}.md"
    if rc != 0 or not os.path.exists(plans):
        print(f"FAIL: plan audit did not produce {plans} (rc={rc})")
        return 1
    # r11: MISSING (an expected plan marker absent) counts as hard as
    # VIOLATION (a forbidden marker present) — a missing positive check
    # silently weakened the gate before
    violations = sum(1 for line in open(plans)
                     if "VIOLATION" in line or "FAIL" in line
                     or "MISSING" in line)
    print(f"plan audit: {plans} written, {violations} violations")
    changes = f"{REPO}/docs/CHANGES_r{rnd}.md"
    if not os.path.exists(changes):
        with open(changes, "w") as f:
            f.write(f"# Round {rnd} changes\n\nTODO: fill in before the "
                    f"final commit (stub written by end_of_round.py).\n")
        print(f"FAIL: {changes} was missing — stub written, fill it in")
        return 1
    stub = open(changes).read()
    if "TODO: fill in" in stub:
        print(f"FAIL: {changes} is still the stub")
        return 1
    print(f"change log: {changes} present")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
