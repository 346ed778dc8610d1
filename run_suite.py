"""One-command atomic suite run (VERDICT round-3 item 2).

Runs every ``tests/test_*.py`` module in its OWN sequential pytest
process and emits ONE combined log with ONE pass/fail summary.  The
per-process isolation bounds the XLA CPU compiler's resident compiled
programs — the accumulating-state segfault (exit 139) that killed two
full-suite runs at ~75% cannot span modules when each gets a fresh
process (the per-module ``jax.clear_caches()`` mitigation in
tests/conftest.py remains, but this makes the bound structural).

Usage::

    python run_suite.py                  # not-slow suite -> /tmp/suite_run.log
    python run_suite.py --log PATH       # choose the artifact path
    python run_suite.py --slow           # include the slow marker too
    python run_suite.py --modules a b    # subset (module basenames)

Exit code 0 iff every module ran to completion with zero failures and
zero errors.  A module process that dies (segfault, OOM) is reported as
CRASHED with its exit code and fails the suite.
"""

import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
_COUNT = re.compile(r"(\d+) (passed|failed|errors?|skipped|xfailed|"
                    r"xpassed|deselected|warnings?)")


def run_module(mod, log, slow=False, timeout=7200):
    cmd = [sys.executable, "-m", "pytest", str(mod), "-q",
           "--color=no", "-p", "no:cacheprovider"]
    if not slow:
        cmd += ["-m", "not slow"]
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                              timeout=timeout)
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -99
        out = ((e.stdout or "") + (e.stderr or "")
               + f"\n[run_suite] TIMEOUT after {timeout}s\n")
    wall = time.perf_counter() - t0

    counts = {}
    for m in _COUNT.finditer(out):
        counts[m.group(2).rstrip("s")] = counts.get(
            m.group(2).rstrip("s"), 0) + int(m.group(1))
    log.write(f"\n{'='*78}\n== {mod.name}  (exit={rc}, {wall:.1f}s)\n"
              f"{'='*78}\n{out}\n")
    log.flush()
    return rc, counts, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/suite_run.log")
    ap.add_argument("--slow", action="store_true",
                    help="include slow-marked tests")
    ap.add_argument("--modules", nargs="*", default=None,
                    help="subset of module basenames (e.g. test_gp)")
    ap.add_argument("--timeout", type=int, default=7200,
                    help="per-module wall limit in seconds")
    args = ap.parse_args()

    mods = sorted((ROOT / "tests").glob("test_*.py"))
    if args.modules:
        want = {m if m.endswith(".py") else m + ".py" for m in args.modules}
        mods = [m for m in mods if m.name in want]
    if not mods:
        print("no test modules matched", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    totals = {}
    failed_mods, crashed_mods = [], []
    with open(args.log, "w") as log:
        log.write(f"run_suite.py — {len(mods)} modules, "
                  f"slow={'included' if args.slow else 'excluded'}\n")
        for mod in mods:
            rc, counts, wall = run_module(mod, log, slow=args.slow,
                                          timeout=args.timeout)
            for k, v in counts.items():
                totals[k] = totals.get(k, 0) + v
            status = "ok"
            # exit 5 = no tests collected (all deselected) — fine
            if rc not in (0, 5):
                if counts.get("failed", 0) or counts.get("error", 0):
                    failed_mods.append(mod.name)
                    status = "FAILED"
                else:
                    crashed_mods.append(f"{mod.name}(exit={rc})")
                    status = f"CRASHED exit={rc}"
            line = (f"[{mod.name:<28}] {status:<16} {wall:7.1f}s  "
                    + " ".join(f"{v} {k}" for k, v in sorted(counts.items())))
            print(line, flush=True)
            log.write(f"[summary] {line}\n")
            log.flush()

        wall_total = time.perf_counter() - t0
        green = not failed_mods and not crashed_mods
        summary = (f"SUITE {'ALL GREEN' if green else 'NOT GREEN'}: "
                   + " ".join(f"{v} {k}" for k, v in sorted(totals.items()))
                   + f" across {len(mods)} modules in {wall_total:.0f}s")
        if failed_mods:
            summary += f" | failed: {','.join(failed_mods)}"
        if crashed_mods:
            summary += f" | crashed: {','.join(crashed_mods)}"
        print(summary, flush=True)
        log.write("\n" + summary + "\n")
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main())
