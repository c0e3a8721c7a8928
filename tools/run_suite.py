"""Crash-isolated test suite runner (VERDICT r4 #7b).

The full suite in ONE pytest process is not stable on this box: XLA's
CPU compiler has segfaulted mid-run twice (rc=139, observed 2026-08-19
and 2026-08-20 — once ~87% through a 40-minute run, voiding it). This
runner partitions the test files into a few groups and runs each group
in its own pytest process, so one crash can only void its group; a
crashed group is automatically re-run file-by-file to isolate the
crashing file while still collecting the others' results.

Usage:
    python tools/run_suite.py                # full suite, 4 groups
    python tools/run_suite.py -m "not slow"  # fast tier only
    python tools/run_suite.py --groups 6 --durations 25
Exit code: 0 iff every test passed (crash-isolated reruns included).
"""

import argparse
import glob
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) failed)?"
)


def run_pytest(files, extra):
    cmd = [sys.executable, "-m", "pytest", "-q", "--tb=short", *extra, *files]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    return proc.returncode, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("-m", dest="marker", default=None,
                    help="pytest -m expression (e.g. 'not slow')")
    ap.add_argument("--durations", type=int, default=None)
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    extra = list(args.pytest_args)
    if args.marker:
        extra += ["-m", args.marker]
    if args.durations is not None:
        extra += [f"--durations={args.durations}"]

    files = sorted(glob.glob(str(REPO / "tests" / "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    # round-robin keeps known-heavy neighbours (alphabetical clusters
    # like test_instance*/test_pretrained) in different groups
    groups = [files[i::args.groups] for i in range(args.groups)]

    t_start = time.time()
    failures, crashes = [], []
    for gi, group in enumerate(groups):
        names = [Path(f).name for f in group]
        print(f"\n=== group {gi + 1}/{len(groups)}: {' '.join(names)}",
              flush=True)
        rc, dt = run_pytest(group, extra)
        print(f"=== group {gi + 1} rc={rc} in {dt:.0f}s", flush=True)
        if rc == 0:
            continue
        if rc in (1,):  # red tests, no crash
            failures.append((names, rc))
            continue
        # crash (segfault/abort/interrupted): isolate file-by-file so the
        # rest of the group still gets a verdict
        crashes.append((names, rc))
        print(f"=== group {gi + 1} crashed (rc={rc}); isolating per file",
              flush=True)
        for f in group:
            rc_f, dt_f = run_pytest([f], extra)
            print(f"  - {Path(f).name}: rc={rc_f} in {dt_f:.0f}s", flush=True)
            if rc_f == 1:
                failures.append(([Path(f).name], rc_f))
            elif rc_f not in (0, 5):  # 5 = no tests collected (marker)
                failures.append(([Path(f).name], rc_f))

    total = time.time() - t_start
    print(f"\n=== suite done in {total / 60:.1f} min; "
          f"{len(failures)} failing group(s), "
          f"{len(crashes)} crash(es) isolated", flush=True)
    for names, rc in failures:
        print(f"  FAILED rc={rc}: {' '.join(names)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
