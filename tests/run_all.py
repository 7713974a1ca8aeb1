"""One-command full-suite runner for this 1-CPU host (VERDICT r4 task 5).

The single-process `pytest tests/ -q` mega-run stopped completing here:
XLA:CPU compile state accumulates across the compile-heavy modules until
the process segfaults inside backend_compile_and_load (~90%, >40 min).
Every test passes in a fresh process, so the fix is process isolation,
not test changes: run the fast tier (`-m "not heavy"`) in one process,
then each heavy module (conftest.HEAVY_MODULES) in its own process.

    python tests/run_all.py [extra pytest args...]

Exit code 0 iff every tier passed. Prints a per-tier wall-time table.
Do NOT run concurrently with TPU benches (CLAUDE.md: host starvation
degrades every relay number).
"""

import os
import subprocess
import sys
import time

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(TESTS_DIR)

# import without triggering conftest's jax init side effects is fine --
# conftest only sets env + jax config, both harmless in the parent
sys.path.insert(0, TESTS_DIR)
from conftest import HEAVY_MODULES  # noqa: E402


def main():
    extra = sys.argv[1:]
    tiers = [("fast", ["tests", "-q", "-m", "not heavy"])]
    for mod in sorted(HEAVY_MODULES):
        path = os.path.join("tests", mod + ".py")
        if os.path.exists(os.path.join(REPO_ROOT, path)):
            tiers.append((mod, [path, "-q"]))

    results = []
    t_all = time.monotonic()
    for name, args in tiers:
        t0 = time.monotonic()
        print(f"\n== tier {name}: pytest {' '.join(args)}", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", *args, *extra], cwd=REPO_ROOT
        )
        results.append((name, rc, time.monotonic() - t0))

    print(f"\n== suite summary ({time.monotonic() - t_all:.0f}s total) ==")
    failed = 0
    for name, rc, dt in results:
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        failed += rc != 0
        print(f"  {name:18s} {dt:7.1f}s  {status}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
