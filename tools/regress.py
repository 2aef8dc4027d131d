"""One-command full local regression: tests + oracle parity + ANSI sweep
+ bench, with a single PASS/FAIL summary — the pre-commit gate for big
refactors (each stage is also runnable alone; see each tool's docstring).

Usage: python tools/regress.py [--quick]
  --quick skips the (slow) full pytest suite and runs the other three
  stages only.

Stages (all run from /tmp to catch closure-serialization bugs):
  1. pytest tests/ -q                        (~7 min)
  2. tools/parity_full.py at sf0.01          (~4 min, every registered query)
  3. tools/ansi_smoke.py at sf0.001          (~3 min, strict semantics)
  4. bench.py at $SPARK_GRAFT_SF_DIR         (~2 min, one JSON line)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], cwd: str = "/tmp") -> bool:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=cwd, capture_output=True, text=True, timeout=1800
    )
    ok = proc.returncode == 0
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-3:])
    print(f"[{'PASS' if ok else 'FAIL'}] {name} ({time.time() - t0:.0f}s)")
    print("       " + tail.replace("\n", "\n       "))
    if not ok:
        print((proc.stderr or "")[-2000:])
    return ok

def main() -> None:
    quick = "--quick" in sys.argv
    results = []
    if not quick:
        results.append(run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO))
    results.append(run("lazy-import lint", [sys.executable, f"{REPO}/tools/lint_lazy_imports.py", REPO]))
    # r9 lesson (w_rolling_distinct): a new lazy re-derivation must not
    # land silently — the audit is cheap next to parity
    results.append(run("scan-audit", [sys.executable, f"{REPO}/tools/scan_audit.py", "/root/testdata/sf0.01", "3", "--gate"]))
    results.append(run("parity", [sys.executable, f"{REPO}/tools/parity_full.py", "/root/testdata/sf0.01"]))
    results.append(run("ansi", [sys.executable, f"{REPO}/tools/ansi_smoke.py", "/root/testdata/sf0.001"]))
    results.append(run("bench", [sys.executable, f"{REPO}/bench.py"]))
    print("=" * 40)
    print("ALL PASS" if all(results) else "FAILURES PRESENT")
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
