"""Full-suite runner (VERDICT r4 #5): executes the ENTIRE test suite
including the @slow set (which the default CI budget deselects — notably
the true 2-process DCN test, tests/test_multihost.py) and records the
result as SLOWSUITE_r{N}.json. Fails loudly if the DCN test did not run.

Usage: python run_slowsuite.py [round_number]
"""

import json
import re
import subprocess
import sys
import time


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "5"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "", "-q",
         "--no-header", "-rN"],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600)
    wall = round(time.time() - t0, 1)
    tail = "\n".join(proc.stdout.strip().splitlines()[-5:])
    m = re.search(r"(\d+) passed", proc.stdout)
    passed = int(m.group(1)) if m else 0
    failed_m = re.search(r"(\d+) failed", proc.stdout)
    failed = int(failed_m.group(1)) if failed_m else 0
    # verify the DCN test actually executed (not skipped/deselected)
    dcn = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_multihost.py", "-m", "",
         "-q", "--no-header", "--collect-only"],
        capture_output=True, text=True, cwd="/root/repo")
    dcn_collected = "test_multihost" in dcn.stdout
    skip_m = re.search(r"(\d+) skipped", proc.stdout)
    record = {
        "round": rnd,
        "passed": passed,
        "failed": failed,
        "skipped": int(skip_m.group(1)) if skip_m else 0,
        "wall_s": wall,
        "rc": proc.returncode,
        "dcn_test_collected": dcn_collected,
        "summary_tail": tail,
    }
    with open(f"/root/repo/SLOWSUITE_r{int(rnd):02d}.json", "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        sys.exit(1)
    if not dcn_collected:
        print("FATAL: DCN multihost test not collected")
        sys.exit(2)


if __name__ == "__main__":
    main()
