"""On-chip test-lane runner (VERDICT r3 item 1).

Runs the Pallas-kernel + pipeline test subset on the REAL TPU chip
(``MCAX_TEST_PLATFORM=tpu``) and records the outcome as a committed
artifact (default ``TPU_SUITE_r04.json``): per-file pass/fail counts, the
platform, and wall time.  Each file runs in its own pytest process —
Mosaic compiles over the tunneled backend can take minutes per kernel and
a wedged client must not poison the rest of the lane.

Usage:  python tools/tpu_suite.py [--out TPU_SUITE_r04.json] [--timeout S]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

# The on-chip lane: every file whose tests exercise compiled Pallas
# kernels, the algo layer, or the production pipeline path where it
# actually ships (r5: extended from the 5-file kernel/pipeline subset to
# the full algo + frames + boundary suites — VERDICT r4 item 6; the
# tests route complex values through tests/helpers.run_planes, the
# production float-plane jit-boundary pattern).  One pytest process per
# file: the tunneled backend can wedge, and cross-file jit-cache/env
# interactions in a shared process produce spurious failures that the
# per-file runs do not.
LANE = [
    "tests/unit/test_covprefix.py",
    "tests/unit/test_kernels_pallas.py",
    "tests/unit/test_mvdrsolve.py",
    "tests/unit/test_fft.py",
    "tests/unit/test_pipeline.py",
    "tests/unit/test_srp.py",
    "tests/unit/test_gcc.py",
    "tests/unit/test_gcc_weightings.py",
    "tests/unit/test_mvdr.py",
    "tests/unit/test_frames.py",
    "tests/unit/test_filters.py",
    "tests/unit/test_subband.py",
    "tests/unit/test_tracking.py",
    "tests/unit/test_particle.py",
    "tests/unit/test_process_blocks.py",
    "tests/unit/test_boundaries.py",
]


def run_file(path: str, timeout: float) -> dict:
    """One pytest process per file; counts come from --junit-xml, NOT a
    regex over the terminal summary (VERDICT r4 weak 6: a -q format
    change or an error before collection could mis-parse as 0/0 with a
    green look).  The exit code is authoritative for ok-ness; an
    unparsable/missing XML is reported as a failure, never as silence."""
    t0 = time.time()
    env = dict(os.environ, MCAX_TEST_PLATFORM="tpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.NamedTemporaryFile(suffix=".xml", delete=False) as tf:
        junit = tf.name
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", path, "-q", "--tb=line",
             f"--junit-xml={junit}"],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=repo)
        res = {"file": path, "rc": proc.returncode,
               "passed": 0, "failed": 0,
               "wall_s": round(time.time() - t0, 1)}
        try:
            suite = ET.parse(junit).getroot()
            if suite.tag != "testsuite":      # pytest nests under testsuites
                suite = suite.find("testsuite")
            tests = int(suite.get("tests", 0))
            errors = int(suite.get("errors", 0))
            failures = int(suite.get("failures", 0))
            skipped = int(suite.get("skipped", 0))
            res["failed"] = errors + failures
            res["passed"] = tests - errors - failures - skipped
            if skipped:
                res["skipped"] = skipped
        except (ET.ParseError, OSError, AttributeError, TypeError):
            res["failed"] = max(res["failed"], 1)
            res["parse_error"] = "missing/unparsable junit xml"
        if proc.returncode != 0 or res["failed"]:
            res["tail"] = proc.stdout.strip().splitlines()[-8:]
        return res
    except subprocess.TimeoutExpired:
        return {"file": path, "rc": "timeout", "passed": 0, "failed": 1,
                "wall_s": round(time.time() - t0, 1)}
    finally:
        try:
            os.unlink(junit)
        except OSError:
            pass


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TPU_SUITE_r04.json")
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-file timeout (Mosaic compiles over the "
                         "tunnel can take minutes per kernel)")
    ap.add_argument("--files", nargs="*", default=None)
    args = ap.parse_args(argv)
    import jax
    report = {"platform": jax.default_backend(),
              "device": str(jax.devices()[0]),
              "lane": "MCAX_TEST_PLATFORM=tpu (real chip, compiled "
                      "Pallas kernels — no interpret mode)",
              "files": []}
    ok = True
    for path in (args.files or LANE):
        res = run_file(path, args.timeout)
        report["files"].append(res)
        ok = ok and res["rc"] == 0 and res["failed"] == 0
        print(json.dumps(res), flush=True)
    report["total_passed"] = sum(r["passed"] for r in report["files"])
    report["total_failed"] = sum(r["failed"] for r in report["files"])
    report["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({"ok": ok, "passed": report["total_passed"],
                      "failed": report["total_failed"]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
