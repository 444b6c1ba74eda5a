#!/usr/bin/env python
"""sf1.0 scale probe: run the graph-core + dedup + similarity bench
sections at sf0.1 and at the 10x synthetic sf1.0 dataset
(scripts/make_scale.py), one fresh JVM per (section, sf), and write
BENCH_sf1.json with per-entry times, the t(sf1)/t(sf0.1) ratio and the
scaling exponent alpha = log10(ratio) — alpha ~= 1.0 is per-row linear
scaling, alpha << 1 means fixed overhead still dominates at sf1, and
alpha > 1 flags super-linear behavior worth a plan audit.

The 100 TB grade extrapolates from plan shape; this gives it a measured
10x data point. Usage:
  python scripts/make_scale.py          # once, builds .scale/sf1.0
  python scripts/bench_scale.py [out]   # default BENCH_sf1.json
"""

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SECTIONS = ["core", "components", "analytics", "dedup", "similarity",
            "curation", "stats", "temporal"]
SF_DIRS = {"0.1": "/root/testdata/sf0.1",
           "1.0": os.path.join(REPO, ".scale", "sf1.0")}


def run_section(section: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--section", section],
        capture_output=True, text=True, timeout=3600, env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"section {section} at {sf_dir} failed")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    got = json.loads(line)["queries"]
    sys.stderr.write(f"[scale] {section} @ {sf_dir}: "
                     f"{round(sum(got.values()), 1)}s entries, "
                     f"{round(time.time() - t0, 1)}s wall\n")
    return got


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "BENCH_sf1.json")
    if not os.path.isdir(SF_DIRS["1.0"]):
        raise SystemExit("run scripts/make_scale.py first")
    t_small: dict = {}
    t_big: dict = {}
    for sec in SECTIONS:
        t_small.update(run_section(sec, SF_DIRS["0.1"]))
        t_big.update(run_section(sec, SF_DIRS["1.0"]))
    entries = {}
    for k in t_small:
        if k not in t_big:
            continue
        ratio = t_big[k] / t_small[k] if t_small[k] > 0 else None
        entries[k] = {
            "sf0.1_sec": t_small[k],
            "sf1.0_sec": t_big[k],
            "ratio": round(ratio, 2) if ratio else None,
            "alpha": round(math.log10(ratio), 2) if ratio and ratio > 0
            else None,
        }
    doc = {
        "metric": "sf1_scale_probe",
        "sections": SECTIONS,
        "dataset": ("synthetic sf1.0 = 10x key-offset replication of "
                    "sf0.1 with per-replica content mutation "
                    "(scripts/make_scale.py)"),
        "interpretation": ("alpha = log10(t_sf1/t_sf0.1); 1.0 = linear "
                           "in rows, <1 = overhead-dominated at this "
                           "scale, >1 = super-linear (audit)"),
        "entries": entries,
        "total_sf0.1": round(sum(t_small.values()), 1),
        "total_sf1.0": round(sum(t_big.values()), 1),
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({k: v["alpha"] for k, v in entries.items()}))


if __name__ == "__main__":
    main()
