#!/usr/bin/env python
"""sf1.0 → sf10 decade probe for the heavy iterative entries (VERDICT
r13 task 7): the 100 TB claims rested on ONE measured decade
(sf0.1→sf1.0, BENCH_sf1.json); this adds the second. Build the inputs
first:

  python scripts/make_scale.py                       # .scale/sf1.0
  SPARK_GRAFT_SRC_SF=/root/repo/.scale/sf1.0 \\
  SPARK_GRAFT_SCALE_OFF=100000000 \\
  python scripts/make_scale.py /root/repo/.scale/sf10   # 10x again

then `python scripts/bench_scale10.py [out]` (default BENCH_sf10.json).

Each (section, sf) pair runs in a fresh JVM via `bench.py --section`
with SPARK_GRAFT_BENCH_ENTRIES restricting the section to the probe
entries, so the 10x data cost is paid only for the entries under audit.
alpha = log10(t_sf10 / t_sf1) — < 1 is sublinear in the decade, > 1
flags super-linear behavior worth a plan audit.
"""

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = {"1.0": os.path.join(REPO, ".scale", "sf1.0"),
           "10": os.path.join(REPO, ".scale", "sf10")}
#: section → the heavy entries probed at the sf1→sf10 decade
ENTRIES = {
    "components": ["connected_components", "closure_doubling", "scc",
                   "min_spanning_forest"],
    "analytics": ["pagerank_3it", "edge_betweenness_h8",
                  "node_betweenness_h8", "girvan_newman_1r_s16"],
}


def run_section(section: str, sf_dir: str,
                entries: "list[str] | None" = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ENTRIES=",".join(
                   entries or ENTRIES[section]))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--section", section],
        capture_output=True, text=True, timeout=14400, env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"section {section} at {sf_dir} failed")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    got = json.loads(line)["queries"]
    sys.stderr.write(f"[scale10] {section} @ {sf_dir}: "
                     f"{ {k: round(v, 1) for k, v in got.items()} } "
                     f"({round(time.time() - t0, 1)}s wall)\n")
    return got


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "BENCH_sf10.json")
    for tag, d in SF_DIRS.items():
        if not os.path.isdir(d):
            raise SystemExit(f"missing {d} — run scripts/make_scale.py "
                             "(see module docstring)")
    t_small: dict = {}
    t_big: dict = {}
    # ONE entry per JVM (r15): at sf10 a shared section JVM accumulates
    # enough cross-entry block-store/JIT state to die mid-section — and
    # per-entry fresh JVMs are the stronger isolation anyway (the r10
    # lesson that built bench.py's orchestrator)
    for sec, names in ENTRIES.items():
        for name in names:
            t_small.update(run_section(sec, SF_DIRS["1.0"], [name]))
            t_big.update(run_section(sec, SF_DIRS["10"], [name]))
    entries = {}
    for k in t_small:
        if k not in t_big:
            continue
        ratio = t_big[k] / t_small[k] if t_small[k] else float("inf")
        entries[k] = {
            "sf1": t_small[k], "sf10": t_big[k],
            "ratio": round(ratio, 3),
            "alpha": round(math.log10(ratio), 3) if ratio > 0 else None,
        }
    out = {
        "metric": "sf1_to_sf10_decade",
        "decade": "sf1.0 -> sf10 (synthetic 10x of the synthetic 10x)",
        "entries": entries,
        "n_sublinear": sum(1 for e in entries.values()
                           if e["alpha"] is not None and e["alpha"] < 1),
        "n_entries": len(entries),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
