"""Capacity datapoint (VERDICT r3 #7): 1M pages end-to-end at the
machine's full width, best-of-2, DRAM probe recorded.

Usage:
    python tools/bench_capacity.py [n_pages] [cpus] [reps]

Reuses bench_scaling's subprocess snippet (fresh JVM per rep, cold
cache) WITHOUT taskset pinning — this measures the box at full width,
where the memory system (not the engine) is the ceiling; see the
wider-machine disclosure in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

from bench_scaling import REPO, RUN_SNIPPET


def probe() -> float:
    import numpy as np
    a = np.zeros(512 * 1024 * 1024 // 8)
    t0 = time.perf_counter()
    a.sum()
    return round(a.nbytes / (time.perf_counter() - t0) / 1e9, 2)


def run_unpinned(cpus: int, n_pages: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail:\n{proc.stderr[-2000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    probe_pre = probe()
    runs = [run_unpinned(cpus, n_pages) for _ in range(reps)]
    best = min(runs, key=lambda r: r["sec"])
    probe_post = probe()
    print(json.dumps({"capacity": best, "all_secs": [r["sec"] for r in runs],
                      "n_pages": n_pages, "cpus": cpus,
                      "dram_gbps_pre": probe_pre,
                      "dram_gbps_post": probe_post}))


if __name__ == "__main__":
    main()
