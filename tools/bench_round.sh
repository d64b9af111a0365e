#!/bin/bash
# Round official-bench pipeline (run alone in tmux; nothing else on
# the box): probe-gated headline bench, then 2-vs-8-core pinned
# scaling, then 1M-page capacity (geo + curation ride-along).
# Every artifact self-reports its DRAM probes; bench.py additionally
# waits up to SPARK_GRAFT_BENCH_MAX_WAIT for two consecutive healthy
# probes before falling back to an annotated run.
set -u
cd /root/repo
mkdir -p BENCH
R=${1:-r05}

export SPARK_GRAFT_BENCH_MAX_WAIT=${SPARK_GRAFT_BENCH_MAX_WAIT:-9000}
python bench.py 2>/tmp/bench_${R}.err | tail -1 > BENCH/bench_${R}_official.json
echo "bench done: $(date)"

python tools/bench_scaling.py 500000 2 2>/tmp/scaling_${R}.err | tail -1 > BENCH/scaling_${R}.json
echo "scaling done: $(date)"

python tools/bench_capacity.py 1000000 32 2 2>/tmp/capacity_${R}.err | tail -1 > BENCH/capacity_${R}.json
echo "capacity done: $(date)"
echo "ALL-BENCHES-DONE"
