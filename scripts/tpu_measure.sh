#!/bin/bash
# One-shot TPU measurement session: run when the TPU tunnel is reachable
# (jax.devices() shows the chip). Captures the headline e2e bench, the BA
# iteration bench, and the pipeline scaling bench; writes everything under
# out/tpu_measure/.
set -x
cd /root/repo
mkdir -p out/tpu_measure
timeout 1800 python bench.py \
    >out/tpu_measure/bench.json 2>out/tpu_measure/bench_secondary.txt
cat out/tpu_measure/bench.json out/tpu_measure/bench_secondary.txt
timeout 600 python scripts/bench_ba.py 2>&1 | grep -v WARNING \
    | tee out/tpu_measure/bench_ba.txt
timeout 900 python scripts/bench_scaling.py 2>&1 | grep -v WARNING \
    | tee out/tpu_measure/bench_scaling.txt
