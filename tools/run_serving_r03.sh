#!/bin/bash
# Round-3 serving campaign: true-egress engine benchmarks (device paste
# composed into the coalesced super-batch, frames counted at transport
# egress) — 8-session headline, the >8-session capacity curve
# (VERDICT r2 item 10), and the calibrated-int8 quality/speed pairing
# (item 6). Artifacts land in the repo root for the judge.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

python bench_serving.py --engine --sessions 8  --secs 60 \
    --out SERVING_r03_engine8.json  2>&1 | tail -3
python bench_serving.py --engine --sessions 12 --secs 45 \
    --out SERVING_r03_engine12.json 2>&1 | tail -3
python bench_serving.py --engine --sessions 16 --secs 45 \
    --out SERVING_r03_engine16.json 2>&1 | tail -3
python bench_serving.py --engine --sessions 8  --secs 45 --calibrated \
    --out SERVING_r03_engine8_calibrated.json 2>&1 | tail -3
