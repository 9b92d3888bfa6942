#!/bin/bash
# Round-5 serving measurement suite (VERDICT r4 items 3,4,5 + epilogue A/B).
# Run from the repo root with the tunnel up:  bash tools/run_r5_serving_suite.sh
# Each step probes the tunnel first and skips (not fails) on outage so a
# flap costs one step, not the suite. Artifacts land in the repo root.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

probe() {
  timeout 150 python -c "import jax; print((jax.numpy.ones((8,8))@jax.numpy.ones((8,8))).sum())" >/dev/null 2>&1
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if ! probe; then echo "[$name] SKIP: tunnel down $(date -u +%T)"; return 1; fi
  echo "[$name] start $(date -u +%T)"
  timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  echo "[$name] rc=$rc $(date -u +%T)"
  tail -3 "/tmp/r5_${name}.log"
  return $rc
}

# 1. ultralight coalesced engine egress (vs r4 per-session 45.9)
step ul8 2400 python bench_serving.py --engine --family ultralight \
  --sessions 8 --batch 16 --secs 30 --out SERVING_r05_ultralight_engine8.json

# 2. ultralight capacity point at 12 (curve)
step ul12 2400 python bench_serving.py --engine --family ultralight \
  --sessions 12 --batch 16 --secs 30 --max_bucket 12 \
  --out SERVING_r05_ultralight_engine12.json

# 3. wav2lip capacity curve: 12 and 16 sessions (8 = r4 artifact 95.5)
step w12 2400 python bench_serving.py --engine --family wav2lip \
  --sessions 12 --batch 16 --secs 30 --max_bucket 12 \
  --out SERVING_r05_wav2lip_engine12.json
step w16 2400 python bench_serving.py --engine --family wav2lip \
  --sessions 16 --batch 16 --secs 30 --max_bucket 16 \
  --out SERVING_r05_wav2lip_engine16.json

# 4. ernerf engine egress + capacity points (per-session topology)
step nerf4 2400 python bench_serving.py --engine --family ernerf \
  --sessions 4 --batch 4 --secs 30 --out SERVING_r05_ernerf_engine4.json
step nerf8 2400 python bench_serving.py --engine --family ernerf \
  --sessions 8 --batch 4 --secs 30 --out SERVING_r05_ernerf_engine8.json

# 5. paced low-latency tier: deeper jitter buffer (VERDICT r4 item 3)
step b4paced 2400 python bench_serving.py --engine --sessions 8 --batch 4 \
  --secs 30 --paced --egress_buffer_frames 10 \
  --out SERVING_r05_b4_paced_jb10.json

# 6. VAE epilogue A/B (decoder optimization evidence)
step vaeab 1800 python tools/bench_vae_epilogue.py --out VAE_EPILOGUE_r05.json

echo "suite done $(date -u +%T)"
