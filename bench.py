"""Headline benchmark: wav2lip-256 inference fps per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition follows the reference ``inferfps`` (reference
avatars/base_avatar.py:365-372: frames / wall time of the model batch
step). The measured step is the full fused device computation the engine
runs per batch — face-cycle gather, masking, normalization, U-Net
forward, uint8 quantize.

Methodology: K data-chained steps run inside ONE jitted ``lax.fori_loop``
(each iteration's indices derive from the previous output, so steps
cannot be elided or overlapped), timed to a forced scalar fetch, at two
K values; fps comes from the time DIFFERENCE, which cancels dispatch /
link round-trip overhead. This is robust both on directly-attached chips
and behind remote-device tunnels where ``block_until_ready`` semantics
are unreliable.

Baseline: 120 inferfps (wav2lip256 on RTX 3080Ti, reference README.md:195).
"""

import json
import time

import numpy as np

BASELINE_FPS = 120.0
B, S, N = 16, 256, 10
K_SMALL, K_LARGE = 10, 60


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from livetalking_tpu.models import wav2lip as w2l
    from livetalking_tpu.utils.jaxinit import jit_init

    params = jit_init(w2l.init_params, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # the production fused step itself (jit-of-jit inlines under run_k)
    fused = w2l.make_infer_fn(B, S, jnp.bfloat16)

    def make_run_k(k):
        @jax.jit
        def run_k(params, cycle, mel, idxs0):
            def body(_, carry):
                acc, idxs = carry
                out = fused(params, cycle, idxs, mel)
                s = jnp.sum(out[:, ::64, ::64, 0].astype(jnp.int32))
                return acc + s, (idxs + 1 + (s % 2)) % N
            return lax.fori_loop(0, k, body, (jnp.int32(0), idxs0))
        return run_k

    rng = np.random.default_rng(0)
    cycle = jnp.asarray(rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8))
    mel = jnp.asarray(rng.standard_normal((B, 80, 16)).astype(np.float32))
    idxs0 = jnp.arange(B, dtype=jnp.int32) % N

    def timed(k) -> float:
        run_k = make_run_k(k)
        int(run_k(params, cycle, mel, idxs0)[0])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(run_k(params, cycle, mel, idxs0)[0])  # forced scalar fetch
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_large = timed(K_SMALL), timed(K_LARGE)
    fps = (K_LARGE - K_SMALL) * B / (t_large - t_small)
    print(json.dumps({
        "metric": "wav2lip256_inferfps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
