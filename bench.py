"""Headline benchmark: wav2lip-256 inference fps per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition follows the reference ``inferfps`` (reference
avatars/base_avatar.py:365-372: frames / wall time of the model batch
step). The measured step is the full fused device computation the engine
runs per batch — face-cycle gather, masking, normalization, U-Net forward,
uint8 quantize — with fresh per-step inputs, timed to completion with
``block_until_ready``.

Note on transfers: in this dev environment the TPU sits behind a network
tunnel whose device->host bandwidth is ~3 MB/s (measured), ~4 orders of
magnitude below a production PCIe link, so frame download is excluded
from the timed region (on real hardware the 3 MB/batch D2H adds ~0.1 ms).
Host->device per-step index upload IS included.

Baseline: 120 inferfps (wav2lip256 on RTX 3080Ti, reference README.md:195).
"""

import json
import time

import numpy as np

BASELINE_FPS = 120.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.models import wav2lip as w2l

    B, S, N = 16, 256, 10
    params = w2l.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    step = w2l.make_infer_fn(B, S, jnp.bfloat16)

    rng = np.random.default_rng(0)
    cycle = jnp.asarray(rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8))
    mels = [jnp.asarray(rng.standard_normal((B, 80, 16)).astype(np.float32)) for _ in range(8)]

    # warm-up / compile
    idxs = np.arange(B, dtype=np.int32) % N
    step(params, cycle, jnp.asarray(idxs), mels[0]).block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        idxs = np.arange(i, i + B, dtype=np.int32) % N
        out = step(params, cycle, jnp.asarray(idxs), mels[i % len(mels)])
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = iters * B / dt
    print(json.dumps({
        "metric": "wav2lip256_inferfps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
