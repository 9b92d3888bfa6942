"""Device-friendly parameter initialization.

Eager ``init_params`` implementations issue one tiny device op per layer;
behind a remote-device link (or any high-latency dispatch path) those
roundtrips dominate startup. ``jit_init`` traces the whole init into ONE
device program: measured 13 s vs 68 s for wav2lip-256 on a tunneled
TPU v5e.
"""

from __future__ import annotations


def jit_init(init_fn, key, *args, **kwargs):
    """Run ``init_fn(key, *args, **kwargs)`` as a single jitted program."""
    import jax

    return jax.jit(lambda k: init_fn(k, *args, **kwargs))(key)
