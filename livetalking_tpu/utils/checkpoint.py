"""Param-pytree checkpoint save/load.

The reference's "checkpointing surface" is torch.load at model-load time
(SURVEY §5 checkpoint/resume); training here needs a write path too.
Format: a pickle of the pytree with every leaf materialized to numpy —
host-portable, loadable without JAX, and independent of device layout
(load + ``jax.device_put``/``shard_params`` re-places on any mesh).
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    import jax

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    with open(path, "wb") as f:
        pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
