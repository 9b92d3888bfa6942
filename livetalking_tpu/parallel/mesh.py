"""Device mesh construction and sharding rules.

Usage:
    mesh = make_mesh("dp=4,tp=2")
    params = shard_params(params, mesh)          # tp channel sharding
    batch  = shard_batch(batch, mesh)            # dp batch sharding
    step   = jax.jit(train_step)                 # shardings propagate

Computation follows data: with inputs placed via NamedSharding, XLA's SPMD
partitioner inserts the all-gathers / reduce-scatters / psums over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """'dp=4,tp=2' -> {'dp': 4, 'tp': 2}."""
    out: Dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, val = part.partition("=")
        out[name.strip()] = int(val)
    return out


def make_mesh(spec: str = "", devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from a spec string; empty spec = all devices on dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spec:
        dims = parse_mesh_spec(spec)
    else:
        dims = {DP_AXIS: n}
    size = int(np.prod(list(dims.values())))
    if size != n:
        raise ValueError(f"mesh spec {dims} needs {size} devices, have {n}")
    arr = np.asarray(devices).reshape(tuple(dims.values()))
    return Mesh(arr, tuple(dims.keys()))


def default_mesh_for(n_devices: int) -> Mesh:
    """Factor n into a dp x tp mesh (tp=2 when even) — the sensible default
    for the conv-heavy lip-sync models: batch parallel first, channel
    parallel second."""
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"default_mesh_for({n_devices}): backend has only "
            f"{len(devices)} device(s); provision a virtual CPU mesh first "
            "(JAX_PLATFORMS=cpu + "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}, "
            "set before the JAX backend initializes)"
        )
    devices = devices[:n_devices]
    tp = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    dp = n_devices // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def _param_spec(path_leaf_shape, tp: int) -> P:
    """Channel-shard conv kernels (HWIO) and biases over tp when the output
    channel dim is large and divisible; replicate otherwise."""
    shape = path_leaf_shape
    if len(shape) == 4 and shape[-1] % tp == 0 and shape[-1] >= 128:
        return P(None, None, None, TP_AXIS)
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= 128:
        return P(TP_AXIS)
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh with tp channel sharding."""
    tp = mesh.shape.get(TP_AXIS, 1)

    def place(leaf):
        spec = _param_spec(leaf.shape, tp) if tp > 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) axis of every leaf over dp."""

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P(DP_AXIS)))

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )
