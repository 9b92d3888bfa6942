"""Multi-chip scaling: device meshes, sharding rules, collectives via XLA.

The reference is single-process single-GPU (SURVEY §2.10); this package is
the TPU-native replacement for "more GPUs": data-parallel batch sharding
over ICI for throughput, tensor-parallel channel sharding of the large
conv stacks for latency, all expressed as jax.sharding annotations so XLA
inserts the collectives.
"""
