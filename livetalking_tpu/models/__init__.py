"""Avatar model families, rebuilt as pure-functional JAX (NHWC, bf16 MXU)."""
