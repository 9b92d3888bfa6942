"""ops/pallas_conv: the implicit-GEMM 3x3 conv kernel vs the XLA conv.

Runs the kernel in interpreter mode on the CPU mesh; integer
accumulation makes the int8 comparison bit-exact up to the f32
epilogue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livetalking_tpu.ops.pallas_conv import (
    conv3x3_bf16,
    conv3x3_fits,
    conv3x3_q,
)


def _xla_conv(x, w, preferred):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


@pytest.mark.parametrize("C,O", [(128, 128), (128, 256)])
def test_int8_matches_xla(C, O):
    rng = np.random.default_rng(0)
    B, H, W = 2, 64, 64
    xq = jnp.asarray(rng.integers(-127, 128, (B, H, W, C), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C, O), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(5e-5, 2e-4, O).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(O).astype(np.float32))

    y = conv3x3_q(xq, wq, scale, bias, interpret=True).astype(jnp.float32)
    ref = (_xla_conv(xq, wq, jnp.int32).astype(jnp.float32) * scale
           + bias).astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=np.max(np.abs(ref)) * 8e-3)


def test_int8_residual_fusion():
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 64, 72, 128
    xq = jnp.asarray(rng.integers(-127, 128, (B, H, W, C), dtype=np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C), dtype=np.int8))
    scale = jnp.full((C,), 1e-4, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32),
                      jnp.bfloat16)

    y = conv3x3_q(xq, wq, scale, bias, residual=res,
                  interpret=True).astype(jnp.float32)
    ref = (_xla_conv(xq, wq, jnp.int32).astype(jnp.float32) * scale + bias
           + res.astype(jnp.float32)).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32),
                               rtol=0, atol=np.max(np.abs(ref)) * 8e-3)


def test_bf16_matches_xla():
    rng = np.random.default_rng(2)
    B, H, W, C, O = 1, 64, 64, 128, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)).astype(np.float32) * 0.02,
                    jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(O).astype(np.float32))

    y = conv3x3_bf16(x, w, bias, interpret=True).astype(np.float32)
    ref = (_xla_conv(x, w, jnp.float32) + bias).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fits_gating():
    assert conv3x3_fits(256, 256, 128, 128)
    assert conv3x3_fits(64, 64, 512, 512)
    assert not conv3x3_fits(32, 32, 512, 512)   # small maps: XLA path
    assert not conv3x3_fits(256, 256, 64, 128)  # lane-unaligned channels
    assert not conv3x3_fits(96, 96, 128, 128) or 96 % 8 == 0  # width rule
