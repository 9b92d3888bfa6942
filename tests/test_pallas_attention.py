"""Single-tile VMEM attention kernel vs the XLA twin (interpret mode on
CPU; the real kernel runs on TPU only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livetalking_tpu.ops.pallas_attention import (
    attention_xla,
    vmem_attention,
    vmem_attention_fits,
)


@pytest.mark.parametrize("B,H,T,D", [(2, 4, 128, 40), (1, 2, 256, 80),
                                     (2, 1, 128, 512)])
def test_vmem_attention_matches_xla(rng, B, H, T, D):
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    scale = D ** -0.5
    want = np.asarray(attention_xla(q, k, v, scale))
    got = np.asarray(vmem_attention(q, k, v, scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_vmem_attention_bf16_close(rng):
    B, H, T, D = 2, 2, 128, 40
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, H, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    scale = D ** -0.5
    want = np.asarray(attention_xla(q, k, v, scale), np.float32)
    got = np.asarray(vmem_attention(q, k, v, scale, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_vmem_attention_cpu_fallback_is_xla(rng):
    """On CPU without interpret, vmem_attention must route to the XLA twin
    (bitwise identical)."""
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 40)).astype(np.float32))
    got = np.asarray(vmem_attention(q, q, q, 0.1))
    want = np.asarray(attention_xla(q, q, q, 0.1))
    np.testing.assert_array_equal(got, want)


def test_vmem_attention_fits_budget():
    assert vmem_attention_fits(1024, 40)
    assert vmem_attention_fits(1024, 512)
    assert not vmem_attention_fits(4096, 128)


def test_vmem_attention_grad_matches_xla(rng):
    """custom VJP through the kernel (interpret) == autodiff of the XLA
    twin — training differentiates through the pallas path."""
    B, H, T, D = 1, 2, 128, 40
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    scale = D ** -0.5

    def loss_k(q, k, v):
        o = vmem_attention(q, k, v, scale, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_x(q, k, v):
        o = attention_xla(q, k, v, scale)
        return jnp.sum(jnp.sin(o))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_vmem_attention_fits_dtype_aware():
    """f32 tiles double the working set: (1024, 512) fits in bf16 but not
    in f32 (the VAE mid-block under --dtype float32 must fall back)."""
    assert vmem_attention_fits(1024, 512, itemsize=2)
    assert not vmem_attention_fits(1024, 512, itemsize=4)
