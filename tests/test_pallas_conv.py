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


# ---------------------------------------------------------------------------
# conv3x3_gnq — the fused GN+SiLU+quantize+conv production kernel
# ---------------------------------------------------------------------------

from livetalking_tpu.ops.pallas_conv import conv3x3_gnq, conv3x3_gnq_fits


def _gnq_reference(x, gn_scale, gn_shift, act_scale, wq, out_scale, bias,
                   residual=None):
    """Straight-line XLA replica of the fused kernel's math."""
    a = x.astype(jnp.float32)
    if gn_scale is not None:
        a = a * gn_scale[:, None, None, :] + gn_shift[:, None, None, :]
        a = a * jax.nn.sigmoid(a)
    aq = jnp.clip(jnp.round(a / act_scale), -127, 127).astype(jnp.int8)
    z = _xla_conv(aq, wq, jnp.int32)
    y = z.astype(jnp.float32) * out_scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    yb = y.astype(jnp.bfloat16)
    yf = yb.astype(jnp.float32)
    return yb, jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))


@pytest.mark.parametrize("gn", [True, False])
def test_gnq_matches_reference(gn):
    rng = np.random.default_rng(3)
    B, H, W, C, O = 2, 32, 24, 128, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    gns = jnp.asarray(rng.uniform(0.5, 1.5, (B, C)).astype(np.float32)) if gn else None
    gnb = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.2) if gn else None
    act = jnp.asarray(0.011, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C, O), dtype=np.int8))
    osc = jnp.asarray(rng.uniform(5e-5, 2e-4, O).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(O).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.standard_normal((B, H, W, O)).astype(np.float32),
                      jnp.bfloat16)

    y, s1, s2 = conv3x3_gnq(x, gns, gnb, act, wq, osc, bias, residual=res,
                            interpret=True)
    yr, s1r, s2r = _gnq_reference(x, gns, gnb, act, wq, osc, bias, residual=res)
    scale_bar = float(jnp.max(osc))
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               atol=max(2e-2, scale_bar * 4), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-3, atol=1e-2 * H * W)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-3, atol=1e-2 * H * W)


def test_gnq_fits_gating():
    assert conv3x3_gnq_fits(256, 256, 128, 128)
    assert conv3x3_gnq_fits(64, 64, 512, 512)
    assert not conv3x3_gnq_fits(32, 32, 512, 512)          # below min_h
    assert conv3x3_gnq_fits(32, 32, 512, 512, min_h=16)    # test override
    assert not conv3x3_gnq_fits(256, 256, 64, 128)         # lane-unaligned


def test_fused_decode_matches_xla_path():
    """The fused up-block chain (moments riding kernel epilogues) must
    reproduce the pure-XLA int8 decode to rounding noise."""
    import livetalking_tpu.models.sd_vae as sv
    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales
    from livetalking_tpu.utils.jaxinit import jit_init

    vp = jit_init(sv.init_params, jax.random.PRNGKey(1), jnp.bfloat16)
    # pin the all-int8 tree: these tests exercise the fused int8 chain
    # and build their XLA reference with _conv_q at every site (the r5
    # bf16-epilogue default keeps shortcuts/conv_out full precision)
    vq = _with_dummy_scales(sv.quantize_decoder(vp, bf16_epilogue=False))
    # realistic activation scales: calibrate on the test latents so the
    # int8 grids are meaningful (dummy scale 1.0 would crush activations)
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
                    * sv.SCALING_FACTOR)
    vq = sv.calibrate_decoder(vp, vq, z)

    assert sv._fused_chain_fits(vq, 8, min_h=16)

    # shared pre-chain (latent convs + mid block)
    zz = (z / sv.SCALING_FACTOR).astype(jnp.bfloat16)
    h = sv.conv(vq["post_quant_conv"], zz, padding=0)
    h = sv.conv(vq["dec_conv_in"], h)
    # mid resnets are int8 under the r3 vae_mid_int8 default — select
    # the resnet impl exactly as decode_int8 does
    mid_resnet = (sv._resnet_block_q
                  if "wq" in vq["dec_mid"]["r0"]["conv1"] else sv.resnet_block)
    h = mid_resnet(vq["dec_mid"]["r0"], h)
    h = sv.spatial_attention(vq["dec_mid"]["attn"], h)
    h = mid_resnet(vq["dec_mid"]["r1"], h)

    got = sv._decode_int8_fused(vq, h, interpret=True)

    hx = h
    for blk in vq["dec_up"]:
        for rp in blk["resnets"]:
            hx = sv._resnet_block_q(rp, hx)
        if "up" in blk:
            hx = sv._conv_q(blk["up"], sv.upsample_nearest2x(hx))
    hx = sv._conv_q(vq["dec_conv_out"],
                    sv.silu(sv.group_norm(vq["dec_norm_out"], hx)))
    want = jnp.clip(hx.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    mse = float(np.mean((g - w) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, f"fused decode diverges from XLA path: {psnr:.1f} dB"


@pytest.mark.parametrize("knobs", [
    # chain drop at block-0 upsampler, restart into block 1's resnets
    dict(skip_up={0}, restart_block=1, from_block=0),
    # from_block=2 keeps upsamplers 0-1 on XLA even with a restart
    # active (the restarted chain must NOT override from_block)
    dict(skip_up=set(), restart_block=1, from_block=2),
    # every upsampler on XLA; restart guard alone routes fit resnets
    dict(skip_up={0, 1, 2}, restart_block=0, from_block=0),
])
def test_fused_decode_routing_knobs(knobs):
    """skip_up/restart_block/from_block combos (the chain-drop-then-
    restart transitions) must all reproduce the pure-XLA int8 decode."""
    import livetalking_tpu.models.sd_vae as sv
    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales
    from livetalking_tpu.utils.jaxinit import jit_init

    vp = jit_init(sv.init_params, jax.random.PRNGKey(1), jnp.bfloat16)
    # pin the all-int8 tree: these tests exercise the fused int8 chain
    # and build their XLA reference with _conv_q at every site (the r5
    # bf16-epilogue default keeps shortcuts/conv_out full precision)
    vq = _with_dummy_scales(sv.quantize_decoder(vp, bf16_epilogue=False))
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
                    * sv.SCALING_FACTOR)
    vq = sv.calibrate_decoder(vp, vq, z)

    zz = (z / sv.SCALING_FACTOR).astype(jnp.bfloat16)
    h = sv.conv(vq["post_quant_conv"], zz, padding=0)
    h = sv.conv(vq["dec_conv_in"], h)
    # mid resnets are int8 under the r3 vae_mid_int8 default — select
    # the resnet impl exactly as decode_int8 does
    mid_resnet = (sv._resnet_block_q
                  if "wq" in vq["dec_mid"]["r0"]["conv1"] else sv.resnet_block)
    h = mid_resnet(vq["dec_mid"]["r0"], h)
    h = sv.spatial_attention(vq["dec_mid"]["attn"], h)
    h = mid_resnet(vq["dec_mid"]["r1"], h)

    got = sv._decode_int8_fused(vq, h, interpret=True, min_h=16, **knobs)

    hx = h
    for blk in vq["dec_up"]:
        for rp in blk["resnets"]:
            hx = sv._resnet_block_q(rp, hx)
        if "up" in blk:
            hx = sv._conv_q(blk["up"], sv.upsample_nearest2x(hx))
    hx = sv._conv_q(vq["dec_conv_out"],
                    sv.silu(sv.group_norm(vq["dec_norm_out"], hx)))
    want = jnp.clip(hx.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    mse = float(np.mean((g - w) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, f"knobs {knobs}: fused decode diverges: {psnr:.1f} dB"


def test_restart_skips_unfit_blocks():
    """restart_block=0 must NOT route block-0 resnets (below min_h at
    the mid-block resolution) into the fused kernel — the per-block fit
    guard falls through to the XLA path instead of crashing/silently
    running an unvalidated shape."""
    import livetalking_tpu.models.sd_vae as sv

    blk = {"resnets": [{"conv1": {"wq": np.zeros((3, 3, 512, 512),
                                                 np.int8)}}]}
    # 8x8 is below any min_h the production path uses
    assert not sv._block_resnets_fit(blk, (1, 8, 8, 512), min_h=64)
    assert not sv._block_resnets_fit(blk, (1, 8, 8, 512), min_h=16)
    assert sv._block_resnets_fit(blk, (1, 64, 64, 512), min_h=64)


def test_gnq_upsample_matches_reference():
    """upsample=True must equal conv3x3(nearest2x(x)) with the same
    quantize semantics."""
    from livetalking_tpu.models.diffusion_blocks import upsample_nearest2x
    rng = np.random.default_rng(5)
    B, Hs, Ws, C, O = 2, 16, 12, 128, 128
    x = jnp.asarray(rng.standard_normal((B, Hs, Ws, C)).astype(np.float32),
                    jnp.bfloat16)
    act = jnp.asarray(0.012, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C, O), dtype=np.int8))
    osc = jnp.asarray(rng.uniform(5e-5, 2e-4, O).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(O).astype(np.float32) * 0.1)

    y, s1, s2 = conv3x3_gnq(x, None, None, act, wq, osc, bias,
                            upsample=True, interpret=True)
    yr, s1r, s2r = _gnq_reference(upsample_nearest2x(x), None, None, act,
                                  wq, osc, bias)
    assert y.shape == (B, 2 * Hs, 2 * Ws, O)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-3, atol=1e-2 * 4 * Hs * Ws)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-3, atol=1e-2 * 4 * Hs * Ws)
