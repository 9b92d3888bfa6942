"""Quality gate for the int8 serving path (--vae_int8 / --unet_int8):
PSNR of the quantized decode against full precision on fixture latents.

Bars come from measured margins on random-init weights (the worst case
for per-tensor activation scales): VAE-only decode measured ~36 dB,
U-Net+VAE end-to-end ~31 dB (seeded, CPU f32). The gates sit ~6 dB
under the measurement so real regressions (wrong scale site, missing
calibration, clip bug) fail loudly while numeric noise does not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livetalking_tpu.models import sd_unet, sd_vae

VAE_PSNR_BAR_DB = 30.0
E2E_PSNR_BAR_DB = 24.0


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))  # images live in [0,1]


def test_vae_int8_decode_psnr_gate():
    rng = np.random.default_rng(0)
    vp = sd_vae.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    vq = sd_vae.quantize_decoder(vp)
    z = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32)) \
        * sd_vae.SCALING_FACTOR
    vq = sd_vae.calibrate_decoder(vp, vq, z)

    a = np.asarray(jax.jit(sd_vae.decode)(vp, z))
    b = np.asarray(jax.jit(sd_vae.decode_int8)(vq, z))
    psnr = _psnr(a, b)
    assert psnr >= VAE_PSNR_BAR_DB, f"VAE int8 PSNR {psnr:.1f} dB"


def test_unet_vae_int8_end_to_end_psnr_gate():
    """The full serving quantization (int8 U-Net latents -> int8 VAE
    decode) against the full-precision pipeline, compared in image
    space — the quantity a viewer actually sees. Runs the SHIPPED
    default config (transformer linears + VAE mid-block also int8 —
    a strict superset of the conv-only --attn_int8 0 --vae_mid_int8 0
    fallback's quantized sites, whose only unique surface is the
    structural flag-off behavior covered by
    test_quantize_flags_off_leave_trees_fp below; a second full decode
    here costs ~13 min on a 1-core CI host for no added signal)."""
    rng = np.random.default_rng(0)
    cfg = sd_unet.UNetConfig(block_out=(32, 64, 96, 96), heads=2)
    up = sd_unet.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    vp = sd_vae.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    vq = sd_vae.quantize_decoder(vp, mid_int8=True)

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    t = jnp.zeros((2,), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 50, 384)).astype(np.float32))
    uq = sd_unet.calibrate_unet(
        up, sd_unet.quantize_unet(up, attn_int8=True), cfg, x, t, ctx)

    lat_f = sd_unet.apply(up, cfg, x, t, ctx)
    vq = sd_vae.calibrate_decoder(vp, vq, lat_f)
    lat_q = sd_unet.apply_int8(uq, cfg, x, t, ctx)

    img_f = np.asarray(sd_vae.decode(vp, lat_f.astype(jnp.float32),
                                     dtype=jnp.float32))
    img_q = np.asarray(sd_vae.decode_int8(vq, lat_q.astype(jnp.float32)))
    psnr = _psnr(img_f, img_q)
    assert psnr >= E2E_PSNR_BAR_DB, f"end-to-end int8 PSNR {psnr:.1f} dB"


def test_quantize_flags_off_leave_trees_fp():
    """--attn_int8 0 / --vae_mid_int8 0 structural contract: the flag-off
    quantize leaves the transformer blocks / mid resnets untouched (no
    int8 weights anywhere in those subtrees), so the fallback graph is
    the round-2 conv-only program."""
    def has_wq(tree):
        if isinstance(tree, dict):
            return "wq" in tree or any(has_wq(v) for v in tree.values())
        if isinstance(tree, (list, tuple)):
            return any(has_wq(v) for v in tree)
        return False

    cfg = sd_unet.UNetConfig(block_out=(8, 8), heads=1, layers_per_block=1)
    up = sd_unet.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    uq = sd_unet.quantize_unet(up, attn_int8=False)
    assert not has_wq(uq["mid"]["attn"])
    for blk in uq["down"] + uq["up"]:
        for attn in blk.get("attentions", []):
            assert not has_wq(attn)
    uq_on = sd_unet.quantize_unet(up, attn_int8=True)
    assert has_wq(uq_on["mid"]["attn"])

    vp = sd_vae.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)
    vq = sd_vae.quantize_decoder(vp, mid_int8=False)
    assert not has_wq(vq["dec_mid"])
    vq_on = sd_vae.quantize_decoder(vp, mid_int8=True)
    assert has_wq(vq_on["dec_mid"]["r0"]) and not has_wq(vq_on["dec_mid"]["attn"])
