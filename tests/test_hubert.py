"""Parity of the JAX HuBERT encoder vs transformers' torch HubertModel.

Uses small randomly-initialized configs (no downloads) covering both
architecture variants: the stable-pre-LN "large" layout the reference
runtime uses (hubert-large-ls960-ft, reference
avatars/ultralight/audio2feature.py:18-19) and the post-LN "base" layout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import hubert as hub  # noqa: E402


def _mk_pair(stable: bool):
    hf_cfg = tfm.HubertConfig(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=(32, 32),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    tmodel = tfm.HubertModel(hf_cfg).eval()

    jcfg = hub.HubertConfig(
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        conv_bias=stable, feat_extract_norm="layer" if stable else "group",
        hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128,
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    params = hub.convert_torch_state_dict(tmodel.state_dict(), jcfg, dtype=jnp.float32)
    return tmodel, jcfg, params


@pytest.mark.parametrize("stable", [True, False], ids=["large-stableLN", "base-postLN"])
def test_hubert_parity(stable):
    tmodel, jcfg, params = _mk_pair(stable)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 3200)).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(wav)).last_hidden_state.numpy()

    got = np.asarray(hub.apply(params, jcfg, jnp.asarray(wav), normalize=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_out_length_matches_reference_formula():
    # reference audio2feature.py:33: expected_T = (T - (400-320)) // 320
    cfg = hub.LARGE
    for T in (16640, 16000, 32000):
        assert cfg.out_length(T) == (T - 80) // 320
    assert cfg.receptive_field == 400
    assert cfg.total_stride == 320
