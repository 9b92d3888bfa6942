"""Parity: whisper mel vs HF WhisperFeatureExtractor; encoder (stacked
hidden states) vs HF WhisperModel.encoder — both with random tiny configs,
no downloads."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import whisper_encoder as we  # noqa: E402
from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram  # noqa: E402


def test_log_mel_matches_hf_extractor(rng):
    fe = tfm.WhisperFeatureExtractor()  # defaults: 80 mels, 16 kHz, 30 s
    wav = (0.3 * np.sin(2 * np.pi * 330 * np.arange(16640) / 16000)
           + 0.05 * rng.standard_normal(16640)).astype(np.float32)
    want = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
    assert got.shape == want.shape == (80, 3000)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = tfm.WhisperConfig(
        vocab_size=100, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None, begin_suppress_tokens=None,
        d_model=64, encoder_layers=3, encoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_layers=1, decoder_attention_heads=2,
        decoder_ffn_dim=128, num_mel_bins=80, max_source_positions=100,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    tmodel = tfm.WhisperModel(hf_cfg).eval()
    jcfg = we.WhisperConfig(d_model=64, num_layers=3, num_heads=2, ffn=128,
                            max_positions=100)
    params = we.convert_torch_state_dict(tmodel.state_dict(), jcfg, dtype=jnp.float32)
    return tmodel, jcfg, params


def test_encoder_stacked_hidden_states_parity(pair, rng):
    tmodel, jcfg, params = pair
    mel = rng.standard_normal((1, 80, 200)).astype(np.float32)  # -> 100 positions

    with torch.no_grad():
        out = tmodel.encoder(torch.from_numpy(mel), output_hidden_states=True)
    want = torch.stack(out.hidden_states, dim=2).numpy()  # (1, 100, L+1, 64)

    got = np.asarray(we.apply_stacked(params, jcfg, jnp.asarray(mel)))
    assert got.shape == want.shape == (1, 100, 4, 64)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decoder_step_parity_with_hf():
    """KV-cached decode_step logits match a torch HF WhisperDecoder forward
    (tiny random-init config) for a short prompt."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp

    from livetalking_tpu.models import whisper_decoder as wd

    hf_cfg = transformers.WhisperConfig(
        vocab_size=1000, d_model=64, decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=128, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, num_mel_bins=80, max_target_positions=64,
        max_source_positions=32, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    tdec = transformers.models.whisper.modeling_whisper.WhisperDecoder(hf_cfg).eval()

    cfg = wd.WhisperDecoderConfig(vocab_size=1000, d_model=64, num_layers=2,
                                  num_heads=4, ffn=128, max_target_positions=64)
    sd = {f"decoder.{k}": v for k, v in tdec.state_dict().items()}
    params = wd.convert_torch_state_dict(sd, cfg, jnp.float32)

    B, S = 2, 7
    rng = np.random.default_rng(0)
    enc = rng.standard_normal((B, 16, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (B, S))

    with torch.no_grad():
        out = tdec(input_ids=torch.from_numpy(tokens),
                   encoder_hidden_states=torch.from_numpy(enc))
        # HF decoder returns hidden states; project with tied embeddings
        ref_logits = (out.last_hidden_state @ tdec.embed_tokens.weight.T).numpy()

    cross_kv = wd.precompute_cross_kv(params, cfg, jnp.asarray(enc))
    H, hd = cfg.num_heads, cfg.d_model // cfg.num_heads
    caches = [(jnp.zeros((B, H, S, hd), jnp.float32),
               jnp.zeros((B, H, S, hd), jnp.float32))
              for _ in range(cfg.num_layers)]
    got = []
    for i in range(S):
        logits, caches = wd.decode_step(params, cfg,
                                        jnp.asarray(tokens[:, i], jnp.int32),
                                        jnp.int32(i), caches, cross_kv)
        got.append(np.asarray(logits))
    got = np.stack(got, axis=1)  # (B, S, V)

    np.testing.assert_allclose(got, ref_logits, rtol=2e-3, atol=2e-3)
