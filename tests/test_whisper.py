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


def test_greedy_decode_loop_parity_with_host_reference():
    """Pin the ENTIRE jitted greedy loop (prompt prime, KV positions,
    allow mask, no-repeat-ngram ban, EOT latching, n_valid) against an
    independent host-side reference: HF WhisperDecoder full-forward per
    step + a plain-numpy reimplementation of the masking rules. Random
    init, float32 both sides, so a decoding-loop bug is visible even
    without real weights (VERDICT r4 item 8)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp

    from livetalking_tpu.models import whisper_decoder as wd

    V, D, L, H, F = 1000, 64, 2, 4, 128
    EOT = 990
    hf_cfg = transformers.WhisperConfig(
        vocab_size=V, d_model=D, decoder_layers=L, decoder_attention_heads=H,
        decoder_ffn_dim=F, encoder_layers=L, encoder_attention_heads=H,
        encoder_ffn_dim=F, num_mel_bins=80, max_target_positions=64,
        max_source_positions=32, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1,
    )
    torch.manual_seed(1)
    tdec = transformers.models.whisper.modeling_whisper.WhisperDecoder(hf_cfg).eval()

    cfg = wd.WhisperDecoderConfig(vocab_size=V, d_model=D, num_layers=L,
                                  num_heads=H, ffn=F, max_target_positions=64,
                                  sot=991, eot=EOT)
    sd = {f"decoder.{k}": v for k, v in tdec.state_dict().items()}
    params = wd.convert_torch_state_dict(sd, cfg, jnp.float32)

    B, MAX_NEW, NG = 2, 20, 3
    rng = np.random.default_rng(7)
    enc = rng.standard_normal((B, 16, D)).astype(np.float32)
    prompt = rng.integers(0, V, (B, 4)).astype(np.int32)

    # --- device path: the jitted while_loop greedy decoder ---
    decode = wd.make_greedy_decode(params, cfg, max_new=MAX_NEW,
                                   dtype=jnp.float32, no_repeat_ngram=NG)
    got_out, got_nv = decode(jnp.asarray(enc), jnp.asarray(prompt))
    got_out, got_nv = np.asarray(got_out), np.asarray(got_nv)

    # --- host reference: HF full forward each step + numpy masking ---
    def hf_logits(tokens_2d):
        with torch.no_grad():
            out = tdec(input_ids=torch.from_numpy(tokens_2d),
                       encoder_hidden_states=torch.from_numpy(enc))
            return (out.last_hidden_state[:, -1]
                    @ tdec.embed_tokens.weight.T).numpy()

    seq = prompt.copy()
    gen = [[] for _ in range(B)]
    done = [False] * B
    ref_out = np.full((B, MAX_NEW), EOT, np.int64)
    for step in range(MAX_NEW):
        if all(done):
            break
        logits = hf_logits(seq).astype(np.float64)
        logits[:, EOT + 1:] = -np.inf  # allow text tokens + EOT only
        for b in range(B):
            if step >= NG - 1:
                last = tuple(gen[b][-(NG - 1):])
                for j in range(len(gen[b]) - (NG - 1)):
                    if tuple(gen[b][j:j + NG - 1]) == last:
                        t = gen[b][j + NG - 1]
                        if t != EOT:
                            logits[b, t] = -np.inf
        tok = logits.argmax(axis=-1)
        for b in range(B):
            if done[b]:
                tok[b] = EOT
            ref_out[b, step] = tok[b]
            gen[b].append(int(tok[b]))
            if tok[b] == EOT:
                done[b] = True
        seq = np.concatenate([seq, tok[:, None].astype(np.int32)], axis=1)

    np.testing.assert_array_equal(got_out, ref_out)
    np.testing.assert_array_equal(got_nv, (ref_out != EOT).sum(axis=-1))
