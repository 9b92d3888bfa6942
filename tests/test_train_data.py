"""Training-data pipeline (train/data.py): offline feature windows match
the runtime extractor conventions; per-family batch assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livetalking_tpu.train import data as td


def _audio(seconds=1.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(16000 * seconds)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.randn(t.shape[0])).astype(np.float32)


def test_mel_windows_shape_and_alignment():
    wins = td.mel_windows(_audio(1.0))
    assert wins.shape == (25, 80, 16)
    assert np.isfinite(wins).all()
    # consecutive windows overlap: frame stride is 80/25 = 3.2 mel cols
    assert not np.array_equal(wins[0], wins[1])
    np.testing.assert_allclose(wins[0][:, 3:], wins[1][:, :13], atol=1e-5)


def test_whisper_windows_tiny_cfg():
    from livetalking_tpu.models import whisper_encoder as we

    cfg = we.WhisperConfig(d_model=32, num_layers=1, num_heads=2, ffn=64)
    params = we.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    wins = td.whisper_windows(_audio(0.4), params, cfg)
    F = 10  # 0.4 s * 25 fps
    assert wins.shape == (F, 10 * (cfg.num_layers + 1), cfg.d_model)
    assert np.isfinite(wins).all()


def test_hubert_windows_tiny_cfg():
    from livetalking_tpu.models import hubert as hub

    cfg = hub.HubertConfig(
        conv_dim=(32, 32), conv_kernel=(10, 4), conv_stride=(5, 4),
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=2)
    params = hub.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    wins = td.hubert_windows(_audio(0.4), params, cfg)
    assert wins.shape == (10, 4, 4, 16)  # planes are sqrt(hidden)=4
    assert np.isfinite(wins).all()


@pytest.mark.parametrize("family,feat_shape", [
    ("wav2lip", (30, 80, 16)),
    ("musetalk", (30, 50, 384)),
    ("ultralight", (30, 32, 32, 16)),
])
def test_batch_assembly(family, feat_shape):
    rng = np.random.RandomState(0)
    S = 256 if family != "ultralight" else 160
    faces = rng.randint(0, 255, (30, S, S, 3), dtype=np.uint8)
    feats = rng.randn(*feat_shape).astype(np.float32)
    it = td.clip_batches(family, faces, feats, batch_size=4, rng=rng)
    b = next(it)
    if family == "wav2lip":
        assert b["mel"].shape == (4, 80, 16, 1)
        assert b["face"].shape == (4, S, S, 6)
        # masked target channels: lower half zeroed
        assert np.all(b["face"][:, S // 2:, :, :3] == 0.0)
        assert b["target"].shape == (4, S, S, 3)
    elif family == "musetalk":
        assert b["gt"].shape == (4, S, S, 3)
        assert b["gt"].min() >= -1.0 and b["gt"].max() <= 1.0
        assert b["audio"].shape == (4, 50, 384)
    else:
        assert b["face"].shape == (4, S, S, 6)
        # masked channels 3:6: interior rectangle zeroed, border kept
        assert np.all(b["face"][:, 5:150, 5:145, 3:] == 0.0)
        assert np.any(b["face"][:, :5, :, 3:] != 0.0)


def test_clip_batches_consecutive_and_sync_mel():
    rng = np.random.RandomState(1)
    faces = rng.randint(0, 255, (40, 64, 64, 3), dtype=np.uint8)
    feats = rng.randn(40, 80, 16).astype(np.float32)
    it = td.clip_batches("wav2lip", faces, feats, batch_size=10, rng=rng,
                         clip_len=5, audio=_audio(40 / 25.0))
    b = next(it)
    assert b["sync_mel"].shape == (2, 80, 16, 1)
    assert b["face"].shape == (10, 64, 64, 6)


def test_load_faces_roundtrip(tmp_path):
    import cv2

    for fam, sub, size in [("wav2lip", "face_imgs", 256),
                           ("ultralight", "face_imgs", 168)]:
        d = tmp_path / fam / sub
        d.mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(d / f"{i}.png"),
                        np.full((size, size, 3), i * 10, np.uint8))
        faces = td.load_faces(str(tmp_path / fam), fam)
        want = 160 if fam == "ultralight" else 256
        assert faces.shape == (3, want, want, 3)
        assert faces[1].flatten()[0] == 10
