"""Training CLI (train/cli.py): synthetic end-to-end smoke + resume."""

import os

import numpy as np

from livetalking_tpu.train import cli


def test_cli_ultralight_synthetic_and_resume(tmp_path):
    out = str(tmp_path / "ul.pkl")
    metrics = cli.main([
        "--family", "ultralight", "--synthetic", "8", "--size", "tiny",
        "--steps", "2", "--batch_size", "2", "--out", out,
        "--log_every", "1",
    ])
    assert np.isfinite(metrics["loss"])
    assert os.path.exists(out)
    # resume from the checkpoint
    metrics2 = cli.main([
        "--family", "ultralight", "--synthetic", "8", "--size", "tiny",
        "--steps", "1", "--batch_size", "2", "--init", out,
    ])
    assert np.isfinite(metrics2["loss"])
