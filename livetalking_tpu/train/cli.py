"""Training CLI: drive any family's recipe end-to-end from the shell.

    python -m livetalking_tpu.train --family musetalk \
        --avatar_dir data/avatars/my_avatar --wav clip.wav \
        --steps 2000 --batch_size 8 --recipe full --out unet.pkl

Ties together the per-family recipes (train/*_train.py), the data
pipeline (train/data.py) and the shared model loaders (the avatars'
``load_model`` functions, which convert torch checkpoints under
``--models_dir`` and fall back to random init — the repo-wide
zero-checkpoint convention). ``--synthetic N`` trains on N random frames
with synthetic audio so the whole loop runs with no data at all (smoke
tests, compile-cache priming, dry runs).

Multi-chip: pass ``--mesh dp4,tp2``-style specs; params/batches are
placed with parallel/mesh.py and the jitted steps run SPMD — XLA inserts
the gradient psums over ICI (same mechanism as the dryrun entry).
"""

from __future__ import annotations

import argparse
import time
from types import SimpleNamespace
from typing import Any, Dict

import numpy as np

from livetalking_tpu.utils.logger import logger


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser("livetalking_tpu.train")
    p.add_argument("--family", required=True,
                   choices=["wav2lip", "musetalk", "ultralight"])
    p.add_argument("--avatar_dir", default="",
                   help="avatar directory (genavatar format)")
    p.add_argument("--wav", default="", help="16 kHz training utterance")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic frames instead of real data")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--recipe", default="l1", choices=["l1", "full"])
    p.add_argument("--init", default="", help=".pkl pytree to resume from")
    p.add_argument("--out", default="", help="checkpoint output path (.pkl)")
    p.add_argument("--models_dir", default="./models")
    p.add_argument("--size", default="full", choices=["full", "tiny"],
                   help="tiny shrinks the U-Net/feature nets (tests, smoke)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--mesh", default="", help="mesh spec, e.g. dp4,tp2")
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--save_every", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _load_audio(args, n_frames: int) -> np.ndarray:
    if args.wav:
        from livetalking_tpu.utils.audio import load_pcm16k

        return load_pcm16k(args.wav)
    t = np.arange(int(16000 * n_frames / 25.0)) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)


def _faces(args, family: str, rng) -> np.ndarray:
    from livetalking_tpu.train import data as td

    if args.synthetic:
        S = 160 if family == "ultralight" else 256
        return rng.randint(0, 255, (args.synthetic, S, S, 3), dtype=np.uint8)
    if not args.avatar_dir:
        raise SystemExit("need --avatar_dir or --synthetic N")
    return td.load_faces(args.avatar_dir, family)


def main(argv=None) -> Dict[str, Any]:
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.train import data as td
    from livetalking_tpu.utils.checkpoint import load_pytree, save_pytree
    from livetalking_tpu.utils.jaxinit import jit_init

    rng = np.random.RandomState(args.seed)
    opt = SimpleNamespace(models_dir=args.models_dir, dtype=args.dtype,
                          musetalk_size=args.size,
                          hubert_size="tiny" if args.size == "tiny" else "large")
    faces = _faces(args, args.family, rng)
    audio = _load_audio(args, faces.shape[0])
    full = args.recipe == "full"
    clip_len = 5 if full else 1
    sync_p = None

    if args.family == "wav2lip":
        from livetalking_tpu.models import syncnet, wav2lip as w2l, wav2lip_disc
        from livetalking_tpu.train import wav2lip_train as wt

        feats = td.mel_windows(audio)
        params = (load_pytree(args.init) if args.init
                  else jit_init(w2l.init_params, jax.random.PRNGKey(0),
                                jnp.float32))
        if full:
            tx_g, tx_d, raw = wt.make_full_train_step(gen_lr=args.lr)
            disc_p = jit_init(wav2lip_disc.init_params, jax.random.PRNGKey(1))
            sync_p = jit_init(syncnet.init_params, jax.random.PRNGKey(2))
            g_opt, d_opt = tx_g.init(params), tx_d.init(disc_p)

            def step(b):
                nonlocal params, disc_p, g_opt, d_opt
                params, disc_p, g_opt, d_opt, m = raw(
                    params, disc_p, sync_p, g_opt, d_opt, b)
                return m
        else:
            tx, raw = wt.make_train_step(args.lr)
            opt_state = tx.init(params)

            def step(b):
                nonlocal params, opt_state
                params, opt_state, loss = raw(params, opt_state, b)
                return {"loss": loss}

        current = lambda: params  # noqa: E731

    elif args.family == "musetalk":
        from livetalking_tpu.avatars.musetalk_avatar import load_model
        from livetalking_tpu.models import syncnet
        from livetalking_tpu.train import musetalk_train as mt

        model = load_model(opt)
        feats = td.whisper_windows(audio, model["whisper_params"],
                                   model["whisper_cfg"])
        weights = (mt.LossWeights(sync=0.1, gan=0.05, mouth_gan=0.05)
                   if full else mt.LossWeights(perceptual=0.0))
        txs, raw = mt.make_train_step(model["unet_cfg"], weights, lr=args.lr,
                                      max_steps=args.steps)
        unet0 = load_pytree(args.init) if args.init else model["unet_params"]
        state = mt.init_train_state(jax.random.PRNGKey(1), model["unet_cfg"],
                                    txs, weights, unet_params=unet0)
        if full:
            sync_p = jit_init(syncnet.init_params, jax.random.PRNGKey(2))
        vae_p = model["vae_params"]

        def step(b):
            nonlocal state
            state, m = raw(state, vae_p, sync_p, b)
            return m

        current = lambda: state.unet  # noqa: E731

    else:  # ultralight
        from livetalking_tpu.avatars.ultralight_avatar import load_model
        from livetalking_tpu.models import syncnet, ultralight
        from livetalking_tpu.train import ultralight_train as ut

        model = load_model(opt)
        feats = td.hubert_windows(audio, model["hubert_params"],
                                  model["hubert_cfg"])
        params = (load_pytree(args.init) if args.init
                  else jit_init(ultralight.init_params, jax.random.PRNGKey(0),
                                jnp.float32))
        if full:
            tx, raw = ut.make_full_train_step(lr=args.lr)
            sync_p = jit_init(syncnet.init_params, jax.random.PRNGKey(2),
                              160)
            opt_state = tx.init(params)

            def step(b):
                nonlocal params, opt_state
                params, opt_state, m = raw(params, sync_p, opt_state, b)
                return m
        else:
            tx, raw = ut.make_train_step(args.lr)
            opt_state = tx.init(params)

            def step(b):
                nonlocal params, opt_state
                params, opt_state, loss = raw(params, opt_state, b)
                return {"loss": loss}

        current = lambda: params  # noqa: E731

    mesh = None
    if args.mesh:
        from livetalking_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(args.mesh)
        logger.info("training over mesh %s", dict(mesh.shape))

    it = td.clip_batches(args.family, faces, np.asarray(feats),
                         args.batch_size, rng, clip_len=clip_len,
                         audio=audio if full else None)
    t0 = time.time()
    metrics: Dict[str, Any] = {}
    for i in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        metrics = {k: float(v) for k, v in step(batch).items()}
        if args.log_every and (i % args.log_every == 0 or i == args.steps - 1):
            rate = (i + 1) / (time.time() - t0)
            logger.info("train[%s] step %d/%d %s (%.2f steps/s)",
                        args.family, i + 1, args.steps,
                        " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                        rate)
        if args.out and args.save_every and (i + 1) % args.save_every == 0:
            save_pytree(args.out, current())
    if args.out:
        save_pytree(args.out, current())
        logger.info("saved checkpoint to %s", args.out)
    return metrics


if __name__ == "__main__":
    main()
