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
    p.add_argument("--init", default="",
                   help=".pkl pytree for a weights-only warm start "
                        "(optimizer state and schedule restart at step 0; "
                        "use --resume for an exact continuation)")
    p.add_argument("--resume", default="",
                   help=".state.pkl full train state (params + optimizer "
                        "state + step) written next to --out; resumes the "
                        "run exactly where it left off")
    p.add_argument("--sync_init", default="",
                   help=".pkl with TRAINED SyncNet weights for the full "
                        "recipe's frozen sync expert (reference "
                        "training_utils.py:251-269 loads a pretrained "
                        "checkpoint). Without it the sync term is DISABLED "
                        "(weight 0) — a random expert would pull the "
                        "generator toward a random alignment. For "
                        "--sync_backend musetalk a torch .pt/.pth "
                        "checkpoint is converted on load")
    p.add_argument("--sync_backend", default="generic",
                   choices=["generic", "musetalk"],
                   help="musetalk (family musetalk only): the dedicated "
                        "LatentSync-style ResNet/attention expert on "
                        "16-frame clips (models/musetalk_syncnet.py)")
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
    use_mt_sync = args.family == "musetalk" and args.sync_backend == "musetalk"
    clip_len = (16 if use_mt_sync else 5) if full else 1
    if full and args.batch_size % clip_len:
        raise SystemExit(
            f"--recipe full samples {clip_len}-frame clips: --batch_size "
            f"must be a multiple of {clip_len} (got {args.batch_size}; try "
            f"{((args.batch_size + clip_len - 1) // clip_len) * clip_len})")
    sync_p = None
    # Frozen sync expert: only meaningful with TRAINED weights (the
    # reference loads a pretrained checkpoint and freezes it,
    # training_utils.py:251-269). Without --sync_init the sync weight is
    # zeroed so a random expert can't drag the generator.
    if full and args.sync_init:
        if use_mt_sync and args.sync_init.endswith((".pt", ".pth")):
            import torch

            from livetalking_tpu.models import musetalk_syncnet as msn

            sync_p = msn.convert_torch_state_dict(
                torch.load(args.sync_init, map_location="cpu",
                           weights_only=True))
        else:
            sync_p = load_pytree(args.sync_init)
    elif full:
        logger.warning(
            "full recipe without --sync_init: sync expert weight set to 0 "
            "(train a SyncNet first — train/syncnet_train.py — and pass "
            "its checkpoint to enable the sync loss)")

    if args.family == "wav2lip":
        from livetalking_tpu.models import syncnet, wav2lip as w2l, wav2lip_disc
        from livetalking_tpu.train import wav2lip_train as wt

        feats = td.mel_windows(audio)
        params = (load_pytree(args.init) if args.init
                  else jit_init(w2l.init_params, jax.random.PRNGKey(0),
                                jnp.float32))
        if full:
            tx_g, tx_d, raw = wt.make_full_train_step(
                gen_lr=args.lr, sync_wt=0.03 if sync_p is not None else 0.0)
            disc_p = jit_init(wav2lip_disc.init_params, jax.random.PRNGKey(1))
            if sync_p is None:  # placeholder pytree; sync_wt=0 ignores it
                sync_p = jit_init(syncnet.init_params, jax.random.PRNGKey(2))
            g_opt, d_opt = tx_g.init(params), tx_d.init(disc_p)

            def step(b):
                nonlocal params, disc_p, g_opt, d_opt
                params, disc_p, g_opt, d_opt, m = raw(
                    params, disc_p, sync_p, g_opt, d_opt, b)
                return m

            def snapshot():
                return {"params": params, "disc": disc_p,
                        "g_opt": g_opt, "d_opt": d_opt}

            def restore(s):
                nonlocal params, disc_p, g_opt, d_opt
                params, disc_p = s["params"], s["disc"]
                g_opt, d_opt = s["g_opt"], s["d_opt"]
        else:
            tx, raw = wt.make_train_step(args.lr)
            opt_state = tx.init(params)

            def step(b):
                nonlocal params, opt_state
                params, opt_state, loss = raw(params, opt_state, b)
                return {"loss": loss}

            def snapshot():
                return {"params": params, "opt_state": opt_state}

            def restore(s):
                nonlocal params, opt_state
                params, opt_state = s["params"], s["opt_state"]

        current = lambda: params  # noqa: E731

    elif args.family == "musetalk":
        from livetalking_tpu.avatars.musetalk_avatar import load_model
        from livetalking_tpu.train import musetalk_train as mt

        model = load_model(opt)
        feats = td.whisper_windows(audio, model["whisper_params"],
                                   model["whisper_cfg"])
        weights = (mt.LossWeights(sync=0.1 if sync_p is not None else 0.0,
                                  gan=0.05, mouth_gan=0.05)
                   if full else mt.LossWeights(perceptual=0.0))
        txs, raw = mt.make_train_step(model["unet_cfg"], weights, lr=args.lr,
                                      max_steps=args.steps,
                                      sync_backend=args.sync_backend)
        unet0 = load_pytree(args.init) if args.init else model["unet_params"]
        state = mt.init_train_state(jax.random.PRNGKey(1), model["unet_cfg"],
                                    txs, weights, unet_params=unet0)
        vae_p = model["vae_params"]

        def step(b):
            nonlocal state
            state, m = raw(state, vae_p, sync_p, b)
            return m

        def snapshot():
            return {"state": state._asdict()}

        def restore(s):
            nonlocal state
            state = mt.TrainState(**s["state"])

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
            tx, raw = ut.make_full_train_step(
                lr=args.lr, sync_wt=0.3 if sync_p is not None else 0.0)
            if sync_p is None:  # placeholder pytree; sync_wt=0 ignores it
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

        def snapshot():
            return {"params": params, "opt_state": opt_state}

        def restore(s):
            nonlocal params, opt_state
            params, opt_state = s["params"], s["opt_state"]

        current = lambda: params  # noqa: E731

    mesh = None
    if args.mesh:
        from livetalking_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(args.mesh)
        logger.info("training over mesh %s", dict(mesh.shape))

    start = 0
    if args.resume:  # exact continuation: params + optimizer state + step
        st = load_pytree(args.resume)
        restore(st["snap"])
        start = int(st["step"])
        logger.info("resumed full train state from %s at step %d",
                    args.resume, start)

    def save_all(i):
        save_pytree(args.out, current())  # serving-loadable weights
        save_pytree(args.out + ".state",
                    {"step": i, "snap": snapshot()})  # exact-resume state

    it = td.clip_batches(args.family, faces, np.asarray(feats),
                         args.batch_size, rng, clip_len=clip_len,
                         audio=audio if full else None)
    t0 = time.time()
    metrics: Dict[str, Any] = {}
    for i in range(start, args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        metrics = {k: float(v) for k, v in step(batch).items()}
        if args.log_every and (i % args.log_every == 0 or i == args.steps - 1):
            rate = (i + 1 - start) / (time.time() - t0)
            logger.info("train[%s] step %d/%d %s (%.2f steps/s)",
                        args.family, i + 1, args.steps,
                        " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                        rate)
        if args.out and args.save_every and (i + 1) % args.save_every == 0:
            save_all(i + 1)
    if args.out:
        save_all(args.steps)
        logger.info("saved checkpoint to %s (+ .state for --resume)",
                    args.out)
    return metrics


if __name__ == "__main__":
    main()
