"""CLI: `mmvae train|eval|sample|bench` (SURVEY.md C19, layer L7).

Examples:
    mmvae train --config seq_vae --set train.steps=2000 --set optim.lr=3e-4
    mmvae eval --config seq_vae --ckpt /tmp/ck
    mmvae sample --config conv_vae --ckpt /tmp/ck --out samples.png
    mmvae bench --config seq_vae --steps 200
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--config", required=True, help="named config (BASELINE configs)")
    p.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="dotted config override, e.g. --set optim.lr=1e-4",
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="mmvae", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a model config")
    _add_common(p_train)
    p_train.add_argument("--steps", type=int, default=None, help="override step count")

    p_sample = sub.add_parser("sample", help="generate frames from a checkpoint")
    _add_common(p_sample)
    p_sample.add_argument("--ckpt", required=True, help="checkpoint directory")
    p_sample.add_argument("--out", default="samples.png")
    p_sample.add_argument("--mode", choices=["prior", "reconstruct", "rollout"], default="prior")
    p_sample.add_argument("--batch", type=int, default=8)
    p_sample.add_argument("--seed", type=int, default=0)
    p_sample.add_argument(
        "--ema", action="store_true",
        help="use the checkpoint's EMA params (optim.ema_decay runs); on a "
        "pre-EMA checkpoint this equals the raw params",
    )
    p_sample.add_argument(
        "--allow-init", action="store_true",
        help="sample from INIT params when --ckpt holds no checkpoint "
        "(default: a missing/typo'd checkpoint is an error, exit 2)",
    )

    p_eval = sub.add_parser(
        "eval", help="held-out-split ELBO from a checkpoint (one JSON line)"
    )
    _add_common(p_eval)
    p_eval.add_argument("--ckpt", required=True, help="checkpoint directory")
    p_eval.add_argument(
        "--batches", type=int, default=None,
        help="max val batches (default: the whole split once)",
    )
    p_eval.add_argument("--seed", type=int, default=1)
    p_eval.add_argument(
        "--ema", action="store_true",
        help="score the checkpoint's EMA params instead of the live ones",
    )

    p_bench = sub.add_parser("bench", help="measure training frames/sec")
    _add_common(p_bench)
    p_bench.add_argument("--steps", type=int, default=200)
    p_bench.add_argument("--warmup", type=int, default=20)
    p_bench.add_argument(
        "--profile", default=None, metavar="DIR",
        help="dump a jax.profiler trace of 20 steps to DIR (TensorBoard Profile tab)",
    )

    args = parser.parse_args(argv)

    # Persistent XLA compilation cache: the fully-unrolled seq/hier train
    # graphs cost minutes of cold compile per PROCESS without it (JAX's
    # in-memory cache dies with the process).
    from mmvae_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from mmvae_tpu.configs import get_config

    cfg = get_config(args.config, tuple(args.set))

    if args.cmd == "train":
        from mmvae_tpu.train.loop import fit

        if args.steps is not None:
            cfg.train.steps = args.steps
        fit(cfg)
        return 0

    if args.cmd == "sample":
        return _sample(cfg, args)

    if args.cmd == "eval":
        from mmvae_tpu.train.loop import evaluate

        try:
            result = evaluate(
                cfg, args.ckpt, max_batches=args.batches, seed=args.seed,
                use_ema=args.ema,
            )
        except FileNotFoundError as e:
            # A typo'd --ckpt must fail loudly, not score init params and
            # exit 0 with a plausible JSON line (scripted use would trust it).
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(json.dumps(result))
        return 0

    if args.cmd == "bench":
        from mmvae_tpu.bench.throughput import run_benchmark

        result = run_benchmark(
            cfg, steps=args.steps, warmup=args.warmup, profile_dir=args.profile
        )
        print(json.dumps(result))
        return 0

    return 1


def _sample(cfg, args) -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmvae_tpu.data.loader import load_or_generate
    from mmvae_tpu.data.transforms import normalize
    from mmvae_tpu.sample import generate as gen
    from mmvae_tpu.train import checkpoint as ckpt
    from mmvae_tpu.train.loop import build_model, _sample_shape
    from mmvae_tpu.train.state import create_train_state

    if ckpt.latest_step(args.ckpt) is None and not args.allow_init:
        # Mirror of the eval fix: a typo'd --ckpt must fail loudly, not emit
        # a plausible-looking sample grid from init params with exit 0
        # (scripted use would trust the file).  --allow-init opts back in.
        print(
            f"error: no checkpoint found in {args.ckpt!r} "
            "(pass --allow-init to sample from init params deliberately)",
            file=sys.stderr,
        )
        return 2
    model = build_model(cfg)
    optim_cfg = cfg.optim
    if getattr(args, "ema", False) and not optim_cfg.ema_decay:
        # The restore template must carry an ema_params subtree to pull the
        # EMA out of the checkpoint; the decay value itself is unused here.
        # A local copy, NOT a cfg mutation: the caller's config must stay
        # bit-identical (a later fit(cfg) in-process must not inherit EMA).
        optim_cfg = dataclasses.replace(optim_cfg, ema_decay=0.999)
    template = create_train_state(
        model, optim_cfg, jax.random.PRNGKey(0), _sample_shape(cfg)
    )
    state, step, _data_step = ckpt.restore_latest(args.ckpt, template)
    if step == 0:
        print(f"warning: no checkpoint found in {args.ckpt}; using init params",
              file=sys.stderr)
    if getattr(args, "ema", False) and state.ema_params is not None:
        state = state.replace(params=state.ema_params)
    rng = jax.random.PRNGKey(args.seed)

    if args.mode == "prior":
        frames = gen.prior_sample(
            model, state.params, rng, args.batch,
            seq_len=None if cfg.data.per_frame else cfg.data.seq_len,
        )
    else:
        ds = load_or_generate(
            cfg.data.path,
            num_sequences=max(args.batch, 4),
            seq_len=cfg.data.seq_len,
            seed=cfg.data.seed + 1,
            train_fraction=0.0,
            train=False,
        )
        clips = normalize(jnp.asarray(ds.data[: args.batch]))
        if args.mode == "reconstruct":
            x = clips[:, 0] if cfg.data.per_frame else clips
            frames = gen.reconstruct(model, state.params, x, rng)
        else:  # rollout
            ctx_len = getattr(model, "context_len", cfg.data.seq_len // 2)
            frames = gen.rollout(
                model, state.params, clips[:, :ctx_len],
                cfg.data.seq_len - ctx_len, rng,
            )

    if frames.ndim == 4 and args.out.endswith(".gif"):
        gen.save_gif(frames, args.out)
    else:
        gen.save_grid(frames, args.out)
    print(f"wrote {args.out} ({frames.shape})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
