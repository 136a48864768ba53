"""Command-line entry points.

One argparse CLI with subcommands replacing the reference's docopt scripts
(stage mapping of ``bin/run_pre.sh:12-47`` + train/infer/syn drivers):

    subset      <- mksubset_2019.py
    preprocess  <- preprocess_2019.py
    cmvn        <- compute_mean_var.py
    normalize   <- normalize.py
    train       <- vqwae_train.py
    infer       <- inference_2019.py   (ABX representation export)
    synthesize  <- synthesis.py        (voice conversion)

Config handling everywhere: ``--preset`` (bundled name or JSON path) +
``--hparams "k=v,..."`` overrides, resolved config frozen into the
checkpoint dir.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from wavenet_autoencoders_tpu.config import Config, load_preset


def _cfg_from(args) -> Config:
    if args.preset:
        cfg = load_preset(args.preset, args.hparams or "")
    else:
        cfg = Config().parse(args.hparams or "")
    return cfg


def _add_cfg_args(p):
    p.add_argument("--preset", help="bundled preset name or JSON path")
    p.add_argument("--hparams", default="", help='overrides: "k=v,k2=[..]"')


def main(argv=None):
    ap = argparse.ArgumentParser(prog="wae-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("subset", help="scan ZS2019 layout, write scp jsons + speaker map")
    p.add_argument("language")
    p.add_argument("in_dir")
    p.add_argument("out_dir")
    p.add_argument("scp_dir")

    p = sub.add_parser("preprocess", help="extract wave/mel/mfcc npys per utterance")
    _add_cfg_args(p)
    p.add_argument("scp")
    p.add_argument("out_dir")
    p.add_argument("sp2ind")
    p.add_argument("--num-workers", type=int, default=None)

    p = sub.add_parser("cmvn", help="fit mean/var stats over dumped features")
    p.add_argument("feat")
    p.add_argument("scaler_out")
    p.add_argument("scps", nargs="+")

    p = sub.add_parser("normalize", help="apply (or invert) CMVN -> <feat>.norm.npy")
    p.add_argument("scp")
    p.add_argument("feat")
    p.add_argument("scaler")
    p.add_argument("--inverse", action="store_true")

    p = sub.add_parser("train", help="train a model")
    _add_cfg_args(p)
    p.add_argument("dump_root")
    p.add_argument("checkpoint_dir")
    p.add_argument("--dev-dump-root", default=None)
    p.add_argument("--checkpoint", default=None, help="resume checkpoint")
    p.add_argument("--restore-parts", default=None)
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--feat-type", default="mfcc")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--coordinator", default=None, help="host:port for multi-host DCN init")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)

    p = sub.add_parser("infer", help="export ABX representations")
    _add_cfg_args(p)
    p.add_argument("checkpoint")
    p.add_argument("scp")
    p.add_argument("dst_dir")
    p.add_argument("--feat", default="mfcc.norm")
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction, default="auto",
                   help="load the *_ema checkpoint sibling (reference eval "
                        "behavior); --no-use-ema evaluates the raw weights")
    p.add_argument("--lan", default=None, help="submission language dir (else inferred from dump paths)")
    p.add_argument("--pre-vq", action="store_true",
                   help="export the continuous pre-quantization latent "
                        "(VQ models only; diagnostic, skips bitrate.json)")

    p = sub.add_parser("synthesize", help="voice-conversion synthesis")
    _add_cfg_args(p)
    p.add_argument("checkpoint")
    p.add_argument("dump_root")
    p.add_argument("dst_dir")
    p.add_argument("syn_list")
    p.add_argument("speaker2ind")
    p.add_argument("lan")
    p.add_argument("--start-ind", type=int, default=0)
    p.add_argument("--tar-utt-map", default=None, help="json: speaker -> mfcc.norm.npy for AdaIN (default: auto from train dump)")
    p.add_argument("--train-dump-root", default=None, help="train_no_dev dump dir for auto tar_c selection")
    p.add_argument("--batch", type=int, default=1, help="utterances decoded in parallel")
    p.add_argument("--pad-frames-multiple", type=int, default=0,
                   help="bucket conditioning lengths to a multiple of N frames "
                        "(edge-replicated, cropped back) so utterances share "
                        "compiled decode programs; 0 = exact lengths")
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction, default="auto",
                   help="load the *_ema checkpoint sibling; --no-use-ema uses raw weights")

    p = sub.add_parser(
        "validate",
        help="sanity-check a ZeroSpeech-2019 submission tree (offline "
        "stand-in for zerospeech2020-validate)",
    )
    p.add_argument("submission_dir")
    p.add_argument("--lan", default="english")

    args = ap.parse_args(argv)

    if args.cmd == "subset":
        from wavenet_autoencoders_tpu.data.subset import make_subset

        make_subset(args.language, args.in_dir, args.out_dir, args.scp_dir)

    elif args.cmd == "preprocess":
        from wavenet_autoencoders_tpu.data.preprocess import preprocess

        cfg = _cfg_from(args)
        print(f"Sampling frequency: {cfg.sample_rate}")
        preprocess(cfg, args.scp, args.out_dir, args.sp2ind, num_workers=args.num_workers)

    elif args.cmd == "cmvn":
        from wavenet_autoencoders_tpu.data.normalize import compute_mean_var

        compute_mean_var(args.scps, args.feat, args.scaler_out)

    elif args.cmd == "normalize":
        from wavenet_autoencoders_tpu.data.normalize import apply_normalization

        apply_normalization(args.scp, args.feat, args.scaler, inverse=args.inverse)

    elif args.cmd == "train":
        # multi-host (DCN): no-op single-process; >1 process when the
        # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
        # vars (or --coordinator/--num-processes/--process-id) are set
        from wavenet_autoencoders_tpu.parallel.distributed import (
            initialize_distributed,
        )
        from wavenet_autoencoders_tpu.train.loop import train

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        cfg = _cfg_from(args)
        train(
            cfg,
            args.dump_root,
            args.checkpoint_dir,
            resume=args.checkpoint,
            restore_parts_from=args.restore_parts,
            reset_optimizer=args.reset_optimizer,
            feat_type=args.feat_type,
            max_steps=args.max_steps,
            dev_dump_root=args.dev_dump_root,
        )

    elif args.cmd == "validate":
        from wavenet_autoencoders_tpu.eval.validate import validate_submission

        summary = validate_submission(args.submission_dir, lan=args.lan)
        print(f"submission OK: {summary}")

    elif args.cmd == "infer":
        cfg = _cfg_from(args)
        model, params, state = _load_model(cfg, args.checkpoint, use_ema=args.use_ema)
        from wavenet_autoencoders_tpu.eval.infer import export_representations

        export_representations(
            cfg, model, params, state, args.scp, args.dst_dir, feat=args.feat,
            lan=args.lan, pre_vq=args.pre_vq,
        )

    elif args.cmd == "synthesize":
        cfg = _cfg_from(args)
        model, params, state = _load_model(cfg, args.checkpoint, use_ema=args.use_ema)
        from wavenet_autoencoders_tpu.eval.synthesize import run_synthesis_list

        tar_map = json.load(open(args.tar_utt_map)) if args.tar_utt_map else None
        run_synthesis_list(
            cfg,
            model,
            params,
            state,
            args.dump_root,
            args.syn_list,
            args.speaker2ind,
            args.dst_dir,
            lan=args.lan,
            start_ind=args.start_ind,
            tar_utt_map=tar_map,
            batch=args.batch,
            train_dump_root=args.train_dump_root,
            pad_multiple=args.pad_frames_multiple,
        )


def _load_model(cfg: Config, checkpoint: str, use_ema: bool | str = "auto"):
    """Build the model from cfg and load weights from an npz checkpoint.

    ``use_ema=True`` prefers the *_ema sibling like the reference's EMA
    eval (``inference_2019.py:313-318``). ``"auto"`` (default) only does so
    once the shadow has warmed (checkpoint step >= 5/(1-ema_decay)) — a
    young 0.9999 shadow is mostly random init and silently poisons every
    downstream metric (the round-4 stale-EMA bug)."""
    import jax

    from wavenet_autoencoders_tpu.models.zoo import build_model
    from wavenet_autoencoders_tpu.train.checkpoint import _load_prefixed

    import numpy as np

    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(cfg.seed))
    path = checkpoint
    if use_ema == "auto":
        try:
            step = int(np.load(checkpoint)["step"])
        except (KeyError, FileNotFoundError):
            step = 0
        from wavenet_autoencoders_tpu.train.step import ema_warm_steps

        use_ema = step >= ema_warm_steps(cfg.ema_decay)
        if not use_ema:
            print(
                f"ema shadow not warm at step {step} "
                f"(< {ema_warm_steps(cfg.ema_decay)}); evaluating live params"
            )
    if use_ema:
        ema_path = str(checkpoint).replace(".npz", "_ema.npz")
        if Path(ema_path).exists() and not str(checkpoint).endswith("_ema.npz"):
            path = ema_path
    z = np.load(path)
    params = _load_prefixed(params, z, "params")
    try:
        state = _load_prefixed(state, z, "model_state")
    except KeyError:
        pass
    print(f"loaded checkpoint {path}")
    return model, params, state


if __name__ == "__main__":
    main()
