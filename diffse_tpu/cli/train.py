"""Score-model training CLI.

Mirrors the reference's three-tier dynamic argparse assembly (train.py:16-73):
a throwaway base parser reads --backbone/--sde/--modeltype/--snr_conditioned/
--fixed_snr early; the selected classes then contribute their own flags; the
grouped args are splatted into the constructors. Flag names and defaults match
the reference; Lightning's Trainer flags are replaced by --max_epochs /
--ckpt_dir / --resume / --seed / --no_mesh.

Usage (README.md:34 analog):
    python train.py --modeltype sebridge_v3 --snr_conditioned true \
        --fixed_snr 0.17783 --transform_type exponent --sigma-max 1.0 \
        --base_dir /data/VBD_SNR-5
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from argparse import ArgumentParser


def get_argparse_groups(parser, args):
    groups = {}
    for group in parser._action_groups:
        group_dict = {a.dest: getattr(args, a.dest, None) for a in group._group_actions}
        groups[group.title] = argparse.Namespace(**group_dict)
    return groups


def build_parsers():
    from ..models import BackboneRegistry
    from ..sde import SDERegistry

    base_parser = ArgumentParser(add_help=False)
    parser = ArgumentParser(description=__doc__)
    for parser_ in (base_parser, parser):
        parser_.add_argument("--backbone", type=str,
                             choices=BackboneRegistry.get_all_names(), default="ncsnpp")
        parser_.add_argument("--sde", type=str,
                             choices=SDERegistry.get_all_names(), default="ouve")
        parser_.add_argument("--nolog", action="store_true",
                             help="Turn off logging (for development purposes)")
        parser_.add_argument("--modeltype", type=str,
                             choices=["bbed", "sebridge", "sebridge_v2", "sebridge_v3"],
                             default="bbed")
        parser_.add_argument("--snr_conditioned", type=str,
                             choices=["false", "true", "fixed"], default="false")
        parser_.add_argument("--fixed_snr", type=float, default=1.0)
    return base_parser, parser


def add_score_model_args(group):
    """ScoreModel flags (model.py:33-41)."""
    group.add_argument("--lr", type=float, default=1e-4)
    group.add_argument("--ema_decay", type=float, default=0.999)
    group.add_argument("--t_eps", type=float, default=0.03)
    group.add_argument("--num_eval_files", type=int, default=10)
    group.add_argument("--loss_type", type=str, default="mse")
    group.add_argument("--loss_abs_exponent", type=float, default=0.5)
    return group


def add_data_module_args(group):
    """SpecsDataModule flags (data_module.py:180-194)."""
    group.add_argument("--base_dir", type=str, required=True)
    group.add_argument("--format", type=str, choices=("default",), default="default")
    group.add_argument("--batch_size", type=int, default=4)
    group.add_argument("--n_fft", type=int, default=510)
    group.add_argument("--hop_length", type=int, default=128)
    group.add_argument("--num_frames", type=int, default=256)
    group.add_argument("--window", type=str, choices=("sqrthann", "hann"), default="hann")
    group.add_argument("--num_workers", type=int, default=4)
    group.add_argument("--dummy", action="store_true")
    group.add_argument("--spec_factor", type=float, default=0.15)
    group.add_argument("--spec_abs_exponent", type=float, default=0.5)
    group.add_argument("--normalize", type=str, choices=("clean", "noisy", "not"),
                       default="noisy")
    group.add_argument("--transform_type", type=str, choices=("exponent", "log", "none"),
                       default="exponent")
    return group


def add_trainer_args(group):
    group.add_argument("--max_epochs", type=int, default=1000)
    group.add_argument("--max_steps_per_epoch", type=int, default=None)
    group.add_argument("--ckpt_dir", type=str, default=None,
                       help="Checkpoint directory (default ./savedir/<experiment>)")
    group.add_argument("--resume", action="store_true",
                       help="Resume from the latest checkpoint in ckpt_dir")
    group.add_argument("--seed", type=int, default=0)
    group.add_argument("--no_mesh", action="store_true",
                       help="Disable data-parallel mesh (single device)")
    group.add_argument("--tp_size", type=int, default=1,
                       help="Tensor-parallel degree: >1 trains over a 2-D "
                            "(data, model) mesh with kernels sharded on "
                            "out-features (parallel/model_sharding.py)")
    group.add_argument("--wandb", action="store_true")
    group.add_argument("--snr_ckpt", type=str, default=None,
                       help="SNR-estimator checkpoint dir (for snr_conditioned=true eval)")
    group.add_argument("--eval_batch_size", type=int, default=1,
                       help="Per-epoch validation enhances files in bucketed "
                            "batches of this size (1 = one at a time; "
                            "semantics identical, throughput only)")
    group.add_argument("--accum_steps", type=int, default=1,
                       help="Gradient accumulation: average grads over this "
                            "many consecutive loader batches per optimizer "
                            "step (effective batch = accum_steps*batch_size "
                            "in one batch's HBM footprint)")
    group.add_argument("--chain_steps", type=int, default=1,
                       help="Fuse this many consecutive optimizer updates "
                            "into ONE dispatched XLA program (lax.scan over "
                            "the train state) — amortizes per-dispatch "
                            "latency when it dominates step compute (remote/"
                            "bridged accelerators); training semantics "
                            "unchanged")
    group.add_argument("--eval_every_n_epochs", type=int, default=1,
                       help="Validate/checkpoint every k-th epoch (always "
                            "the last) — Lightning's check_val_every_n_epoch "
                            "analog; epochs over small datasets are seconds "
                            "of compute while each save fetches full state")
    return group


def main(argv=None):
    from ..models import BackboneRegistry
    from ..sde import SDERegistry

    base_parser, parser = build_parsers()
    temp_args, _ = base_parser.parse_known_args(argv)

    backbone_cls = BackboneRegistry.get_by_name(temp_args.backbone)
    sde_class = SDERegistry.get_by_name(temp_args.sde)

    add_score_model_args(parser.add_argument_group("ScoreModel"))
    sde_class.add_argparse_args(parser.add_argument_group("SDE"))
    backbone_cls.add_argparse_args(parser.add_argument_group("Backbone"))
    add_data_module_args(parser.add_argument_group("DataModule"))
    add_trainer_args(parser.add_argument_group("Trainer"))

    args = parser.parse_args(argv)
    groups = get_argparse_groups(parser, args)

    sigma_max = getattr(args, "sigma_max", 0.5)
    transform_type = args.transform_type

    from ..data.dataset import DataModuleConfig, SpecsDataModule
    from ..models.score_model import ScoreModel, ScoreModelConfig
    from ..train.logging import MetricsLogger
    from ..train.loop import train_score_model

    cfg = ScoreModelConfig(
        backbone=args.backbone,
        sde=args.sde,
        model_type=args.modeltype,
        snr_conditioned=args.snr_conditioned,
        fixed_snr=args.fixed_snr,
        lr=args.lr,
        ema_decay=args.ema_decay,
        t_eps=args.t_eps,
        loss_type=args.loss_type,
        loss_abs_exponent=args.loss_abs_exponent,
        num_eval_files=args.num_eval_files,
        sigma_max=sigma_max if sigma_max is not None else 0.5,
        n_fft=args.n_fft,
        hop_length=args.hop_length,
        num_frames=args.num_frames,
        window=args.window,
        spec_factor=args.spec_factor,
        spec_abs_exponent=args.spec_abs_exponent,
        transform_type=transform_type,
        normalize=args.normalize,
    )
    sde_kwargs = {k: v for k, v in vars(groups["SDE"]).items() if v is not None}
    backbone_kwargs = {
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in vars(groups["Backbone"]).items()
        if v is not None
    }

    snr_model = None
    if args.snr_conditioned == "true" and args.snr_ckpt:
        from ..train.restore import load_snr_model
        from ..train.state import eval_variables

        snr_m, snr_state = load_snr_model(args.snr_ckpt)
        snr_model = (snr_m.dnn, eval_variables(snr_state))

    model = ScoreModel(cfg, backbone_kwargs=backbone_kwargs, sde_kwargs=sde_kwargs,
                       snr_model=snr_model)
    dm = SpecsDataModule(DataModuleConfig(
        base_dir=args.base_dir, format=args.format, batch_size=args.batch_size,
        n_fft=args.n_fft, hop_length=args.hop_length, num_frames=args.num_frames,
        window=args.window, num_workers=args.num_workers, dummy=args.dummy,
        spec_factor=args.spec_factor, spec_abs_exponent=args.spec_abs_exponent,
        normalize=args.normalize, transform_type=transform_type,
        fixed_snr=args.fixed_snr,
    ))

    # Experiment naming (train.py:75-78)
    if args.snr_conditioned in ("fixed", "true"):
        experiment_name = f"{args.modeltype}_{args.snr_conditioned}{args.fixed_snr}_{sigma_max}"
    else:
        experiment_name = f"{args.modeltype}_{args.snr_conditioned}_{sigma_max}_{transform_type}"
    ckpt_dir = args.ckpt_dir or os.path.join("savedir", experiment_name)

    logger = MetricsLogger(
        log_dir=None if args.nolog else ckpt_dir,
        use_wandb=args.wandb and not args.nolog,
        run_name=experiment_name,
        config=model.hparams,
    )
    train_score_model(
        model, dm,
        max_epochs=args.max_epochs,
        ckpt_dir=None if args.nolog else ckpt_dir,
        logger=logger,
        seed=args.seed,
        use_mesh=not args.no_mesh,
        resume=args.resume,
        max_steps_per_epoch=args.max_steps_per_epoch,
        tp_size=args.tp_size,
        eval_batch_size=args.eval_batch_size,
        accum_steps=args.accum_steps,
        chain_steps=args.chain_steps,
        eval_every_n_epochs=args.eval_every_n_epochs,
    )


if __name__ == "__main__":
    main()
