#!/usr/bin/env python
"""Export a trained checkpoint's enhance program as a deployable AOT artifact.

Serializes the fused normalize->STFT->sampler->iSTFT program (StableHLO via
jax.export) plus the EMA weights into a directory that runs with only
jax+numpy — no diffse_tpu model code (see diffse_tpu/serving/export.py).

Usage:
    python tools/export_artifact.py --ckpt savedir/<exp> --out artifact/ \
        --utt_seconds 8 [--branch bbed_pc] [--N 30] [--platforms tpu cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--branch", type=str, default=None,
                        help="enhance branch (default: from the checkpoint's "
                             "model_type/snr_conditioned, PC sampler for bbed)")
    parser.add_argument("--utt_seconds", type=float, nargs="+", default=[8.0],
                        help="utterance length(s) the artifact serves — one "
                             "exported program per distinct width bucket; "
                             "the loader picks the smallest that fits")
    parser.add_argument("--N", type=int, default=30)
    parser.add_argument("--predictor", type=str, default="reverse_diffusion")
    parser.add_argument("--corrector", type=str, default="ald")
    parser.add_argument("--corrector_steps", type=int, default=1)
    parser.add_argument("--platforms", type=str, nargs="+",
                        default=["tpu", "cpu"])
    parser.add_argument("--no_ema", action="store_true")
    args = parser.parse_args(argv)

    from diffse_tpu.serving.export import save_artifact
    from diffse_tpu.train.restore import load_score_model
    from diffse_tpu.train.state import eval_variables

    model, state = load_score_model(args.ckpt)
    variables = eval_variables(state, no_ema=args.no_ema)

    branch = args.branch
    if branch is None:
        cfg = model.cfg
        if cfg.snr_conditioned == "true":
            branch = f"{cfg.model_type}_snr"
        elif cfg.model_type == "bbed":
            branch = "bbed_pc"
        else:
            branch = cfg.model_type

    utt_samples = [int(s * 16000) for s in args.utt_seconds]
    meta = save_artifact(
        args.out, model, variables, branch, utt_samples,
        n_steps=args.N, predictor=args.predictor, corrector=args.corrector,
        corrector_steps=args.corrector_steps, platforms=tuple(args.platforms),
    )
    size = sum(
        os.path.getsize(os.path.join(args.out, f)) for f in os.listdir(args.out)
    )
    buckets = [b["pad_samples"] for b in meta["buckets"]]
    print(f"exported {branch} (buckets {buckets} samples, "
          f"platforms {meta['platforms']}) -> {args.out} "
          f"({size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
