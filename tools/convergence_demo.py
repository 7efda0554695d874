#!/usr/bin/env python
"""Convergence demonstration on synthetic data (CPU-friendly).

Trains a reduced NCSN++ score model on the in-repo synthetic dataset for a
few hundred steps and reports mixture-vs-enhanced quality (PESQ / SI-SDR /
ESTOI, all scored natively) before and after training — the only quality
evidence obtainable in an environment without VoiceBank-DEMAND or the
published checkpoints. Mirrors the reference's inline-validation quality
loop (sgmse/util/inference.py:85-318) end to end: data -> on-device STFT ->
loss -> Adam+EMA -> checkpoint -> branch-specific enhancement -> metrics.

Usage:
    JAX_PLATFORMS=cpu python tools/convergence_demo.py [--epochs 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--steps_per_epoch", type=int, default=40)
    parser.add_argument("--num_train", type=int, default=48)
    parser.add_argument("--work_dir", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import numpy as np

    from diffse_tpu.data.dataset import DataModuleConfig, SpecsDataModule
    from diffse_tpu.data.synthetic import make_synthetic_dataset
    from diffse_tpu.data.wavio import read_wav
    from diffse_tpu.evaluation.inference import evaluate_model
    from diffse_tpu.evaluation.metrics import estoi, pesq_wb, si_sdr
    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
    from diffse_tpu.train.loop import train_score_model
    from diffse_tpu.train.logging import MetricsLogger
    from diffse_tpu.train.state import eval_variables

    work = args.work_dir or tempfile.mkdtemp(prefix="convdemo_")
    data_root = os.path.join(work, "data")
    print(f"[demo] synthetic dataset -> {data_root}")
    make_synthetic_dataset(data_root, num_train=args.num_train, num_valid=6,
                           num_valid2=4, num_test=4, duration_s=1.2)

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5, num_frames=64,
        num_eval_files=0,
    )
    backbone = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1,
                    attn_resolutions=(64,), image_size=256)
    model = ScoreModel(
        cfg, backbone_kwargs=backbone,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    dm = SpecsDataModule(DataModuleConfig(
        base_dir=data_root, batch_size=4, num_frames=cfg.num_frames,
        num_workers=1, fixed_snr=cfg.fixed_snr,
    ))

    def quality(variables):
        return evaluate_model(model, variables, dm, num_eval_files=4,
                              model_type="bbed", key=jax.random.PRNGKey(9))

    def mixture_quality():
        dm.setup("fit")
        cl, no = dm.valid_set.clean_files[:4], dm.valid_set.noisy_files[:4]
        p = s = e = 0.0
        for cf, nf in zip(cl, no):
            x, _ = read_wav(cf)
            y, _ = read_wav(nf)
            p += pesq_wb(16000, x[0], y[0])
            s += si_sdr(x[0], y[0])
            e += estoi(x[0], y[0], 16000)
        return p / 4, s / 4, e / 4

    mix = mixture_quality()
    print(f"[demo] mixture      : pesq {mix[0]:.3f}  si_sdr {mix[1]:+.2f} dB  "
          f"estoi {mix[2]:.3f}")

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    variables0 = model.init_variables(key)
    q0 = quality(variables0)
    print(f"[demo] untrained net: pesq {q0[0]:.3f}  si_sdr {q0[1]:+.2f} dB  "
          f"estoi {q0[2]:.3f}")

    state = train_score_model(
        model, dm, max_epochs=args.epochs,
        ckpt_dir=os.path.join(work, "ckpts"),
        logger=MetricsLogger(log_dir=work),
        use_mesh=False, max_steps_per_epoch=args.steps_per_epoch,
    )
    q1 = quality(eval_variables(state))
    dt = time.time() - t0
    print(f"[demo] trained (EMA): pesq {q1[0]:.3f}  si_sdr {q1[1]:+.2f} dB  "
          f"estoi {q1[2]:.3f}   "
          f"[{int(state.step)} steps, {dt/60:.1f} min]")
    improved = q1[1] > q0[1]
    print(f"[demo] SI-SDR improvement over untrained: "
          f"{q1[1] - q0[1]:+.2f} dB ({'OK' if improved else 'NO IMPROVEMENT'})")
    return 0 if improved else 1


if __name__ == "__main__":
    raise SystemExit(main())
