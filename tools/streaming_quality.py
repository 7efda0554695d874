#!/usr/bin/env python
"""Pick production streaming (mode, overlap) defaults with a TRAINED net.

Loads the convergence-demo checkpoint (tools/convergence_demo.py --work_dir;
reduced NCSN++ trained on the synthetic set through the production loop) and
measures, per held-out fixture:

  - full-context enhancement quality (PESQ / SI-SDR / ESTOI vs clean), and
  - streamed enhancement quality for both streaming modes (waveform-domain
    `enhance_streamed` and spec-domain `enhance_streamed_spec`) across
    overlap settings,

then prints the quality DELTA of each streaming configuration against the
full-context path. This replaces the round-2 random-net agreement bounds
(DEVNOTES: 8.4-10.3 dB SI-SDR agreement) with a trained-net measurement that
the production defaults are chosen from (VERDICT r2 #7).

Usage:
    JAX_PLATFORMS=cpu python tools/streaming_quality.py \
        --work_dir /root/repo/.cache/convdemo [--num_files 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--work_dir", type=str,
                        default="/root/repo/.cache/convdemo")
    parser.add_argument("--num_files", type=int, default=6)
    parser.add_argument("--overlaps", type=int, nargs="*",
                        default=[0, 2, 4, 8, 16])
    parser.add_argument("--chunk_frames", type=int, default=64)
    parser.add_argument("--eval_dir", type=str, default=None,
                        help="clean/noisy pair dir (default <work_dir>/data/valid)")
    parser.add_argument("--wav_mode", action="store_true",
                        help="also measure the waveform-domain path")
    args = parser.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import numpy as np

    from diffse_tpu.data.wavio import read_wav
    from diffse_tpu.evaluation.inference import eval_enhance_file
    from diffse_tpu.evaluation.metrics import estoi, pesq_wb, si_sdr
    from diffse_tpu.evaluation.streaming import (
        enhance_streamed,
        enhance_streamed_spec,
    )
    from diffse_tpu.train.restore import load_score_model
    from diffse_tpu.train.state import eval_variables

    ckpt_dir = os.path.join(args.work_dir, "ckpts")
    model, state = load_score_model(ckpt_dir)
    variables = eval_variables(state)  # EMA weights, as at eval time
    print(f"[sq] loaded {ckpt_dir} "
          f"(model_type={model.cfg.model_type}, nf={model._backbone_kwargs.get('nf')})")

    valid = args.eval_dir or os.path.join(args.work_dir, "data", "valid")
    clean_files = sorted(
        os.path.join(valid, "clean", f)
        for f in os.listdir(os.path.join(valid, "clean"))
    )[: args.num_files]

    mt = model.cfg.model_type  # 'bbed' for the demo config
    key = jax.random.PRNGKey(123)

    def score(x, x_hat):
        return (pesq_wb(16000, x, x_hat), float(si_sdr(x, x_hat)),
                float(estoi(x, x_hat, 16000)))

    rows = {}

    def add(name, vals):
        rows.setdefault(name, []).append(vals)

    for i, cf in enumerate(clean_files):
        nf_ = cf.replace("/clean/", "/noisy/")
        x, _ = read_wav(cf)
        y, _ = read_wav(nf_)
        x, y = x[0], y[0]
        k = jax.random.fold_in(key, i)

        add("mixture", score(x, y))
        full = eval_enhance_file(model, variables, x, y, mt, k)
        add("full", score(x, full))
        cf = args.chunk_frames
        for ov in args.overlaps:
            s = enhance_streamed_spec(model, variables, y, mt, k,
                                      chunk_frames=cf, overlap_frames=ov,
                                      x_wav=x)
            add(f"spec_c{cf}_ov{ov}", score(x, s))
            if args.wav_mode:
                w = enhance_streamed(model, variables, y, mt, k,
                                     chunk_frames=cf, overlap_frames=ov,
                                     x_wav=x)
                add(f"wav_c{cf}_ov{ov}", score(x, w))
        print(f"[sq] file {i + 1}/{len(clean_files)} done", flush=True)

    def mean(name, j):
        v = [r[j] for r in rows[name] if np.isfinite(r[j])]
        return float(np.mean(v)) if v else float("nan")

    full_p, full_s = mean("full", 0), mean("full", 1)
    print(f"\n{'config':<12} {'pesq':>7} {'si_sdr':>8} {'estoi':>7} "
          f"{'dPESQ':>7} {'dSISDR':>8}")
    results = {}
    for name in rows:
        p, s, e = mean(name, 0), mean(name, 1), mean(name, 2)
        dp = p - full_p if name not in ("mixture", "full") else 0.0
        ds = s - full_s if name not in ("mixture", "full") else 0.0
        results[name] = dict(pesq=round(p, 3), si_sdr=round(s, 2),
                             estoi=round(e, 3), d_pesq=round(dp, 3),
                             d_si_sdr=round(ds, 2))
        print(f"{name:<12} {p:>7.3f} {s:>8.2f} {e:>7.3f} {dp:>7.3f} {ds:>8.2f}")

    print("\nRESULT " + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
