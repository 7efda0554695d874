#!/usr/bin/env python
"""Characterize sampler quality vs NFE with a TRAINED net.

Loads the convergence-demo checkpoint (tools/convergence_demo.py, bbed
config) and measures enhancement quality (PESQ / SI-SDR / ESTOI vs clean) of
the PC sampler across (predictor, corrector, N) configurations on held-out
fixtures — grounding the NFE-reduction claims of the 2nd-order ``heun``
predictor (sampling/predictors.py) in a measurement rather than only the
toy-problem convergence-order test:

  - reverse_diffusion + ald, N=30 (60 NFE): the reference's eval config
    (sgmse-bbed/eval.py:126-132; model.py:22-23).
  - reverse_diffusion + ald at reduced N (2 NFE per step).
  - heun + none across N (2 NFE per step, deterministic).

Usage:
    JAX_PLATFORMS=cpu python tools/sampler_quality.py \
        --work_dir /root/repo/.cache/convdemo [--num_files 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def C(label, pred, corr, n, nfe, grid="linear", snr=0.5, csteps=1):
    return dict(label=label, predictor=pred, corrector=corr, N=n,
                nfe=nfe, grid=grid, snr=snr, corrector_steps=csteps)

SWEEP_CONFIGS = [
    # reference config (sgmse-bbed/eval.py:126-132, linear grid)
    C("rd_ald_N30", "reverse_diffusion", "ald", 30, 60),
    C("rd_ald_N15", "reverse_diffusion", "ald", 15, 30),
    C("rd_ald_N8", "reverse_diffusion", "ald", 8, 16),
    C("heun_N30", "heun", "none", 30, 60),
    C("heun_N15", "heun", "none", 15, 30),
    C("heun_N8", "heun", "none", 8, 16),
    # reduced-NFE candidates after the round-4 stiffness diagnosis
    # (DEVNOTES): corrector-free reference predictor; logit-grid
    # (two-sided step clustering) variants of the stochastic and the
    # 2nd-order deterministic sampler; corrector-snr and
    # corrector-steps variations of the strongest stochastic candidate
    # (snr is a traced arg — its variants share one compile).
    C("rd_only_N30", "reverse_diffusion", "none", 30, 30),
    C("rd_ald_logit_N15", "reverse_diffusion", "ald", 15, 30, "logit"),
    C("heun_logit_N15", "heun", "none", 15, 30, "logit"),
    C("heun_logit_N30", "heun", "none", 30, 60, "logit"),
    C("rd_ald_logit_N20", "reverse_diffusion", "ald", 20, 40, "logit"),
    # round-5 boundary densification: the 4-seed table passes at N20
    # (40 NFE) and fails holdout PESQ at 30 NFE — probe between
    C("rd_ald_logit_N17", "reverse_diffusion", "ald", 17, 34, "logit"),
    C("rd_ald_logit_N18", "reverse_diffusion", "ald", 18, 36, "logit"),
    C("rd_ald_logit_N15_snr0.3", "reverse_diffusion", "ald", 15, 30,
      "logit", snr=0.3),
    C("rd_ald_logit_N15_snr0.7", "reverse_diffusion", "ald", 15, 30,
      "logit", snr=0.7),
    C("rd_ald_logit_N15_snr1.0", "reverse_diffusion", "ald", 15, 30,
      "logit", snr=1.0),
    C("rd_ald2_logit_N10", "reverse_diffusion", "ald", 10, 30, "logit",
      csteps=2),
    C("rd_ald2_logit_N12", "reverse_diffusion", "ald", 12, 36, "logit",
      csteps=2),
    # sub-30-NFE candidates: viable once the score net is accurate
    # enough (larger-data checkpoints) — the corrector budget is what
    # tolerates score error at few predictor steps (DEVNOTES round 4)
    C("rd_ald_logit_N10", "reverse_diffusion", "ald", 10, 20, "logit"),
    C("rd_ald2_logit_N8", "reverse_diffusion", "ald", 8, 24, "logit",
      csteps=2),
    C("rd_ald2_logit_N7", "reverse_diffusion", "ald", 7, 21, "logit",
      csteps=2),
    C("rd_ald2_logit_N6", "reverse_diffusion", "ald", 6, 18, "logit",
      csteps=2),
    # exponential data-prediction integrators (bridge DDIM /
    # DPM-Solver-2, sampling/predictors.py): the stiffness-immune
    # deterministic route (round-5 replacement for the collapsed heun)
    # plus a stochastic exp+ald hybrid
    C("exp_euler_logit_N30", "exp_euler", "none", 30, 30, "logit"),
    C("exp_euler_logit_N15", "exp_euler", "none", 15, 15, "logit"),
    C("exp_euler_logit_N10", "exp_euler", "none", 10, 10, "logit"),
    C("exp_heun_logit_N15", "exp_heun", "none", 15, 30, "logit"),
    C("exp_heun_logit_N8", "exp_heun", "none", 8, 16, "logit"),
    C("exp_euler_ald_logit_N10", "exp_euler", "ald", 10, 20, "logit"),
    C("exp_euler_ald_logit_N15", "exp_euler", "ald", 15, 30, "logit"),
]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--work_dir", type=str,
                        default="/root/repo/.cache/convdemo")
    parser.add_argument("--num_files", type=int, default=6)
    parser.add_argument("--eval_dir", type=str, default=None,
                        help="clean/noisy pair dir (default <work_dir>/data/valid)")
    parser.add_argument("--platform", type=str, default="cpu",
                        help="'cpu' (default) or 'ambient' (run the samplers "
                             "on whatever JAX_PLATFORMS says — e.g. the real "
                             "TPU; needed for production-nf checkpoints)")
    parser.add_argument("--configs", type=str, default=None,
                        help="comma-separated subset of config labels to "
                             "run (each config is a separate TPU compile; "
                             "default = all six)")
    parser.add_argument("--out_json", type=str, default=None,
                        help="also write the RESULT row dict to this path "
                             "(bench.py reads it to certify the NFE-"
                             "reduction serving config)")
    parser.add_argument("--label_suffix", type=str, default="",
                        help="suffix every row label (e.g. '_holdout' for "
                             "an out-of-selection validation run on "
                             "--eval_dir=<data>/test; suffixed rows coexist "
                             "with the selection rows in --out_json and are "
                             "ignored by bench.py's candidate table)")
    parser.add_argument("--holdout_dir", type=str, default=None,
                        help="also score this clean/noisy pair dir with "
                             "'_holdout'-suffixed labels IN THE SAME PROCESS "
                             "(reuses every compiled sampler program — one "
                             "TPU compile per config instead of two separate "
                             "CLI runs)")
    parser.add_argument("--num_holdout_files", type=int, default=4)
    parser.add_argument("--realwav_holdout_dir", type=str, default=None,
                        help="clean/noisy pair dir of REAL speech wavs (e.g. "
                             "a copy of the reference-shipped VBD files) "
                             "scored with '_realwav'-suffixed labels in the "
                             "same process — validates that the certified "
                             "config's deltas transfer to real speech; "
                             "bench.py refuses candidates that fail it")
    parser.add_argument("--seeds", type=int, default=1,
                        help="average each stochastic config's metrics over "
                             "this many sampler PRNG seeds per file. The PC "
                             "sampler's output quality varies with the noise "
                             "draw (per-file PESQ spread ~0.05-0.1), so a "
                             "1-seed table certifies a draw, not a config; "
                             "seeds>=3 compares expected quality at the "
                             "0.02-PESQ parity bar. Deterministic configs "
                             "(exp_* predictor + corrector 'none') are run "
                             "once regardless — extra seeds are identical")
    parser.add_argument("--monitor", type=str, default=None,
                        help="pick the checkpoint by this metric (e.g. "
                             "'pesq' = the training loop's top-k selection "
                             "criterion, train/checkpoints.py) instead of "
                             "the latest step")
    args = parser.parse_args(argv)
    if args.holdout_dir and args.label_suffix == "_holdout":
        # --holdout_dir already emits '_holdout'-suffixed rows; suffixing the
        # main set the same way would silently merge selection and holdout
        # scores under identical labels.
        parser.error("--label_suffix '_holdout' conflicts with --holdout_dir "
                     "(the holdout rows use that suffix); pick another suffix "
                     "or drop one of the flags")
    if args.realwav_holdout_dir and args.label_suffix == "_realwav":
        parser.error("--label_suffix '_realwav' conflicts with "
                     "--realwav_holdout_dir (the real-wav rows use that "
                     "suffix); pick another suffix or drop one of the flags")

    import jax

    if args.platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.data.wavio import read_wav
    from diffse_tpu.evaluation.metrics import estoi, pesq_wb, si_sdr
    from diffse_tpu.train.restore import load_score_model
    from diffse_tpu.train.state import eval_variables

    ckpt_dir = os.path.join(args.work_dir, "ckpts")
    model, state = load_score_model(ckpt_dir, monitor=args.monitor)
    variables = eval_variables(state)
    if args.platform != "cpu":
        # one explicit host->device shipment; per-call implicit transfers of
        # a production-size tree over the TPU bridge dominate otherwise
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
    if model.cfg.model_type != "bbed":
        print(f"[sampq] checkpoint is model_type={model.cfg.model_type}; "
              "this sweep needs the PC-sampler (bbed) branch", file=sys.stderr)
        return 2
    print(f"[sampq] loaded {ckpt_dir} "
          f"(nf={model._backbone_kwargs.get('nf')})")

    valid = args.eval_dir or os.path.join(args.work_dir, "data", "valid")
    clean_files = sorted(
        os.path.join(valid, "clean", f)
        for f in os.listdir(os.path.join(valid, "clean"))
    )[: args.num_files]

    configs = list(SWEEP_CONFIGS)

    if args.configs:
        want = set(args.configs.split(","))
        unknown = want - {c["label"] for c in configs}
        if unknown:
            print(f"[sampq] unknown configs: {sorted(unknown)}", file=sys.stderr)
            return 2
        configs = [c for c in configs if c["label"] in want]

    key = jax.random.PRNGKey(1234)

    def score(x, x_hat):
        n = min(len(x), len(x_hat))
        return (pesq_wb(16000, x[:n], x_hat[:n]), float(si_sdr(x[:n], x_hat[:n])),
                float(estoi(x[:n], x_hat[:n], 16000)))

    rows = {}

    def add(name, vals):
        rows.setdefault(name, []).append(vals)

    def run_set(files, sfx):
        for i, cf in enumerate(files):
            nfle = cf.replace("/clean/", "/noisy/")
            x, _ = read_wav(cf)
            y, _ = read_wav(nfle)
            x1, y1 = x[0], y[0]
            add("mixture" + sfx, score(x1, y1))
            for c in configs:
                deterministic = (c["predictor"].startswith("exp_")
                                 and c["corrector"] == "none")
                n_seeds = 1 if deterministic else max(1, args.seeds)
                seed_scores = []
                for s in range(n_seeds):
                    k = jax.random.fold_in(key, 7919 * s + i)
                    x_hat = model.enhance(
                        variables, jnp.asarray(x), jnp.asarray(y), key=k,
                        sampler_type="pc", predictor=c["predictor"],
                        corrector=c["corrector"],
                        corrector_steps=c["corrector_steps"], N=c["N"],
                        snr=c["snr"], oracle=False,
                        clean_rms=1, noise_rms=1, timestep_type=c["grid"],
                    )
                    seed_scores.append(score(x1, np.asarray(x_hat)))
                add(c["label"] + sfx,
                    tuple(float(np.mean([r[j] for r in seed_scores]))
                          for j in range(3)))
            print(f"[sampq]{sfx} file {i + 1}/{len(files)} done", flush=True)

    HOLDOUT_SUFFIXES = ("_holdout", "_realwav")
    suffixes = [args.label_suffix]
    run_set(clean_files, args.label_suffix)
    for hdir, sfx in ((args.holdout_dir, "_holdout"),
                      (args.realwav_holdout_dir, "_realwav")):
        if not hdir:
            continue
        holdout_files = sorted(
            os.path.join(hdir, "clean", f)
            for f in os.listdir(os.path.join(hdir, "clean"))
        )[: args.num_holdout_files]
        run_set(holdout_files, sfx)
        suffixes.append(sfx)

    def mean(name, j):
        v = [r[j] for r in rows.get(name, []) if np.isfinite(r[j])]
        return float(np.mean(v)) if v else float("nan")

    results = {}
    for sfx in suffixes:
        ref_label = "rd_ald_N30" + sfx
        ref_p, ref_s = mean(ref_label, 0), mean(ref_label, 1)
        print(f"\n{'config':<12} {'nfe':>4} {'pesq':>7} {'si_sdr':>8} "
              f"{'estoi':>7} {'dPESQ':>7} {'dSISDR':>8}")
        nfe_of = {c["label"] + sfx: c["nfe"] for c in configs}
        if sfx in HOLDOUT_SUFFIXES:
            names = [n for n in rows if n.endswith(sfx)]
        else:
            names = [n for n in rows
                     if not any(n.endswith(h) for h in HOLDOUT_SUFFIXES)]
        for name in names:
            p, s, e = mean(name, 0), mean(name, 1), mean(name, 2)
            dp = p - ref_p if name != "mixture" + sfx else 0.0
            ds = s - ref_s if name != "mixture" + sfx else 0.0
            nfe = nfe_of.get(name, 0)
            results[name] = dict(nfe=nfe, pesq=round(p, 3), si_sdr=round(s, 2),
                                 estoi=round(e, 3), d_pesq=round(dp, 3),
                                 d_si_sdr=round(ds, 2), ref=ref_label)
            print(f"{name:<12} {nfe:>4} {p:>7.3f} {s:>8.2f} {e:>7.3f} "
                  f"{dp:>7.3f} {ds:>8.2f}")

    print("\nRESULT " + json.dumps(results))
    if args.out_json:
        merged = {}
        if os.path.exists(args.out_json):
            try:  # --configs subsets update the existing table in place
                with open(args.out_json) as f:
                    merged = json.load(f)
            except Exception:
                merged = {}
        merged.update(results)
        # Recompute deltas against each row's own reference row (default:
        # the selection-set rd_ald_N30), so a --configs subset run still
        # gets meaningful d_pesq/d_si_sdr (same files + same per-file keys
        # across runs => comparable), and _holdout rows compare within
        # their own file set.
        for name, row in merged.items():
            if name.startswith("mixture"):
                continue
            ref = merged.get(row.get("ref", "rd_ald_N30"))
            if not ref or ref is row:
                continue
            row["d_pesq"] = round(row["pesq"] - ref["pesq"], 3)
            row["d_si_sdr"] = round(row["si_sdr"] - ref["si_sdr"], 2)
        with open(args.out_json, "w") as f:
            json.dump(merged, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
