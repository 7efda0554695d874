"""SNR-sweep evaluation CLI (reference: deep_eval.py).

For each test wav, synthesizes 9 SNR variants y = x + (y_def - x) * 10^(-SNR/20)
for SNR in {0..40 step 5} (effective input SNRs -5..35 dB, deep_eval.py:112-118),
enhances each with oracle rms pair (clean_rms=1, noise_rms=10^((-SNR+5)/20)),
and records per-SNR PESQ/SI-SDR/ESTOI columns.
"""

from __future__ import annotations

import glob
import os
from argparse import ArgumentParser
from os.path import join

import numpy as np


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--destination_folder", type=str, required=True)
    parser.add_argument("--test_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--ckpt_step", type=int, default=None)
    parser.add_argument("--monitor", type=str, default=None)
    parser.add_argument("--sampler_type", type=str, choices=("pc", "ode"), default="pc")
    parser.add_argument("--predictor", type=str, default="reverse_diffusion")
    parser.add_argument("--reverse_starting_point", type=float, default=1.0)
    parser.add_argument("--force_N", type=int, default=0)
    parser.add_argument("--corrector", type=str, choices=("ald", "langevin", "none"),
                        default="ald")
    parser.add_argument("--corrector_steps", type=int, default=1)
    parser.add_argument("--snr", type=float, default=0.5)
    parser.add_argument("--N", type=int, default=30)
    parser.add_argument("--atol", type=float, default=1e-5)
    parser.add_argument("--rtol", type=float, default=1e-5)
    parser.add_argument("--timestep_type", type=str, default="linear")
    parser.add_argument("--oracle", type=bool, default=False)
    parser.add_argument("--snr_ckpt", type=str, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from ..data.wavio import read_wav, write_wav
    from ..evaluation.metrics import estoi, pesq_wb, print_mean_std, si_sdr
    from ..train.restore import load_score_model, load_snr_model
    from ..train.state import eval_variables

    clean_dir = join(args.test_dir, "clean")
    noisy_dir = join(args.test_dir, "noisy")

    snr_model = None
    if args.snr_ckpt:
        snr_m, snr_state = load_snr_model(args.snr_ckpt)
        snr_model = (snr_m.dnn, eval_variables(snr_state))

    model, state = load_score_model(
        args.ckpt, step=args.ckpt_step, monitor=args.monitor, snr_model=snr_model
    )
    variables = eval_variables(state)

    sr = 16000
    if model.sde.__class__.__name__ == "OUVESDE":
        model.sde = model.sde.replace(T_=args.reverse_starting_point)
    else:
        model.sde = model.sde.replace(T_sampling=args.reverse_starting_point)
    N = int(args.reverse_starting_point * args.N)
    if args.force_N:
        N = args.force_N

    noisy_files = sorted(glob.glob(f"{noisy_dir}/*.wav"))
    target_dir = args.destination_folder
    snr_grid = list(range(0, 41, 5))
    for s in snr_grid:
        os.makedirs(join(target_dir, f"{s - 5:02d}"), exist_ok=True)

    data = {"filename": []}
    for s in snr_grid:
        data[f"pesq_{s - 5}"] = []
        data[f"si_sdr_{s - 5}"] = []
        data[f"estoi_{s - 5}"] = []

    key = jax.random.PRNGKey(0)
    for cnt, noisy_file in enumerate(noisy_files):
        filename = os.path.basename(noisy_file)
        data["filename"].append(filename)
        x_def, _ = read_wav(join(clean_dir, filename))
        y_def, _ = read_wav(noisy_file)
        y0_def = y_def - x_def

        for snr_db in snr_grid:
            x = x_def
            y = x_def + y0_def * 10 ** (-snr_db / 20)
            clean_rms = 1
            noise_rms = 10 ** ((-snr_db + 5) / 20)

            key, ekey = jax.random.split(key)
            x_hat = model.enhance(
                variables, jnp.asarray(x), jnp.asarray(y), key=ekey,
                sampler_type=args.sampler_type, predictor=args.predictor,
                corrector=args.corrector, corrector_steps=args.corrector_steps,
                N=N, snr=args.snr, atol=args.atol, rtol=args.rtol,
                timestep_type=args.timestep_type, oracle=args.oracle,
                clean_rms=clean_rms, noise_rms=noise_rms,
            )
            x1 = x[0]
            write_wav(join(target_dir, f"{snr_db - 5:02d}", filename), x_hat, sr)

            p = pesq_wb(sr, x1, x_hat)
            data[f"pesq_{snr_db - 5}"].append(p)
            data[f"si_sdr_{snr_db - 5}"].append(si_sdr(x1, x_hat))
            data[f"estoi_{snr_db - 5}"].append(estoi(x1, x_hat, sr))
            print(f"{snr_db - 5} | pesq {p:.3f} si_sdr {data[f'si_sdr_{snr_db-5}'][-1]:.2f}")

    df = pd.DataFrame(data)
    df.to_csv(join(target_dir, "_results_deep.csv"), index=False)
    with open(join(target_dir, "_avg_results_deep.txt"), "w") as f:
        for snr_db in snr_grid:
            f.write("PESQ_{0}: {1} \n".format(
                snr_db - 5, print_mean_std(data[f"pesq_{snr_db - 5}"], decimal=3)))
            f.write("SI-SDR_{0}: {1} \n".format(
                snr_db - 5, print_mean_std(data[f"si_sdr_{snr_db - 5}"], decimal=1)))
            f.write("ESTOI_{0}: {1} \n".format(
                snr_db - 5, print_mean_std(data[f"estoi_{snr_db - 5}"], decimal=2)))


if __name__ == "__main__":
    main()
