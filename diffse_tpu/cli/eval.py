"""Full test-set evaluation CLI (reference: eval.py).

Loads a checkpoint (EMA weights), optionally reads the SNR oracle from
`active_rms.txt` (eval.py:55-67), rescales the reverse starting point
(sde.T = reverse_starting_point, N = T / delta_t, eval.py:105-113), enhances
every wav under <test_dir>/noisy, writes enhanced wavs plus a per-file metric
CSV and a mean ± std summary. PESQ, SI-SDR and ESTOI are all scored natively
(evaluation/pesq_native.py implements ITU-T P.862.2; the `pesq` wheel is used
instead when installed).
"""

from __future__ import annotations

import glob
import os
from argparse import ArgumentParser
from os.path import join

import numpy as np


def _write_results(pd, target_dir, data):
    """Per-file CSV + mean ± std summary (eval.py:159-170)."""
    from ..evaluation.metrics import print_mean_std

    pd.DataFrame(data).to_csv(join(target_dir, "_results.csv"), index=False)
    with open(join(target_dir, "_avg_results.txt"), "w") as f:
        f.write("PESQ: {} \n".format(print_mean_std(data["pesq"])))
        f.write("SI-SDR: {} \n".format(print_mean_std(data["si_sdr"])))
        f.write("ESTOI: {} \n".format(print_mean_std(data["estoi"])))


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--destination_folder", type=str, required=True)
    parser.add_argument("--test_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="Checkpoint directory (CheckpointManager layout)")
    parser.add_argument("--ckpt_step", type=int, default=None)
    parser.add_argument("--monitor", type=str, default=None,
                        help="Pick the best checkpoint by this metric (e.g. pesq)")
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
    parser.add_argument("--snr_ckpt", type=str, default=None,
                        help="SNR-estimator checkpoint dir (snr_conditioned=true, non-oracle)")
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="Bucketed batch enhancement (>1 uses the in-training "
                             "harness branch semantics via batch_eval; per-utterance "
                             "normalization is preserved)")
    parser.add_argument("--streaming_chunk_frames", type=int, default=0,
                        help="If > 0 (multiple of 64), enhance via overlap-chunked "
                             "streaming; combined with --eval_batch_size > 1, "
                             "chunks are pooled across utterances into fixed-"
                             "shape hot batches (packed fleet serving). "
                             "streaming: ONE compiled width bucket serves every "
                             "utterance length (evaluation/streaming.py)")
    parser.add_argument("--streaming_overlap_frames", type=int, default=2,
                        help="Chunk overlap in frames (default 2: measured PESQ-parity with full-context for the spec mode)")
    parser.add_argument("--streaming_trim_frames", type=int, default=0,
                        help="Discard this many frames per interior chunk edge "
                             "before the overlap-add (boundary-quality knob; "
                             "needs overlap > 2*trim; wav mode only)")
    parser.add_argument("--streaming_mode", type=str, default="spec",
                        choices=("spec", "wav"),
                        help="'spec' (default): one on-device STFT per "
                             "utterance, overlapped frame chunks with real "
                             "boundary context, device-side crossfade OLA + "
                             "single iSTFT. 'wav': per-chunk waveform path")
    parser.add_argument("--seq_shards", type=int, default=0,
                        help="If > 0, shard each utterance's spectrogram "
                             "frames over a 1-D 'seq' mesh of that many "
                             "devices (sequence-parallel enhancement; "
                             "parallel/sequence.py). Single-utterance path "
                             "only (incompatible with --eval_batch_size > 1 "
                             "and --streaming_chunk_frames)")
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

    clean_rms, noise_rms = [], []
    if args.oracle:
        with open(join(args.test_dir, "active_rms.txt")) as f:
            for line in f:
                parts = line.split("\t")
                try:
                    clean_rms.append(float(parts[1]))
                    noise_rms.append(float(parts[2]))
                except (IndexError, ValueError):
                    break

    snr_model = None
    if args.snr_ckpt:
        snr_m, snr_state = load_snr_model(args.snr_ckpt)
        snr_model = (snr_m.dnn, eval_variables(snr_state))

    model, state = load_score_model(
        args.ckpt, step=args.ckpt_step, monitor=args.monitor, snr_model=snr_model
    )
    variables = eval_variables(state)  # EMA weights (eval.py:98)

    # Reverse starting point rescale (eval.py:105-113)
    sr = 16000
    reverse_starting_point = args.reverse_starting_point
    if model.sde.__class__.__name__ == "OUVESDE":
        model.sde = model.sde.replace(T_=reverse_starting_point)
    else:
        model.sde = model.sde.replace(T_sampling=reverse_starting_point)
    delta_t = 1 / args.N
    N = int(reverse_starting_point / delta_t)
    if args.force_N:
        N = args.force_N

    noisy_files = sorted(glob.glob(f"{noisy_dir}/*.wav"))
    target_dir = args.destination_folder
    os.makedirs(join(target_dir, "all"), exist_ok=True)

    seq_mesh = None
    if args.seq_shards:
        if args.eval_batch_size > 1 or args.streaming_chunk_frames:
            parser.error("--seq_shards requires the single-utterance path "
                         "(no --eval_batch_size > 1 / --streaming_chunk_frames)")
        from ..parallel import make_seq_mesh

        seq_mesh = make_seq_mesh(n_seq=args.seq_shards)

    data = {"filename": [], "pesq": [], "si_sdr": [], "estoi": []}
    _pesq_sum = 0.0
    key = jax.random.PRNGKey(0)

    # bbed sampler-config overrides for the batched/streaming serving paths
    # (e.g. the certified 30-NFE config rd_ald2_logit_N10: --N 10
    # --corrector_steps 2 --timestep_type logit); only non-defaults are
    # forwarded so the default path keeps its exact cache keys.
    _sk_defaults = {"predictor": "reverse_diffusion", "corrector": "ald",
                    "N": 30, "snr": 0.5, "corrector_steps": 1,
                    "timestep_type": "linear"}
    sampler_sk = {
        k: v for k, v in (
            ("predictor", args.predictor),
            ("corrector", args.corrector),
            ("N", N),
            ("snr", args.snr),
            ("corrector_steps", args.corrector_steps),
            ("timestep_type", args.timestep_type),
        )
        if v != _sk_defaults[k]
    } or None

    if args.eval_batch_size > 1:
        # Bucketed batched evaluation (production-serving path); combined
        # with --streaming_chunk_frames, chunks are pooled ACROSS utterances
        # into fixed-shape batches of the hot chunk program (fleet serving,
        # evaluation/streaming.py:enhance_streamed_packed).
        from ..evaluation.batch_eval import batch_enhance
        from ..train.loop import eval_model_type

        if args.streaming_chunk_frames and args.streaming_mode != "spec":
            parser.error("packed streaming (--eval_batch_size > 1 with "
                         "--streaming_chunk_frames) supports "
                         "--streaming_mode spec only")

        mt = eval_model_type(model.cfg.snr_conditioned, model.cfg.model_type)
        xs, ys, names = [], [], []
        for noisy_file in noisy_files:
            filename = os.path.basename(noisy_file)
            x, _ = read_wav(join(clean_dir, filename))
            y, _ = read_wav(noisy_file)
            xs.append(x[0])
            ys.append(y[0])
            names.append(filename)
        est_snrs = None
        if mt.endswith("_snr"):
            est_snrs = [float(model.estimate_snr(jnp.asarray(y)[None])[0]) for y in ys]
        if args.streaming_chunk_frames:
            from ..evaluation.streaming import enhance_streamed_packed

            outs = enhance_streamed_packed(
                model, variables, ys, mt, key,
                chunk_frames=args.streaming_chunk_frames,
                overlap_frames=args.streaming_overlap_frames,
                batch_size=args.eval_batch_size, x_wavs=xs,
                est_snrs=est_snrs, fixed_snr=model.cfg.fixed_snr,
                sampler_kwargs=sampler_sk)
        else:
            outs = batch_enhance(model, variables, xs, ys, mt, key,
                                 batch_size=args.eval_batch_size, est_snrs=est_snrs,
                                 fixed_snr=model.cfg.fixed_snr,
                                 sampler_kwargs=sampler_sk)
        for filename, x1, x_hat in zip(names, xs, outs):
            write_wav(join(target_dir, "all", filename), x_hat, sr)
            p = pesq_wb(sr, x1, x_hat)
            data["filename"].append(filename)
            data["pesq"].append(p)
            data["si_sdr"].append(si_sdr(x1, x_hat))
            data["estoi"].append(estoi(x1, x_hat, sr))
        _write_results(pd, target_dir, data)
        return

    if args.streaming_chunk_frames:
        # Overlap-chunked streaming serving: every utterance is enhanced
        # through the SAME compiled chunk program regardless of length.
        from ..evaluation.streaming import enhance_streamed, enhance_streamed_spec
        from ..train.loop import eval_model_type

        mt = eval_model_type(model.cfg.snr_conditioned, model.cfg.model_type)
        for cnt, noisy_file in enumerate(noisy_files):
            filename = os.path.basename(noisy_file)
            x, _ = read_wav(join(clean_dir, filename))
            y, _ = read_wav(noisy_file)
            est_snr = 1.0
            if mt.endswith("_snr"):
                est_snr = float(model.estimate_snr(jnp.asarray(y))[0])
            key, ekey = jax.random.split(key)
            if args.streaming_mode == "spec":
                x_hat = enhance_streamed_spec(
                    model, variables, y[0], mt, ekey,
                    chunk_frames=args.streaming_chunk_frames,
                    overlap_frames=args.streaming_overlap_frames,
                    x_wav=x[0], est_snr=est_snr, fixed_snr=model.cfg.fixed_snr,
                    sampler_kwargs=sampler_sk,
                )
            else:
                x_hat = enhance_streamed(
                    model, variables, y[0], mt, ekey,
                    chunk_frames=args.streaming_chunk_frames,
                    overlap_frames=args.streaming_overlap_frames,
                    trim_frames=args.streaming_trim_frames,
                    x_wav=x[0], est_snr=est_snr, fixed_snr=model.cfg.fixed_snr,
                    sampler_kwargs=sampler_sk,
                )
            x1 = x[0][: len(x_hat)]
            write_wav(join(target_dir, "all", filename), x_hat, sr)
            p = pesq_wb(sr, x1, x_hat)
            _pesq_sum += 0.0 if np.isnan(p) else p
            data["filename"].append(filename)
            data["pesq"].append(p)
            data["si_sdr"].append(si_sdr(x1, x_hat))
            data["estoi"].append(estoi(x1, x_hat, sr))
            print(f" avg PESQ: {_pesq_sum / (cnt + 1):.3f}")
        _write_results(pd, target_dir, data)
        return

    for cnt, noisy_file in enumerate(noisy_files):
        filename = os.path.basename(noisy_file)
        x, _ = read_wav(join(clean_dir, filename))
        y, _ = read_wav(noisy_file)

        kwargs = dict(
            sampler_type=args.sampler_type, predictor=args.predictor,
            corrector=args.corrector, corrector_steps=args.corrector_steps,
            N=N, snr=args.snr, atol=args.atol, rtol=args.rtol,
            timestep_type=args.timestep_type, oracle=args.oracle,
            seq_mesh=seq_mesh,
        )
        if args.oracle:
            kwargs.update(clean_rms=clean_rms[cnt], noise_rms=noise_rms[cnt])
        else:
            kwargs.update(clean_rms=1, noise_rms=1)

        key, ekey = jax.random.split(key)
        x_hat = model.enhance(variables, jnp.asarray(x), jnp.asarray(y), key=ekey, **kwargs)

        x1 = x[0]
        write_wav(join(target_dir, "all", filename), x_hat, sr)

        p = pesq_wb(sr, x1, x_hat)
        _pesq_sum += 0.0 if np.isnan(p) else p
        data["filename"].append(filename)
        data["pesq"].append(p)
        data["si_sdr"].append(si_sdr(x1, x_hat))
        data["estoi"].append(estoi(x1, x_hat, sr))
        print(f" avg PESQ: {_pesq_sum / (cnt + 1):.3f}  "
              f"(si_sdr {data['si_sdr'][-1]:.2f}, estoi {data['estoi'][-1]:.3f})")

    _write_results(pd, target_dir, data)


if __name__ == "__main__":
    main()
