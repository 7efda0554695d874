"""In-training validation harness: evaluate_model.

Functional twin of sgmse/util/inference.py:85-318 — pick files uniformly over
the validation set, run the branch-specific enhancement (8 branches across
bbed / sebridge / sebridge_v2[_fixed|_snr] / sebridge_v3[_fixed|_snr]), and
accumulate PESQ-wb / SI-SDR / ESTOI.

All spectral work (normalize -> STFT -> branch sampling -> iSTFT) runs as one
jitted XLA program per (branch, padded-width) bucket; only wav I/O and the
PESQ/ESTOI scoring stay on the host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.wavio import read_wav
from ..models.score_model import (
    ScoreModel,
    calculate_normfac_direct,
    calculate_snr_direct,
    noise_mag,
    t_30,
)
from ..sampling import get_pc_sampler
from ..transforms import pad_spec
from ..utils import randn_like
from .metrics import estoi, pesq_wb, si_sdr

# Settings (inference.py:11-15)
SR = 16000
SNR_ALD = 0.5
N_STEPS = 30
CORRECTOR_STEPS = 1

def spec_sample(model: ScoreModel, variables, branch: str, X, Y, key,
                est_snr, fixed_snr: float, noise_size=None,
                predictor: str = "reverse_diffusion", corrector: str = "ald",
                N: int = None, snr: float = None,
                timestep_type: str = "linear", corrector_steps: int = None):
    """Branch-specific enhanced-sample computation on COMPRESSED spectrograms
    (the shared core of inference.py:152-312): X/Y are ``[B, 1, F, T]``
    complex, ``est_snr`` is ``[B]``. Returns the enhanced compressed spec
    ``[B, 1, F, T]``. Pure/traceable — used by the eval harness and by the
    spec-domain streaming paths (evaluation/streaming.py).

    ``noise_size`` (sebridge_v2_fixed only): the |X-Y| magnitude used for the
    fixed-SNR rescale, broadcastable against ``[B, 1, F, T]``. The reference
    evaluates one utterance per call, so its max is per-utterance
    (inference.py:252-255); batched callers must pass the per-utterance value
    (per row for utterance batches, the whole-utterance scalar for chunk
    batches) — None falls back to a max over the full batch, which is only
    correct when the batch IS one utterance."""
    cfg = model.cfg
    if branch == "bbed":
        # predictor/corrector/N/snr override the reference sampler config
        # (inference.py:161-167) for this branch only, e.g. the quality-
        # certified NFE-reduction serving config heun/none/15
        # (SAMPLER_QUALITY.json, tools/sampler_quality.py).
        score_fn = lambda x_, t_, y_: model.forward(variables, x_, t_, y_)[0]
        sde = model.sde.replace(N=N_STEPS if N is None else N)
        sampler = get_pc_sampler(
            predictor, corrector, sde=sde, score_fn=score_fn, Y=Y,
            denoise=True, eps=cfg.t_eps, snr=SNR_ALD if snr is None else snr,
            corrector_steps=(CORRECTOR_STEPS if corrector_steps is None
                             else corrector_steps),
            timestep_type=timestep_type,
        )
        sample, _ = sampler(key)
    elif branch == "sebridge":
        vec_t = jnp.full((Y.shape[0],), 0.999)
        sample, _ = model.forward(variables, Y, vec_t, Y)
    elif branch == "sebridge_v2":
        vec_t = jnp.full((Y.shape[0],), 1.0)
        Z = randn_like(key, Y) * cfg.sigma_max * 1.0
        sample, _ = model.forward(variables, Y + Z, vec_t, Y)
    elif branch == "sebridge_v2_fixed":
        vec_t = jnp.full((Y.shape[0],), 0.999)
        if noise_size is None:
            noise_size = noise_mag(X, Y, mode="max")
        Y = X + (Y - X) / noise_size * fixed_snr
        Z = randn_like(key, Y) * cfg.sigma_max * 0.999
        sample, _ = model.forward(variables, Y + Z, vec_t, Y)
    elif branch == "sebridge_v3_fixed":
        vec_t = jnp.full((Y.shape[0],), 1.0)
        Z = randn_like(key, Y) * cfg.sigma_max
        sample, _ = model.forward(variables, Y + Z, vec_t, Y)
    elif branch == "sebridge_v2_snr":
        # NOTE: the reference's path calls calculate_snr_direct with two
        # args and crashes (inference.py:273, SURVEY.md §3.6); implemented
        # here with the intended fixed_snr argument.
        t_val = calculate_snr_direct(1.0, est_snr, fixed_snr)  # [B]
        Z = randn_like(key, Y) * cfg.sigma_max * t_val[:, None, None, None].astype(Y.dtype)
        sample, _ = model.forward(variables, Y + Z, t_val, Y)
    elif branch == "sebridge_v3_snr":
        t_val = calculate_snr_direct(1.0, est_snr, fixed_snr)  # [B]
        grid = jnp.asarray(t_30, dtype=jnp.float32)
        idx = jnp.argmin(jnp.abs(grid[None, :] - t_val[:, None]), axis=1)
        t_val = grid[idx]  # snapped per row
        Z = randn_like(key, Y) * cfg.sigma_max * t_val[:, None, None, None].astype(Y.dtype)
        sample, _ = model.forward(variables, Y + Z, t_val, Y)
    else:
        raise ValueError(f"unknown eval branch {branch}")
    return sample


def _eval_fn(model: ScoreModel, branch: str, t_pad: int,
             fixed_snr: Optional[float] = None,
             sampler_kwargs: Optional[dict] = None):
    """Jitted eval-time enhancement for one branch/width bucket
    (inference.py:152-312). ``sampler_kwargs`` (bbed only): predictor/
    corrector/N/snr/corrector_steps/timestep_type overrides of the
    reference sampler config — e.g. the certified NFE-reduction serving
    config (SAMPLER_QUALITY.json)."""
    cfg = model.cfg
    fixed_snr = cfg.fixed_snr if fixed_snr is None else fixed_snr
    sk = dict(sampler_kwargs or {})
    # Cache on the model itself (like ScoreModel._enhance_cache): the jitted
    # closures capture `model`, so a module-global cache would pin every
    # served model (and its compiled programs) for the process lifetime.
    cache = model.__dict__.setdefault("_eval_jit_cache", {})
    key_ = (branch, t_pad, fixed_snr, tuple(sorted(sk.items())))
    if key_ in cache:
        return cache[key_]

    def fn(variables, x_wav, y_wav, key, est_snr):
        # Per-utterance (per-row) normalization: identical to the reference for
        # batch 1, and exact under bucketed batching (batch_eval.py).
        est_snr = jnp.broadcast_to(jnp.atleast_1d(est_snr), (y_wav.shape[0],))
        norm_factor = jnp.max(jnp.abs(y_wav), axis=-1, keepdims=True)
        if branch in ("sebridge_v2_snr", "sebridge_v3_snr"):
            # NOTE: the reference uses the *unsnapped* est_snr for the eval
            # normfac (inference.py:156), unlike enhance() which snaps first.
            normfac = calculate_normfac_direct(1.0, est_snr, fixed_snr)
            norm_factor = norm_factor * normfac[:, None]

        y = y_wav / norm_factor
        x = x_wav / norm_factor
        if branch == "sebridge_v3_fixed":
            # Rescale noise to the training fixed_snr (inference.py:165-166).
            y = x + (y - x) * fixed_snr

        Y = pad_spec(model._forward_transform(model._stft(y))[:, None])
        X = pad_spec(model._forward_transform(model._stft(x))[:, None])

        noise_size = None
        if branch == "sebridge_v2_fixed":
            # Per-ROW max: each row is one utterance here, and the reference
            # computes the rescale magnitude over a single utterance
            # (inference.py:252-255) — a batch-global max would couple
            # utterances through whichever file they are batched with.
            noise_size = jnp.max(jnp.abs(X - Y), axis=(1, 2, 3), keepdims=True)

        sample = spec_sample(model, variables, branch, X, Y, key, est_snr,
                             fixed_snr, noise_size=noise_size, **sk)

        x_hat = model.to_audio(sample[:, 0]) * norm_factor
        return x_hat

    jitted = jax.jit(fn)
    cache[key_] = jitted
    return jitted


def eval_enhance_file(
    model: ScoreModel,
    variables,
    x_wav: np.ndarray,
    y_wav: np.ndarray,
    model_type: str,
    key: jax.Array,
    est_snr: float = 1.0,
    fixed_snr: Optional[float] = None,
) -> np.ndarray:
    """Enhance one utterance with the eval-time branch semantics; returns the
    enhanced waveform trimmed to the input length."""
    t_orig = y_wav.shape[-1]
    frames = 1 + t_orig // model.cfg.hop_length
    t_pad = frames + (64 - frames % 64) % 64
    # Zero-pad on the host to the bucket's sample count so the jit input
    # shape is bucket-static (one compile per bucket, not per length —
    # batch_eval.py does the same; the max-abs normalizer ignores the tail).
    pad_samples = (t_pad - 1) * model.cfg.hop_length
    xp = np.zeros(pad_samples, dtype=np.float32)
    yp = np.zeros(pad_samples, dtype=np.float32)
    xp[:t_orig] = np.asarray(x_wav).reshape(-1)[:pad_samples]
    yp[:t_orig] = np.asarray(y_wav).reshape(-1)[:pad_samples]
    fn = _eval_fn(model, model_type, t_pad, fixed_snr=fixed_snr)
    x_hat = fn(
        variables,
        jnp.asarray(xp)[None],
        jnp.asarray(yp)[None],
        key,
        jnp.asarray(est_snr, dtype=jnp.float32),
    )
    x_hat = np.asarray(x_hat)[0, :t_orig]
    if x_hat.shape[-1] < t_orig:
        # frames % 64 == 0 bucket loses up to hop-1 tail samples in the
        # iSTFT; zero-pad back to the input length so si_sdr/PESQ against the
        # full-length clean never shape-mismatches (torch istft(length=T)
        # zero-pads identically, sgmse/model.py:612-625).
        x_hat = np.pad(x_hat, (0, t_orig - x_hat.shape[-1]))
    return x_hat


def evaluate_model(
    model: ScoreModel,
    variables,
    data_module,
    num_eval_files: int,
    model_type: str = "bbed",
    fixed_snr: float = 1.0,
    key: Optional[jax.Array] = None,
    batch_size: int = 1,
) -> Tuple[float, float, float]:
    """Mean (pesq, si_sdr, estoi) over uniformly selected validation files
    (inference.py:85-318).

    ``batch_size`` > 1 enhances the files as bucketed batches
    (batch_eval.py) — per-row semantics are identical, so only throughput
    changes. The default stays 1: each distinct (bucket width, row count)
    is its own compile, and on bridges where a 65M compile costs minutes
    the per-file path's single program per bucket is the safer default.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    if model_type == "sebridge_v3_fixed":
        clean_files = data_module.valid_set_2.clean_files
        noisy_files = data_module.valid_set_2.noisy_files
    else:
        clean_files = data_module.valid_set.clean_files
        noisy_files = data_module.valid_set.noisy_files

    total = len(clean_files)
    if num_eval_files == -1:
        num_eval_files = total
    indices = np.linspace(0, total - 1, num_eval_files).astype(int)
    clean_files = [clean_files[i] for i in indices]
    noisy_files = [noisy_files[i] for i in indices]

    if batch_size > 1:
        from .batch_eval import batch_enhance

        xs, ys = [], []
        for cf, nf in zip(clean_files, noisy_files):
            x, _ = read_wav(cf)
            y, _ = read_wav(nf)
            xs.append(x[0])
            ys.append(y[0])
        est_snrs = None
        if model_type in ("sebridge_v2_snr", "sebridge_v3_snr"):
            est_snrs = [
                float(model.estimate_snr(jnp.asarray(y)[None])[0]) for y in ys
            ]
        x_hats = batch_enhance(model, variables, xs, ys, model_type, key,
                               batch_size=batch_size, est_snrs=est_snrs,
                               fixed_snr=fixed_snr)
        _pesq = _si_sdr = _estoi = 0.0
        for x, x_hat in zip(xs, x_hats):
            _si_sdr += si_sdr(x, x_hat)
            _pesq += pesq_wb(SR, x, x_hat)
            _estoi += estoi(x, x_hat, SR)
        return (
            _pesq / num_eval_files,
            _si_sdr / num_eval_files,
            _estoi / num_eval_files,
        )

    _pesq = _si_sdr = _estoi = 0.0
    for i, (cf, nf) in enumerate(zip(clean_files, noisy_files)):
        x, _ = read_wav(cf)
        y, _ = read_wav(nf)
        x, y = x[0], y[0]

        est_snr = 1.0
        if model_type in ("sebridge_v2_snr", "sebridge_v3_snr"):
            est_snr = float(model.estimate_snr(jnp.asarray(y)[None])[0])

        file_key = jax.random.fold_in(key, i)
        x_hat = eval_enhance_file(
            model, variables, x, y, model_type, file_key, est_snr=est_snr,
            fixed_snr=fixed_snr,
        )
        _si_sdr += si_sdr(x, x_hat)
        _pesq += pesq_wb(SR, x, x_hat)
        _estoi += estoi(x, x_hat, SR)

    return (
        _pesq / num_eval_files,
        _si_sdr / num_eval_files,
        _estoi / num_eval_files,
    )
