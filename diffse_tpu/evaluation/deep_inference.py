"""Per-SNR sweep validation harness: deep_evaluate_model.

Functional twin of sgmse/util/deep_inference.py:85-297 — for each selected
valid2 utterance, synthesize nine SNR variants

    y = x + (y_default - x) * 10^(-SNR/20),  SNR in {0, 5, ..., 40}

(effective input SNRs -5..35 dB given the -5 dB base mixture), enhance each,
and return 27 scalars: per-SNR SI-SDR, PESQ, ESTOI (the reference logs them
as pesq_-5 ... estoi_35, model.py:449-477).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.wavio import read_wav
from ..models.score_model import ScoreModel
from .inference import SR
from .metrics import estoi, pesq_wb, si_sdr

SNR_GRID = list(range(0, 41, 5))


def deep_evaluate_model(
    model: ScoreModel,
    variables,
    data_module,
    num_eval_files: int,
    model_type: str = "bbed",
    fixed_snr: float = 1.0,
    key: Optional[jax.Array] = None,
):
    """Returns (si_sdr_0..si_sdr_40, pesq_0..pesq_40, estoi_0..estoi_40) —
    27 scalars in the reference's ordering (deep_inference.py:291-297)."""
    if key is None:
        key = jax.random.PRNGKey(0)

    clean_files = data_module.valid_set_2.clean_files
    noisy_files = data_module.valid_set_2.noisy_files
    total = len(clean_files)
    if num_eval_files == -1:
        num_eval_files = total
    indices = np.linspace(0, total - 1, num_eval_files).astype(int)
    clean_files = [clean_files[i] for i in indices]
    noisy_files = [noisy_files[i] for i in indices]

    acc_pesq = np.zeros(len(SNR_GRID))
    acc_sisdr = np.zeros(len(SNR_GRID))
    acc_estoi = np.zeros(len(SNR_GRID))

    from .batch_eval import batch_enhance

    for i, (cf, nf) in enumerate(zip(clean_files, noisy_files)):
        x_def, _ = read_wav(cf)
        y_def, _ = read_wav(nf)
        x_def, y_def = x_def[0], y_def[0]
        y0_def = y_def - x_def

        # All nine SNR variants share the file's length, so they enhance as
        # ONE batched call of the bucket program (per-row normalization and
        # per-row est keep semantics exactly per-variant; the reference loops
        # them one by one, deep_inference.py:125-129).
        ys = [x_def + y0_def * 10 ** (-snr_db / 20) for snr_db in SNR_GRID]
        est_snrs = None
        if model_type in ("sebridge_v2_snr", "sebridge_v3_snr"):
            est_snrs = list(np.asarray(
                model.estimate_snr(jnp.asarray(np.stack(ys)))
            ))
        file_key = jax.random.fold_in(key, i)
        x_hats = batch_enhance(
            model, variables, [x_def] * len(SNR_GRID), ys, model_type,
            file_key, batch_size=len(SNR_GRID), est_snrs=est_snrs,
            fixed_snr=fixed_snr,
        )
        for j, x_hat in enumerate(x_hats):
            acc_sisdr[j] += si_sdr(x_def, x_hat)
            acc_pesq[j] += pesq_wb(SR, x_def, x_hat)
            acc_estoi[j] += estoi(x_def, x_hat, SR)

    acc_sisdr /= num_eval_files
    acc_pesq /= num_eval_files
    acc_estoi /= num_eval_files
    return tuple(acc_sisdr) + tuple(acc_pesq) + tuple(acc_estoi)
