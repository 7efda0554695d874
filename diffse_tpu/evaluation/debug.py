"""Debug / inspection harness.

Working functional replacements for the reference's manual debug paths
(sgmse/model.py:638-1011: enhance_debug / prior_tests2 / get_prior — which
reference an undefined `self.preemp` and crash, SURVEY.md §3.6). Provides:

  - :func:`get_prior` — draw x_T from the prior, run one score evaluation, and
    return the reconstruction pieces (mean-prediction, score, residual) as
    numpy arrays for inspection.
  - :func:`prior_panel` — save the 3x3 diagnostic spectrogram figure (clean /
    noise / noisy / score / x_T / reconstructed mean / residuals) the
    reference's prior_tests2 plots (model.py:900-955).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..transforms import pad_spec


def get_prior(model, variables, y_wav, x_wav, key: Optional[jax.Array] = None,
              T: float = 1.0):
    """Prior-sampling diagnostics (functional twin of model.py:959-1011).

    Returns dict of numpy arrays: mean_pred, clean, noisy, residual, z, score,
    noise (all [F, T] complex spectrograms).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    y_wav = jnp.asarray(y_wav)
    x_wav = jnp.asarray(x_wav)

    norm_factor = jnp.max(jnp.abs(y_wav))
    y = y_wav / norm_factor
    x = x_wav / norm_factor

    Y = pad_spec(model._forward_transform(model._stft(y))[:, None])
    X = pad_spec(model._forward_transform(model._stft(x))[:, None])
    Ns = Y - X

    sde = model.sde.replace(**(
        {"T_sampling": T} if hasattr(model.sde, "T_sampling") else {"T_": T}
    ))
    Yt, z = sde.prior_sampling(key, Y)
    vec_t = jnp.full((Y.shape[0],), 1.0) * T

    grad, _ = model.forward(variables, Yt, vec_t, Y)
    std = sde._std(vec_t)

    mp = Yt + grad * (std[:, None, None, None] ** 2).astype(Yt.dtype)
    z_n = z / std[:, None, None, None].astype(z.dtype)
    res = z_n + grad

    sq = lambda a: np.asarray(a)[0, 0]
    return {
        "mean_pred": sq(mp),
        "clean": sq(X),
        "noisy": sq(Y),
        "residual": sq(res),
        "z": sq(z_n),
        "score": sq(grad),
        "noise": sq(Ns),
        "x_T": sq(Yt),
    }


def prior_panel(model, variables, y_wav, x_wav, out_path: str = "prior_debug.png",
                key: Optional[jax.Array] = None, T: float = 1.0) -> str:
    """Save the 3x3 diagnostic panel (model.py:900-955). Returns out_path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = get_prior(model, variables, y_wav, x_wav, key=key, T=T)

    def db(a):
        return 20 * np.log10(np.abs(a) + 1e-9)

    panels = [
        ("Clean", d["clean"]),
        ("environmental noise", d["noise"]),
        ("noisy mixture", d["noisy"]),
        ("predicted score", d["score"]),
        ("yT = y + z*sigma(T)", d["x_T"]),
        ("mean = yT + score*sigma(T)^2", d["mean_pred"]),
        ("score + z/sigma(T)", d["residual"]),
        ("recon mean - noisy", d["mean_pred"] - d["noisy"]),
        ("z/sigma(T)", d["z"]),
    ]
    fig, axs = plt.subplots(3, 3, figsize=(10, 9), sharex=True, sharey=True)
    for ax, (title, a) in zip(axs.ravel(), panels):
        im = ax.imshow(db(a), aspect="auto", vmin=-30, vmax=30, origin="lower",
                       cmap="magma")
        ax.set_title(title, fontsize=8)
    fig.colorbar(im, ax=axs.ravel().tolist(), shrink=0.5)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
