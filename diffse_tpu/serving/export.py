"""AOT export of the fused enhancement program (jax.export / StableHLO).

Serializes the exact program ``ScoreModel.enhance`` runs — normalize -> STFT
-> sampler (60-NFE PC scan or 1-NFE consistency) -> iSTFT, one XLA
computation — into a portable on-disk artifact:

    artifact_dir/
      enhance.jaxexport   serialized StableHLO + calling convention
      weights.npz         flattened variables (path-keyed numpy arrays)
      meta.json           shapes / branch / width bucket / host pad contract

Deployment then needs only ``jax`` + this directory: :func:`load_artifact`
returns a callable with NO dependency on the diffse_tpu model code — the
network, the sampler loop, and the STFT/iSTFT all live inside the serialized
program. Artifacts are lowered for both ``tpu`` and ``cpu`` by default (the
program is pure XLA ops; the optional in-model Pallas kernels are off by
default — DEVNOTES).

The torch reference has no deployment story beyond pickled Lightning
checkpoints that require the full source tree to unpickle
(/root/reference/sgmse-bbed/eval.py:94-97); this is the TPU-native
compile-once/ship-the-program equivalent.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

ARTIFACT_FILE = "enhance.jaxexport"
WEIGHTS_FILE = "weights.npz"
META_FILE = "meta.json"
_SEP = "::"  # path separator for flattened weight keys (layer names contain /)


def _flatten_variables(tree, prefix=()):
    """Nested-dict pytree -> {path-string: numpy leaf} (sorted, stable)."""
    out = {}
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict):
            out.update(_flatten_variables(v, prefix + (k,)))
        else:
            out[_SEP.join(prefix + (k,))] = np.asarray(v)
    return out


def _unflatten_variables(flat):
    """Inverse of :func:`_flatten_variables`."""
    tree: dict = {}
    for path, leaf in flat.items():
        parts = path.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _bucket(t_orig: int, hop_length: int) -> Tuple[int, int]:
    """(t_pad frames, pad_samples): the SAME width bucket ScoreModel.enhance
    uses — one shared definition (transforms.width_bucket)."""
    from ..transforms import width_bucket

    return width_bucket(t_orig, hop_length)


def export_enhance(
    model,
    variables,
    branch: str,
    utt_samples: int,
    n_steps: int = 30,
    predictor: str = "reverse_diffusion",
    corrector: str = "ald",
    corrector_steps: int = 1,
    oracle: bool = False,
    platforms: Sequence[str] = ("tpu", "cpu"),
):
    """Export the bucket-static enhance program as a ``jax.export.Exported``.

    The exported function's signature (all array args):
      (variables, x_wav [1, pad_samples] f32, y_wav [1, pad_samples] f32,
       seed [] i32, est_snr [] f32, snr [] f32) -> (x_hat [1, pad'], nfe [])
    The PRNG key is built inside from ``seed`` so the calling convention has
    no typed-key arrays.
    """
    import jax
    from jax import export as jexport

    t_pad, pad_samples = _bucket(utt_samples, model.cfg.hop_length)
    fn = model._enhance_jit(
        branch, t_pad, n_steps, predictor, corrector, corrector_steps, oracle
    )

    def seeded(variables, x_wav, y_wav, seed, est_snr, snr):
        key = jax.random.PRNGKey(seed)
        return fn(variables, x_wav, y_wav, key, est_snr, snr)

    var_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables,
    )
    wav = jax.ShapeDtypeStruct((1, pad_samples), np.dtype("float32"))
    scalar_i = jax.ShapeDtypeStruct((), np.dtype("int32"))
    scalar_f = jax.ShapeDtypeStruct((), np.dtype("float32"))
    exported = jexport.export(jax.jit(seeded), platforms=list(platforms))(
        var_shapes, wav, wav, scalar_i, scalar_f, scalar_f
    )
    return exported, dict(t_pad=t_pad, pad_samples=pad_samples)


def save_artifact(
    path: str,
    model,
    variables,
    branch: str,
    utt_samples,
    n_steps: int = 30,
    predictor: str = "reverse_diffusion",
    corrector: str = "ald",
    corrector_steps: int = 1,
    oracle: bool = False,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> dict:
    """Export + serialize the program(s), weights, and host contract to
    ``path``. ``utt_samples`` may be an int or a sequence of ints — one
    exported program per distinct width bucket; the loader serves each
    utterance with the smallest bucket that fits (the same bucketing contract
    as ``ScoreModel.enhance``, so a mixed-length fleet needs no recompiles)."""
    lengths = ([utt_samples] if isinstance(utt_samples, (int, np.integer))
               else list(utt_samples))
    os.makedirs(path, exist_ok=True)
    buckets = []
    seen_tpad = set()
    for us in sorted(int(v) for v in lengths):
        # dedupe BEFORE the expensive trace+lowering: two requested lengths
        # often fall into the same 64-frame bucket
        if _bucket(us, model.cfg.hop_length)[0] in seen_tpad:
            continue
        exported, bucket = export_enhance(
            model, variables, branch, us, n_steps=n_steps,
            predictor=predictor, corrector=corrector,
            corrector_steps=corrector_steps, oracle=oracle,
            platforms=platforms,
        )
        seen_tpad.add(bucket["t_pad"])
        fname = f"enhance_t{bucket['t_pad']}.jaxexport"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(exported.serialize())
        buckets.append({"t_pad_frames": bucket["t_pad"],
                        "pad_samples": bucket["pad_samples"],
                        "file": fname})
    np.savez(os.path.join(path, WEIGHTS_FILE), **_flatten_variables(variables))
    meta = {
        "branch": branch,
        "n_steps": n_steps,
        "predictor": predictor,
        "corrector": corrector,
        "corrector_steps": corrector_steps,
        "oracle": oracle,
        "platforms": list(platforms),
        "buckets": buckets,
        # single-bucket convenience mirrors (back-compat with early artifacts)
        "pad_samples": buckets[-1]["pad_samples"],
        "t_pad_frames": buckets[-1]["t_pad_frames"],
        "hop_length": model.cfg.hop_length,
        "sample_rate": 16000,
        "model_type": model.cfg.model_type,
        "snr_conditioned": model.cfg.snr_conditioned,
    }
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_artifact(path: str):
    """Load an artifact directory into a framework-free enhance callable.

    Returns ``(enhance, meta)`` where
    ``enhance(y_wav [T], seed=0, x_wav=None, est_snr=1.0, snr=0.5) -> [T]``
    performs the same host pad/trim contract as ``ScoreModel.enhance`` and
    runs the deserialized program under ``jax.jit``. Only ``jax`` + ``numpy``
    are required — no diffse_tpu model code.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    buckets = meta.get("buckets") or [
        {"pad_samples": meta["pad_samples"],
         "t_pad_frames": meta["t_pad_frames"], "file": ARTIFACT_FILE}
    ]
    buckets = sorted(buckets, key=lambda b: b["pad_samples"])
    calls = []
    for b in buckets:
        with open(os.path.join(path, b["file"]), "rb") as f:
            exported = jexport.deserialize(bytearray(f.read()))
        calls.append((int(b["pad_samples"]), jax.jit(exported.call)))
    with np.load(os.path.join(path, WEIGHTS_FILE)) as z:
        variables = _unflatten_variables({k: z[k] for k in z.files})
    # upload the weights ONCE — per-request host->device transfer of the
    # whole parameter set would dominate serving latency
    variables = jax.device_put(variables)
    hop = int(meta["hop_length"])

    def enhance(
        y_wav,
        seed: int = 0,
        x_wav: Optional[np.ndarray] = None,
        est_snr: float = 1.0,
        snr: float = 0.5,
    ):
        y_wav = np.asarray(y_wav, dtype=np.float32).reshape(-1)
        t_orig = y_wav.shape[-1]
        if t_orig == 0:
            raise ValueError("empty waveform")
        # Bucket by the enhance contract (width_bucket), not by raw length:
        # when frames % 64 == 0 the bucket is up to hop-1 samples SHORTER
        # than the utterance and the input is truncated (exactly what
        # ScoreModel.enhance does, models/score_model.py:689-694).
        needed = _bucket(t_orig, hop)[1]
        pad_samples = call = None
        for ps, c in calls:  # smallest bucket that fits
            if needed <= ps:
                pad_samples, call = ps, c
                break
        if call is None:
            raise ValueError(
                f"utterance of {t_orig} samples exceeds this artifact's "
                f"largest bucket ({calls[-1][0]}); export a wider bucket"
            )
        x_in = y_wav if x_wav is None else np.asarray(
            x_wav, dtype=np.float32).reshape(-1)
        yb = np.zeros((1, pad_samples), np.float32)
        xb = np.zeros((1, pad_samples), np.float32)
        yb[0, : min(t_orig, pad_samples)] = y_wav[:pad_samples]
        xb[0, : min(x_in.shape[-1], pad_samples)] = x_in[:pad_samples]
        x_hat, _nfe = call(
            variables, xb, yb, jnp.int32(seed),
            jnp.float32(est_snr), jnp.float32(snr),
        )
        x_hat = np.asarray(x_hat)[0, :t_orig]
        if x_hat.shape[-1] < t_orig:  # frames%64==0 bucket tail (enhance parity)
            x_hat = np.pad(x_hat, (0, t_orig - x_hat.shape[-1]))
        return x_hat

    return enhance, meta


class ArtifactService:
    """``EnhanceService``-compatible facade over an AOT artifact directory —
    the deployment-side server: per-request single-utterance enhancement from
    the serialized program, no model code and no dynamic batching. ``*_snr``
    artifacts have no estimator inside; clients supply ``est_snr``
    (``?est_snr=`` on the HTTP front end), else 1.0.
    """

    def __init__(self, path: str, seed: int = 0):
        import threading
        import time as _time

        self._enhance, self.meta = load_artifact(path)
        self._seed = seed
        self._lock = threading.Lock()
        self._time = _time
        self._stats = {"requests": 0, "audio_seconds": 0.0,
                       "wall_seconds": 0.0, "errors": 0}

    def enhance(self, y_wav, est_snr=None, timeout=None):
        t0 = self._time.monotonic()
        with self._lock:
            seed = self._seed
            self._seed += 1
        try:
            out = self._enhance(
                y_wav, seed=seed,
                est_snr=1.0 if est_snr is None else float(est_snr),
            )
        except Exception:
            with self._lock:
                self._stats["errors"] += 1
            raise
        wall = self._time.monotonic() - t0
        with self._lock:
            self._stats["requests"] += 1
            self._stats["audio_seconds"] += np.size(y_wav) / 16000.0
            self._stats["wall_seconds"] += wall
        return out

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
        s["rtf_x_realtime"] = (
            s["audio_seconds"] / s["wall_seconds"] if s["wall_seconds"] else 0.0
        )
        s["buckets"] = [b["pad_samples"] for b in self.meta.get("buckets", [])]
        s["branch"] = self.meta.get("branch")
        return s

    def close(self, timeout: float = 0.0) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
