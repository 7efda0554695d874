#!/usr/bin/env python
"""Benchmark: full 30-step BBED reverse-SDE enhancement throughput on TPU.

Measures the headline BASELINE.json metric — real-time factor for enhancing
VBD-style utterances with the production NCSN++ (~65M params) at N=30 reverse
steps (reverse_diffusion predictor + ALD corrector, 60 NFE), with the whole
normalize -> STFT -> 30-step lax.scan sampler -> iSTFT pipeline compiled into
ONE XLA program (zero host round-trips; the reference does 60 CUDA launches +
60 scipy-expi CPU round-trips per utterance, sgmse/sdes.py:287-293).

Prints ONE JSON line:
  {"metric": "rtf_x_realtime_bbed_n30", "value": <x realtime per chip>,
   "unit": "x_realtime", "vs_baseline": value / 10.0}
(vs_baseline is relative to the >10x real-time target; >1.0 beats it.)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
from diffse_tpu.sampling import get_pc_sampler
from diffse_tpu.transforms import pad_spec

SR = 16000
BATCH = 4
NUM_FRAMES = 256  # 2.048 s per utterance (the training crop length)
N_STEPS = 30
REPEATS = 3


def main():
    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed", snr_conditioned="false",
        sigma_max=0.5,
    )
    model = ScoreModel(
        cfg, backbone_kwargs={},  # production NCSN++ defaults (~65M params)
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=N_STEPS),
    )

    rng = np.random.default_rng(0)
    audio_len = (NUM_FRAMES - 1) * cfg.hop_length
    y_wav = jnp.asarray(rng.standard_normal((BATCH, audio_len)).astype(np.float32) * 0.1)

    print("initializing params...", file=sys.stderr)
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=NUM_FRAMES)

    def enhance_batch(variables, y_wav, key):
        norm = jnp.max(jnp.abs(y_wav), axis=-1, keepdims=True)
        y = y_wav / norm
        Y = pad_spec(model._forward_transform(model._stft(y))[:, None])
        score_fn = lambda x_, t_, y_: model.forward(variables, x_, t_, y_)[0]
        sampler = get_pc_sampler(
            "reverse_diffusion", "ald", sde=model.sde, score_fn=score_fn, Y=Y,
            denoise=True, eps=cfg.t_eps, snr=0.5, corrector_steps=1,
        )
        sample, _ = sampler(key)
        x_hat = model.to_audio(sample[:, 0])
        return x_hat * norm

    fn = jax.jit(enhance_batch)

    print("compiling (first call)...", file=sys.stderr)
    t0 = time.time()
    out = fn(variables, y_wav, jax.random.PRNGKey(1))
    out.block_until_ready()
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(REPEATS):
        t0 = time.time()
        out = fn(variables, y_wav, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        times.append(time.time() - t0)
    wall = min(times)

    audio_seconds = BATCH * audio_len / SR
    rtf_x = audio_seconds / wall
    utterances_per_sec = BATCH / wall

    result = {
        "metric": "rtf_x_realtime_bbed_n30",
        "value": round(rtf_x, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf_x / 10.0, 3),
        "utterances_per_sec_per_chip": round(utterances_per_sec, 3),
        "batch": BATCH,
        "nfe": 2 * N_STEPS,
        "wall_s_per_batch": round(wall, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
