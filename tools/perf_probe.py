#!/usr/bin/env python
"""One-off TPU perf probe: measure the fused 30-step BBED enhance program at a
given (batch, num_frames) shape. Run in a subprocess (compiles can poison the
PJRT client). Prints one PROBE json line.

Usage: python tools/perf_probe.py <batch> <num_frames> [nfe] [dtype]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1])
    num_frames = int(sys.argv[2])
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    dtype = sys.argv[4] if len(sys.argv) > 4 else None
    if dtype in ("f32", "float32", "none"):
        dtype = None
    extra_kwargs = {}
    for kv in sys.argv[5:]:
        k, v = kv.split("=")
        if v in ("true", "false"):
            v = v == "true"
        elif not k.startswith("copt:"):
            try:
                v = int(v)
            except ValueError:
                pass
        extra_kwargs[k] = v

    import jax

    if extra_kwargs.pop("prng", None) == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    unroll = int(extra_kwargs.pop("unroll", 1))
    pipes = int(extra_kwargs.pop("pipes", 5))
    peel = extra_kwargs.pop("peel", True)
    # fetch=1: time a full host fetch of the output instead of trusting
    # block_until_ready, and print the output norm. Needed for programs
    # containing pallas custom-calls: the axon bridge's block_until_ready
    # returns immediately for them (measured 0.3 ms "wall" on a 60-NFE
    # program), so only a value round-trip gives a true sync point.
    fetch = int(extra_kwargs.pop("fetch", 0))
    # copt:<flag>=<value> args become per-compile XLA compiler_options —
    # the axon terminal forwards proto-backed xla_* flags per compile even
    # though env XLA_FLAGS are rejected client-side.
    compiler_options = {
        k[len("copt:"):]: v for k, v in list(extra_kwargs.items())
        if k.startswith("copt:")
    }
    for k in list(extra_kwargs):
        if k.startswith("copt:"):
            extra_kwargs.pop(k)

    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
    from diffse_tpu.sampling import get_pc_sampler
    from diffse_tpu.transforms import pad_spec

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="bbed",
        snr_conditioned="false", sigma_max=0.5,
    )
    bk = dict(extra_kwargs)
    if dtype:
        bk["dtype"] = dtype
    model = ScoreModel(
        cfg, backbone_kwargs=bk,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=n_steps),
    )

    rng = np.random.default_rng(0)
    audio_len = (num_frames - 1) * cfg.hop_length
    y_wav = jnp.asarray(rng.standard_normal((batch, audio_len)).astype(np.float32) * 0.1)

    print(f"[probe b{batch} t{num_frames}] init on cpu...", file=sys.stderr, flush=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init_variables(jax.random.PRNGKey(0), num_frames=num_frames)
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)

    score_fn = lambda x_, t_, y_: model.forward(variables, x_, t_, y_)[0]

    def enhance_batch(y_wav, key):
        norm = jnp.max(jnp.abs(y_wav), axis=-1, keepdims=True)
        Y = pad_spec(model._forward_transform(model._stft(y_wav / norm))[:, None])
        sampler = get_pc_sampler(
            "reverse_diffusion", "ald", sde=model.sde, score_fn=score_fn, Y=Y,
            denoise=True, eps=cfg.t_eps, snr=0.5, corrector_steps=1,
            unroll=unroll, peel_last=peel,
        )
        sample, _ = sampler(key)
        return model.to_audio(sample[:, 0]) * norm

    fn = jax.jit(enhance_batch)
    print(f"[probe b{batch} t{num_frames}] compiling...", file=sys.stderr, flush=True)
    t0 = time.time()
    if compiler_options:
        print(f"[probe] compiler_options: {compiler_options}", file=sys.stderr,
              flush=True)
        compiled = fn.lower(y_wav, jax.random.PRNGKey(1)).compile(
            compiler_options=compiler_options
        )
        fn = lambda y, k: compiled(y, k)
    fn(y_wav, jax.random.PRNGKey(1)).block_until_ready()
    compile_s = time.time() - t0

    flops = None
    try:
        cost = fn.lower(y_wav, jax.random.PRNGKey(1)).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"[probe] cost_analysis unavailable: {e}", file=sys.stderr, flush=True)
    print(f"[probe] compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)

    fetch_extra = {}
    if fetch:
        # warm fetch (host round-trip path initialization), then timed
        v = np.asarray(fn(y_wav, jax.random.PRNGKey(200)))
        ft = []
        for i in range(3):
            t0 = time.time()
            v = np.asarray(fn(y_wav, jax.random.PRNGKey(201 + i)))
            ft.append(time.time() - t0)
        fetch_extra = {
            "wall_s_fetch": round(min(ft), 4),
            "out_norm": float(np.linalg.norm(v)),
            "out_finite": bool(np.all(np.isfinite(v))),
        }
        print(f"[probe] fetch wall {min(ft):.4f}s norm "
              f"{fetch_extra['out_norm']:.4f} finite "
              f"{fetch_extra['out_finite']}", file=sys.stderr, flush=True)

    times = []
    for i in range(3):
        t0 = time.time()
        fn(y_wav, jax.random.PRNGKey(2 + i)).block_until_ready()
        times.append(time.time() - t0)
    wall = min(times)

    # pipelined throughput, same methodology as bench.py: `pipes` batches in
    # flight, best of 3 windows
    wall_p = None
    if pipes > 0:
        ROUNDS, WINDOWS = 8, 3
        outs = [fn(y_wav, jax.random.PRNGKey(50 + i)) for i in range(pipes)]
        jax.block_until_ready(outs)
        for wdw in range(WINDOWS):
            t0 = time.time()
            outs = [fn(y_wav, jax.random.PRNGKey(60 + 40 * wdw + i))
                    for i in range(pipes * ROUNDS)]
            jax.block_until_ready(outs)
            w = (time.time() - t0) / (pipes * ROUNDS)
            wall_p = w if wall_p is None else min(wall_p, w)

    audio_seconds = batch * audio_len / 16000
    best = min(wall, wall_p) if wall_p else wall
    print("PROBE " + json.dumps({
        "batch": batch, "num_frames": num_frames, "nfe": 2 * n_steps,
        "dtype": dtype or "float32", "extra": extra_kwargs,
        "peel": bool(peel), "pipes": pipes,
        "xla_flops": flops,
        "tflops_effective": round(flops / best / 1e12, 1) if flops else None,
        "wall_s": round(wall, 4), "rtf_x": round(audio_seconds / wall, 3),
        "wall_s_pipelined": round(wall_p, 4) if wall_p else None,
        "rtf_x_pipelined": round(audio_seconds / wall_p, 3) if wall_p else None,
        "compile_s": round(compile_s, 1),
        "utt_per_s": round(batch / best, 3),
        **fetch_extra,
    }), flush=True)


if __name__ == "__main__":
    main()
