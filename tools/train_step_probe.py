#!/usr/bin/env python
"""Bound the TPU train-step anomaly: step time vs device state size/outputs.

Round 2 measured ~45-75 s/step for the 65M Adam+EMA train step on the axon
bridge — orders beyond the ~50 ms FLOP estimate — and hypothesized a bridge
execution artifact for state-heavy programs (~780 MB of params+EMA+Adam in
and out per call). This probe turns the hypothesis into a measurement: it
times a train step over the SAME loss/grad computation while varying (a) the
device state size (sgd: params only / adam: +2x moments / adam_ema: the
production TrainState with EMA) and model scale (nf), and (b) what the host
fetches per step (the loss scalar vs nothing), with buffer donation on.

If step time scales with state bytes (and not with fetched outputs or
FLOPs), the bridge-transfer theory holds and real-TPU throughput can be
projected as flops_time + state_bytes/HBM_bw; if not, the program is at
fault and must be fixed. (Reference baseline being matched: the Lightning
DDP loop, /root/reference/sgmse-bbed/train.py:105-125.)

One variant per invocation (subprocess-isolate risky compiles):

    python tools/train_step_probe.py <nf> <opt> [fetch] [steps]
      nf:    16 | 32 | 128  (128 = production 65M)
      opt:   sgd | adam | adam_ema
      fetch: metrics (default) | none
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nf = int(sys.argv[1])
    opt_name = sys.argv[2]
    fetch = sys.argv[3] if len(sys.argv) > 3 else "metrics"
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
    from diffse_tpu.train import create_train_state, make_train_step

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="sebridge_v3",
        snr_conditioned="true", fixed_snr=0.17783, sigma_max=1.0,
        num_frames=64,
    )
    bk = {} if nf == 128 else dict(
        nf=nf, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
        attn_resolutions=(16,), image_size=256,
    )
    model = ScoreModel(
        cfg, backbone_kwargs=bk,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )

    print(f"[tsp nf{nf} {opt_name} {fetch}] init on cpu...",
          file=sys.stderr, flush=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init_variables(jax.random.PRNGKey(0),
                                         num_frames=cfg.num_frames)

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    audio_len = (cfg.num_frames - 1) * cfg.hop_length
    b = 8

    def make_batch(i):
        x = rng.standard_normal((b, audio_len)).astype(np.float32) * 0.1
        y = (x + rng.standard_normal((b, audio_len)).astype(np.float32) * 0.03)
        return jnp.asarray(x), jnp.asarray(y)

    if opt_name == "adam_ema":
        # exact production configuration (the round-2 anomaly config)
        optimizer = optax.adam(cfg.lr)
        state = create_train_state(variables, optimizer)
        state = jax.device_put(state, dev)
        step_inner = make_train_step(model, optimizer, ema_decay=cfg.ema_decay,
                                     donate=True,
                                     preprocess=model.prepare_batch)

        def fn(state, xw, yw, key):  # already jitted inside make_train_step
            return step_inner(state, (xw, yw), key)
    else:
        optimizer = optax.sgd(cfg.lr) if opt_name == "sgd" else optax.adam(cfg.lr)
        params = variables["params"]
        state = (params, optimizer.init(params), jnp.zeros((), jnp.int32))
        state = jax.device_put(state, dev)

        def fn(state, xw, yw, key):
            params, opt_state, step = state
            batch = model.prepare_batch((xw, yw))

            def loss_fn(p):
                loss, _ = model.loss_fn({"params": p}, batch, key, train=True)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, step + 1), {"train_loss": loss}

        fn = jax.jit(fn, donate_argnums=(0,))

    jax.block_until_ready(state)
    state_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(state)
        if hasattr(l, "shape")
    )
    print(f"[tsp] device state: {state_bytes / 1e6:.0f} MB",
          file=sys.stderr, flush=True)

    print("[tsp] compiling...", file=sys.stderr, flush=True)
    t0 = time.time()
    xw, yw = make_batch(0)
    state, metrics = fn(state, xw, yw, jax.random.PRNGKey(1))
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    print(f"[tsp] compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)

    times = []
    for i in range(n_steps):
        xw, yw = make_batch(i + 1)
        t0 = time.time()
        state, metrics = fn(state, xw, yw, jax.random.PRNGKey(2 + i))
        if fetch == "metrics":
            float(metrics["train_loss"])  # host fetch of the scalar
        else:
            leaf = jax.tree_util.tree_leaves(state)[0]
            leaf.block_until_ready()  # sync without fetching tensors
        times.append(time.time() - t0)
    jax.block_until_ready(state)

    print("TSP " + json.dumps({
        "nf": nf, "opt": opt_name, "fetch": fetch, "batch": b,
        "state_mb": round(state_bytes / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "step_s_min": round(min(times), 3),
        "step_s_median": round(sorted(times)[len(times) // 2], 3),
        "steps": n_steps,
    }), flush=True)


if __name__ == "__main__":
    main()
