#!/usr/bin/env python
"""One process of a REAL multi-process ``jax.distributed`` data-parallel run.

The reference's DDP is a multi-process system (Lightning forks one process
per GPU and all-reduces grads over NCCL, sgmse-bbed/train.py:108). The
TPU-native twin is: every process calls ``jax.distributed.initialize`` (here
via :func:`diffse_tpu.parallel.initialize_distributed`), builds ONE global
mesh over all processes' devices, and runs the SAME jitted train step — GSPMD
inserts the cross-process gradient all-reduce (gloo on CPU, ICI/DCN on TPU
pods).

This worker executes that end to end on the CPU backend so the multi-process
path can be exercised without a TPU pod (tests/test_parallel.py spawns two of
these against a localhost coordinator and asserts the loss equals the
single-process value):

  XLA_FLAGS=--xla_force_host_platform_device_count=2 JAX_PLATFORMS=cpu \\
  python tools/distributed_worker.py --coordinator localhost:9876 \\
      --num_processes 2 --process_id 0 --out /tmp/p0.json

Every process writes ``{loss, param_sum, num_devices, process_count}`` to
``--out``. All model/batch construction is deterministic host-side numpy, so
any two processes (and a single-process reference) agree exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_BACKBONE = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), image_size=16)


def build_model():
    """The tiny flagship-branch ScoreModel used by the multi-process check
    (identical on every process: host-side deterministic init)."""
    import jax
    import optax

    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
    from diffse_tpu.train import create_train_state

    cfg = ScoreModelConfig(backbone="ncsnpp", sde="bbed",
                           snr_conditioned="true", model_type="sebridge_v3",
                           fixed_snr=0.17783, sigma_max=1.0)
    model = ScoreModel(cfg, backbone_kwargs=TINY_BACKBONE,
                       sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52,
                                       N=30))
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=16,
                                     num_freq_bins=16)
    opt = optax.adam(1e-4)
    state = create_train_state(variables, opt)
    return model, opt, state


def build_batch(b=4, f=16, t=16, seed=1234):
    """Deterministic complex (X, Y) batch from host numpy (no device RNG, so
    every process and the single-process reference see identical bytes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((b, 1, f, t)) +
         1j * rng.standard_normal((b, 1, f, t))).astype(np.complex64)
    n = (rng.standard_normal((b, 1, f, t)) +
         1j * rng.standard_normal((b, 1, f, t))).astype(np.complex64)
    return x, (x + 0.3 * n).astype(np.complex64)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", required=True,
                        help="host:port of process 0's coordination service")
    parser.add_argument("--num_processes", type=int, required=True)
    parser.add_argument("--process_id", type=int, required=True)
    parser.add_argument("--out", default=None, help="JSON result path")
    parser.add_argument("--init_timeout", type=float, default=300.0,
                        help="coordination-service registration timeout (s); "
                             "raise on oversubscribed hosts where process "
                             "startup is slow")
    parser.add_argument("--batch", type=int, default=4,
                        help="global batch size (must divide over the global "
                             "device count)")
    parser.add_argument("--steps", type=int, default=1,
                        help=">1 runs a multi-step training loop with the "
                             "coordinated preemption guard: a SIGTERM on ANY "
                             "process stops EVERY process at the same step "
                             "boundary (per-step all-reduced stop flag — the "
                             "pattern that keeps surviving workers out of a "
                             "dead worker's collective), then process 0 "
                             "checkpoints")
    parser.add_argument("--ckpt", default=None,
                        help="checkpoint file (.npz) written by process 0 on "
                             "preemption or completion of a --steps run")
    parser.add_argument("--resume", action="store_true",
                        help="load --ckpt before stepping and continue from "
                             "its recorded step")
    parser.add_argument("--progress_file", default=None,
                        help="process 0 appends the completed-step index "
                             "here after every step (lets a test synchronize "
                             "an external SIGTERM with training progress)")
    args = parser.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from diffse_tpu.parallel import initialize_distributed

    # The real thing: coordination service handshake across processes.
    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        initialization_timeout=int(args.init_timeout),
    )
    assert jax.process_count() == args.num_processes, (
        jax.process_count(), args.num_processes)
    print(f"[dist p{args.process_id}] process_count={jax.process_count()} "
          f"local={len(jax.local_devices())} global={len(jax.devices())}",
          flush=True)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffse_tpu.parallel import make_mesh
    from diffse_tpu.train import make_train_step

    model, opt, state = build_model()

    mesh = make_mesh()  # 1-D 'data' mesh over ALL processes' devices
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))

    def globalize(a, sh):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx, a=a: a[idx])

    leaves, treedef = jax.tree_util.tree_flatten(state)
    start_step = 0
    if args.resume and args.ckpt and os.path.exists(args.ckpt):
        data = np.load(args.ckpt)
        start_step = int(data["__step__"])
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        print(f"[dist p{args.process_id}] resumed from {args.ckpt} "
              f"at step {start_step}", flush=True)

    # Host-local (identical) values -> global arrays: state/key replicated,
    # batch sharded on the global batch axis.
    state_g = jax.tree_util.tree_map(lambda a: globalize(a, rep), state)
    step = make_train_step(model, opt, mesh=mesh, donate=False)

    def save_ckpt(state_arr, at_step):
        if args.process_id != 0 or not args.ckpt:
            return
        host = {f"leaf_{i}": np.asarray(leaf.addressable_data(0))
                for i, leaf in enumerate(
                    jax.tree_util.tree_leaves(state_arr))}
        host["__step__"] = np.asarray(at_step)
        tmp = args.ckpt + ".tmp.npz"
        np.savez(tmp, **host)
        os.replace(tmp, args.ckpt)
        print(f"[dist p0] checkpointed step {at_step} -> {args.ckpt}",
              flush=True)

    # Per-step coordinated stop: each process contributes its local SIGTERM
    # flag (one scalar per local device), a tiny jitted max all-reduces it —
    # so every process leaves the loop at the SAME step boundary and no
    # survivor blocks inside a dead worker's collective.
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    flag_sh = NamedSharding(mesh, P("data"))

    def all_any(local_flag: bool) -> bool:
        a = np.full((n_local,), 1.0 if local_flag else 0.0, np.float32)
        arr = jax.make_array_from_callback(
            (n_global,), flag_sh, lambda idx, a=a: a[: idx[0].stop - idx[0].start])
        out = jax.jit(jnp.max, out_shardings=rep)(arr)
        return bool(np.asarray(out.addressable_data(0)) > 0.5)

    from diffse_tpu.train.loop import _PreemptionGuard

    guard = _PreemptionGuard()
    preempted_at = None
    loss = float("nan")
    with guard:
        for i in range(start_step, args.steps):
            x, y = build_batch(b=args.batch, seed=1234 + i)
            batch_g = (globalize(x, dat), globalize(y, dat))
            key_g = globalize(jax.random.PRNGKey(2 + i), rep)
            state_g, metrics = step(state_g, batch_g, key_g)
            loss = float(np.asarray(metrics["train_loss"].addressable_data(0)))
            done = i + 1
            if args.progress_file and args.process_id == 0:
                with open(args.progress_file, "a") as f:
                    f.write(f"{done}\n")
            if args.steps > 1 and all_any(guard.triggered):
                preempted_at = done
                print(f"[dist p{args.process_id}] coordinated stop at step "
                      f"{done} (SIGTERM seen by some process)", flush=True)
                save_ckpt(state_g, done)
                break
    if preempted_at is None and args.steps > 1:
        save_ckpt(state_g, args.steps)

    # params come out replicated -> every process sees the full updated tree
    param_sum = float(sum(
        np.abs(np.asarray(leaf.addressable_data(0))).sum()
        for leaf in jax.tree_util.tree_leaves(state_g.variables["params"])
    ))
    result = dict(loss=loss, param_sum=param_sum,
                  num_devices=len(jax.devices()),
                  process_count=jax.process_count(),
                  process_id=args.process_id,
                  preempted_at=preempted_at)
    print(f"[dist p{args.process_id}] RESULT {json.dumps(result)}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
