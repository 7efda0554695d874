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


def build_batch(b=4, f=16, t=16):
    """Deterministic complex (X, Y) batch from host numpy (no device RNG, so
    every process and the single-process reference see identical bytes)."""
    import numpy as np

    rng = np.random.default_rng(1234)
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

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffse_tpu.parallel import make_mesh
    from diffse_tpu.train import make_train_step

    model, opt, state = build_model()
    x, y = build_batch()

    mesh = make_mesh()  # 1-D 'data' mesh over ALL processes' devices
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))

    def globalize(a, sh):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx, a=a: a[idx])

    # Host-local (identical) values -> global arrays: state/key replicated,
    # batch sharded on the global batch axis.
    state_g = jax.tree_util.tree_map(lambda a: globalize(a, rep), state)
    batch_g = (globalize(x, dat), globalize(y, dat))
    key_g = globalize(jax.random.PRNGKey(2), rep)

    step = make_train_step(model, opt, mesh=mesh, donate=False)
    new_state, metrics = step(state_g, batch_g, key_g)

    loss = float(np.asarray(metrics["train_loss"].addressable_data(0)))
    # params come out replicated -> every process sees the full updated tree
    param_sum = float(sum(
        np.abs(np.asarray(leaf.addressable_data(0))).sum()
        for leaf in jax.tree_util.tree_leaves(new_state.variables["params"])
    ))
    result = dict(loss=loss, param_sum=param_sum,
                  num_devices=len(jax.devices()),
                  process_count=jax.process_count(),
                  process_id=args.process_id)
    print(f"[dist p{args.process_id}] RESULT {json.dumps(result)}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
