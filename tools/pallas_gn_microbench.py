#!/usr/bin/env python
"""Micro-benchmark: compiled Pallas GroupNorm+SiLU vs the XLA jnp chain at the
production NCSN++ level-0 shape. Run standalone on TPU (subprocess-safe).

Usage: python tools/pallas_gn_microbench.py [B] [H] [W] [C] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffse_tpu.ops.pallas_kernels import _groupnorm_silu_jnp, groupnorm_silu_pallas


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    dtype = jnp.bfloat16 if (len(sys.argv) > 5 and sys.argv[5] == "bf16") else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    g = min(c // 4, 32)

    # Chain ITERS applications inside ONE jit: per-call dispatch through the
    # axon tunnel costs ~1 ms, which would swamp a single kernel launch.
    ITERS = 50

    def chain(op):
        def run(x):
            def body(i, h):
                return op(h) * 0.999  # keep values bounded across the chain
            import jax.lax as lax
            return lax.fori_loop(0, ITERS, body, x)
        return jax.jit(run)

    pallas_one = jax.jit(lambda x: groupnorm_silu_pallas(x, scale, bias, num_groups=g))
    jnp_one = jax.jit(lambda x: _groupnorm_silu_jnp(x, scale, bias, g, 1e-6, True))
    out_p = pallas_one(x)
    out_j = jnp_one(x)
    jax.block_until_ready((out_p, out_j))
    err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) - out_j.astype(jnp.float32))))

    pallas_fn = chain(lambda h: groupnorm_silu_pallas(h, scale, bias, num_groups=g))
    jnp_fn = chain(lambda h: _groupnorm_silu_jnp(h, scale, bias, g, 1e-6, True))

    def timeit(fn, n=5):
        fn(x).block_until_ready()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn(x).block_until_ready()
            best = min(best, time.time() - t0)
        return best / ITERS

    tp = timeit(pallas_fn)
    tj = timeit(jnp_fn)
    nbytes = x.size * x.dtype.itemsize
    print(
        f"shape=({b},{h},{w},{c}) dtype={x.dtype} max|diff|={err:.3e}\n"
        f"pallas: {tp*1e6:.0f} us  ({2*nbytes/tp/1e9:.0f} GB/s rw)\n"
        f"jnp   : {tj*1e6:.0f} us  ({2*nbytes/tj/1e9:.0f} GB/s rw)\n"
        f"speedup: {tj/tp:.2f}x"
    )


if __name__ == "__main__":
    main()
