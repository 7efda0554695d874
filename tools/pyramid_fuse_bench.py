#!/usr/bin/env python
"""Measure the output-pyramid chain (GN+SiLU+conv3x3 C->4) as XLA vs the
fused Pallas kernel, streaming K distinct inputs in one jit (no loop carry)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

B,H,W,C,CO,K = 16,256,64,128,4,6
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.standard_normal((B,H,W,C)).astype(np.float32)).astype(jnp.bfloat16) for _ in range(K)]
gs = jnp.asarray(1+0.1*rng.standard_normal(C).astype(np.float32))
gb = jnp.asarray(0.1*rng.standard_normal(C).astype(np.float32))
wk = jnp.asarray(0.05*rng.standard_normal((3,3,C,CO)).astype(np.float32))
bt = jnp.zeros((B,CO), jnp.float32)
gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.bfloat16)
gnv = {"params": {"scale": gs, "bias": gb}}

def xla_one(h):
    hh = jax.nn.silu(gn.apply(gnv, h))
    o = jax.lax.conv_general_dilated(hh, wk.astype(jnp.bfloat16), (1,1), 'SAME',
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32)
    return jnp.mean(o)

def pal_one(h):
    o = groupnorm_silu_conv3x3_pallas(h, gs, gb, wk, bt, num_groups=32,
                                      compute_dtype=jnp.bfloat16)
    return jnp.mean(o.astype(jnp.float32))

for name, one in (("xla", xla_one), ("pallas", pal_one)):
    f = jax.jit(lambda *hs: sum(one(h) for h in hs))
    v = f(*xs); v.block_until_ready()
    best = 1e9
    for _ in range(6):
        t0=time.time(); f(*xs).block_until_ready(); best=min(best,time.time()-t0)
    per = best/K
    gbs = (B*H*W*C*2)/per/1e9
    print(f"{name:6s}: {per*1e6:7.0f} us/op  ({gbs:.0f} GB/s input-stream)  val={float(v):.5f}")
