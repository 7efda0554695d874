"""Backbone tests: shapes/jit/param-counts for NCSN++, NCSN++-SNR, SNRNet, DCUNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models import BackboneRegistry
from diffse_tpu.models.ncsnpp import NCSNpp, NCSNppSNR
from diffse_tpu.models.snrnet import SNRNet
from diffse_tpu.models.dcunet import DCUNet


def _complex_pair(key, b, f, t):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, 2, f, t, 2))
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


TINY = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,), image_size=16)


def test_registry_contains_all_backbones():
    names = set(BackboneRegistry.get_all_names())
    assert {"ncsnpp", "ncsnpp_snr", "snrnet", "dcunet"} <= names


def test_ncsnpp_tiny_forward_shape_and_jit():
    model = NCSNpp(**TINY)
    x = _complex_pair(jax.random.PRNGKey(0), 2, 16, 16)
    t = jnp.asarray([0.5, 0.9])
    params = model.init(jax.random.PRNGKey(1), x, t)
    out = jax.jit(lambda p, x_, t_: model.apply(p, x_, t_))(params, x, t)
    assert out.shape == (2, 1, 16, 16)
    assert out.dtype == jnp.complex64
    assert bool(jnp.all(jnp.isfinite(out.real)))


def test_ncsnpp_tiny_wider_time_axis():
    """Eval-time inputs have T padded to multiples of 64 but H fixed; tiny
    analog: H=16, T=32."""
    model = NCSNpp(**TINY)
    x = _complex_pair(jax.random.PRNGKey(0), 1, 16, 32)
    t = jnp.asarray([0.7])
    params = model.init(jax.random.PRNGKey(1), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 1, 16, 32)


def test_ncsnpp_output_scales_inversely_with_sigma():
    """h is divided by used_sigmas (ncsnpp.py:398): halving t must roughly
    double the 1/sigma factor on an identical trunk input. We check exact
    inverse scaling by comparing two sigma values on the same params/input
    modulo the embedding change — so instead verify the division directly:
    output * t is bounded while output grows as 1/t for small t."""
    model = NCSNpp(**TINY)
    x = _complex_pair(jax.random.PRNGKey(2), 1, 16, 16)
    params = model.init(jax.random.PRNGKey(1), x, jnp.asarray([1.0]))
    out_small = model.apply(params, x, jnp.asarray([1e-3]))
    out_large = model.apply(params, x, jnp.asarray([1.0]))
    assert float(jnp.abs(out_small).mean()) > 50 * float(jnp.abs(out_large).mean())


def test_ncsnpp_full_config_param_count():
    """The production NCSN++ is ~65M params (SURVEY.md L2; reference reports
    ~65M for nf=128, ch_mult=(1,1,2,2,2,2,2))."""
    model = NCSNpp()
    x = jax.ShapeDtypeStruct((1, 2, 256, 256), jnp.complex64)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
    count = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
    assert 55e6 < count < 75e6, f"param count {count}"


def test_ncsnpp_snr_tiny_forward():
    model = NCSNppSNR(**TINY)
    x = _complex_pair(jax.random.PRNGKey(0), 2, 16, 16)
    t = jnp.asarray([0.5, 0.9])
    s = jnp.asarray([0.3, 0.2])
    params = model.init(jax.random.PRNGKey(1), x, t, s)
    out = model.apply(params, x, t, s)
    assert out.shape == (2, 1, 16, 16)
    assert bool(jnp.all(jnp.isfinite(out.real)))


def test_ncsnpp_snr_has_two_embeddings():
    model = NCSNppSNR(**TINY)
    x = _complex_pair(jax.random.PRNGKey(0), 1, 16, 16)
    params = model.init(jax.random.PRNGKey(1), x, jnp.asarray([0.5]), jnp.asarray([0.3]))
    keys = set(params["params"].keys())
    assert "time_embed" in keys and "noise_embed" in keys
    assert "semb_dense_0" in keys and "semb_dense_1" in keys


def test_snrnet_forward_and_param_count():
    model = SNRNet()
    x = jnp.zeros((4, 2, 256, 384))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (4, 1)
    assert bool(jnp.all((out >= 0) & (out <= 1)))
    # torch reference count is 1,261,313 (snrnet.py:99-104); flax LSTM bias
    # bookkeeping differs slightly (torch keeps 2 bias vectors per gate set).
    count = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
    assert abs(count - 1_261_313) < 5000, f"param count {count}"


def test_snrnet_jit_multiple_lengths():
    model = SNRNet()
    x = jnp.zeros((1, 2, 256, 384))
    params = model.init(jax.random.PRNGKey(0), x)
    apply = jax.jit(model.apply)
    for t in (16, 64, 128):
        out = apply(params, jnp.zeros((2, 2, 256, t)))
        assert out.shape == (2, 1)


def test_dcunet_forward():
    """DilDCUNet-v2 needs (F-1) % 8 == 0 and (T-1) % 4 == 0 (auto-padded)."""
    model = DCUNet()
    x = _complex_pair(jax.random.PRNGKey(0), 1, 257, 65)
    t = jnp.asarray([0.5])
    variables = model.init(jax.random.PRNGKey(1), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (1, 1, 257, 65)
    assert out.dtype == jnp.complex64
    assert bool(jnp.all(jnp.isfinite(out.real)))


def test_dcunet_pads_mismatched_time():
    model = DCUNet()
    x = _complex_pair(jax.random.PRNGKey(0), 1, 257, 62)  # (62-1)%4 != 0
    t = jnp.asarray([0.5])
    variables = model.init(jax.random.PRNGKey(1), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (1, 1, 257, 62)


def test_dcunet_batchnorm_train_mode_mutates_stats():
    model = DCUNet()
    x = _complex_pair(jax.random.PRNGKey(0), 2, 257, 33)
    t = jnp.asarray([0.5, 0.7])
    variables = model.init(jax.random.PRNGKey(1), x, t)
    assert "batch_stats" in variables
    out, updates = model.apply(variables, x, t, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 1, 257, 33)
    assert "batch_stats" in updates


def test_ncsnpp_bf16_trunk():
    """bf16 compute dtype: params stay f32, forward stays finite and close to
    the f32 result (MXU half-precision trunk)."""
    m32 = NCSNpp(**TINY)
    m16 = NCSNpp(**TINY, dtype="bf16")
    x = _complex_pair(jax.random.PRNGKey(0), 1, 16, 16)
    t = jnp.asarray([0.5])
    params = m32.init(jax.random.PRNGKey(1), x, t)
    # params are float32 regardless of compute dtype
    assert all(a.dtype == jnp.float32 for a in jax.tree_util.tree_leaves(params))
    out32 = m32.apply(params, x, t)
    out16 = m16.apply(params, x, t)
    assert out16.dtype == jnp.complex64
    assert bool(jnp.all(jnp.isfinite(out16.real)))
    rel = float(jnp.linalg.norm(out16 - out32) / (jnp.linalg.norm(out32) + 1e-9))
    assert rel < 0.1, f"bf16 deviates too much: {rel}"


def test_ncsnpp_bf16_trunk_matches_f32():
    """The bf16 trunk (half-precision activations through the whole U-Net,
    f32 GroupNorm statistics / attention internals / output pyramid) must
    track the f32 forward closely and actually run in bf16."""
    import numpy as np
    from diffse_tpu.models import layers as L

    cfg = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((2, 2, 16, 16))
                     + 1j * rng.standard_normal((2, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.5, 0.9], jnp.float32)

    m32 = NCSNpp(**cfg)
    v = m32.init(jax.random.PRNGKey(0), x, t)
    o32 = np.asarray(m32.apply(v, x, t))
    o16 = np.asarray(NCSNpp(**cfg, dtype="bf16").apply(v, x, t))
    rel = np.max(np.abs(o16 - o32)) / np.max(np.abs(o32))
    assert rel < 0.05, f"bf16 trunk deviates {rel:.3f} from f32"

    # the trunk genuinely stays bf16 (no silent f32 bounce per block)
    seen = []
    orig = L.ResnetBlockBigGANpp.__call__

    def spy(self, xx, temb=None, semb=None, train=False, x2=None):
        out = orig(self, xx, temb, semb, train=train, x2=x2)
        seen.append(out.dtype)
        return out

    L.ResnetBlockBigGANpp.__call__ = spy
    try:
        NCSNpp(**cfg, dtype="bf16").apply(v, x, t)
    finally:
        L.ResnetBlockBigGANpp.__call__ = orig
    assert seen and all(d == jnp.bfloat16 for d in seen), seen


def test_split_input_resblock_matches_concat():
    """The up-path virtual-concat block (x, x2) must equal the same block on
    jnp.concatenate([x, x2]) with identical params (group-aligned GroupNorm +
    conv linearity make the split exact up to f32 reduction order)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models import layers

    rng = np.random.default_rng(3)
    act = layers.get_act("swish")
    blk = layers.ResnetBlockBigGANpp(act=act, out_ch=16, dropout=0.0,
                                     skip_rescale=True, init_scale=0.0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))

    variables = blk.init(jax.random.PRNGKey(0), x, temb, x2=x2)
    out_split = blk.apply(variables, x, temb, x2=x2)
    out_concat = blk.apply(variables, jnp.concatenate([x, x2], axis=-1), temb)
    assert out_split.shape == out_concat.shape
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_concat),
                               atol=1e-5, rtol=1e-5)


def test_split_input_resblock_param_tree_matches_concat():
    """Both call styles must create the identical parameter tree (names,
    shapes, values) — checkpoints don't know which path ran."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models import layers

    rng = np.random.default_rng(4)
    act = layers.get_act("swish")
    blk = layers.ResnetBlockBigGANpp(act=act, out_ch=16, dropout=0.0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))

    v_split = blk.init(jax.random.PRNGKey(0), x, temb, x2=x2)
    v_concat = blk.init(jax.random.PRNGKey(0),
                        jnp.concatenate([x, x2], axis=-1), temb)
    flat_s = jax.tree_util.tree_leaves_with_path(v_split)
    flat_c = jax.tree_util.tree_leaves_with_path(v_concat)
    assert [p for p, _ in flat_s] == [p for p, _ in flat_c]
    for (_, a), (_, b) in zip(flat_s, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_input_resblock_group_crossing_boundary():
    """384-channel virtual concat (256 + 128): group width 12 crosses the
    boundary — the partial-sum statistics path must still match the concat
    path exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models import layers

    rng = np.random.default_rng(5)
    act = layers.get_act("swish")
    # channels 24+12=36, groups=min(9,32)=9, cg=4: 24%4==0 BUT pick halves
    # that break alignment: 22+14=36, cg=4 -> 22%4 != 0 (crossing groups)
    blk = layers.ResnetBlockBigGANpp(act=act, out_ch=16, dropout=0.0,
                                     skip_rescale=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 22)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((2, 8, 8, 14)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))

    variables = blk.init(jax.random.PRNGKey(0), x, temb, x2=x2)
    out_split = blk.apply(variables, x, temb, x2=x2)
    out_concat = blk.apply(variables, jnp.concatenate([x, x2], axis=-1), temb)
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_concat),
                               atol=1e-5, rtol=1e-5)


def test_fuse_pyramid_flag_parity():
    """fuse_pyramid=True must leave the param tree unchanged (explicit names
    match flax's historical auto-naming) and produce the same output (the
    fused op is the same math; on CPU it runs the jnp reference)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((1, 2, 16, 16))
                     + 1j * rng.standard_normal((1, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.5], jnp.float32)

    m0 = NCSNpp(**cfg)
    m1 = NCSNpp(**cfg, fuse_pyramid=True)
    v0 = m0.init(jax.random.PRNGKey(0), x, t)
    v1 = m1.init(jax.random.PRNGKey(0), x, t)
    p0 = [p for p, _ in jax.tree_util.tree_leaves_with_path(v0)]
    p1 = [p for p, _ in jax.tree_util.tree_leaves_with_path(v1)]
    assert p0 == p1, "fuse_pyramid must not change the param tree"

    o0 = np.asarray(m0.apply(v0, x, t))
    o1 = np.asarray(m1.apply(v0, x, t))
    np.testing.assert_allclose(o1, o0, atol=1e-4, rtol=1e-4)


def test_ncsnpp_remat_bitexact_params_forward_grads():
    """remat=True (jax.checkpoint every resblock) must leave the param tree
    and forward values bit-identical, and gradients identical to float
    tolerance (the rematerialized backward may reassociate reductions)."""
    import numpy as np

    cfg = dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((2, 2, 16, 16))
                     + 1j * rng.standard_normal((2, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.5, 0.9], jnp.float32)

    m0, m1 = NCSNpp(**cfg), NCSNpp(**cfg, remat=True)
    v0 = m0.init(jax.random.PRNGKey(0), x, t)
    v1 = m1.init(jax.random.PRNGKey(0), x, t)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1)), "remat changed the param tree"

    o0 = np.asarray(m0.apply(v0, x, t))
    o1 = np.asarray(m1.apply(v1, x, t))
    np.testing.assert_array_equal(o0, o1)

    def loss(m):
        def f(v):
            out = m.apply(v, x, t)
            return jnp.sum(jnp.abs(out) ** 2)
        return f

    g0 = jax.jit(jax.grad(loss(m0)))(v0)
    g1 = jax.jit(jax.grad(loss(m1)))(v1)
    scale = max(float(jnp.abs(a).max())
                for a in jax.tree_util.tree_leaves(g0)) + 1e-30
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7 * scale)


def test_ncsnpp_remat_composes_with_bf16():
    import numpy as np

    cfg = dict(nf=8, ch_mult=(1, 1), num_res_blocks=1, attn_resolutions=(0,),
               image_size=16, dtype="bf16", remat=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.standard_normal((1, 2, 16, 16))
                     + 1j * rng.standard_normal((1, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.7], jnp.float32)
    m = NCSNpp(**cfg)
    v = m.init(jax.random.PRNGKey(0), x, t)
    out = jax.jit(m.apply)(v, x, t)
    assert bool(jnp.all(jnp.isfinite(out.real)))
