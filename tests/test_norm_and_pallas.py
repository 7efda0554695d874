"""Tests: normalization library variants + pallas kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffse_tpu.models.normalization import (
    ConditionalInstanceNorm2dPlus,
    ConditionalNoneNorm2d,
    ConditionalVarianceNorm2d,
    InstanceNorm2d,
    InstanceNorm2dPlus,
    NoneNorm2d,
    VarianceNorm2d,
    get_normalization,
)
from diffse_tpu.ops.fused_act import fused_bias_leaky_relu
from diffse_tpu.ops.pallas_kernels import fused_bias_leaky_relu_pallas


def test_get_normalization_dispatch():
    assert get_normalization("InstanceNorm") is InstanceNorm2d
    assert get_normalization("InstanceNorm++") is InstanceNorm2dPlus
    assert get_normalization("VarianceNorm") is VarianceNorm2d
    with pytest.raises(ValueError):
        get_normalization("nope")


def test_instance_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 3 + 1)
    m = InstanceNorm2d()
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_allclose(np.mean(np.asarray(out), axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.std(np.asarray(out), axis=(1, 2)), 1.0, atol=1e-2)


def test_instance_norm_plus_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    m = InstanceNorm2dPlus()
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


def test_variance_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 5)
    m = VarianceNorm2d()
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape


def test_conditional_norms(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    y = jnp.asarray([0, 3])
    for cls in (ConditionalInstanceNorm2dPlus, ConditionalVarianceNorm2d,
                ConditionalNoneNorm2d):
        m = cls(num_classes=5)
        v = m.init(jax.random.PRNGKey(0), x, y)
        out = m.apply(v, x, y)
        assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


def test_none_norm_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    m = NoneNorm2d()
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_pallas_fused_bias_lrelu_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    ref = fused_bias_leaky_relu(x, b)
    out = fused_bias_leaky_relu_pallas(x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_groupnorm_silu_matches_flax(rng):
    """Fused GroupNorm+SiLU kernel vs flax GroupNorm + silu reference."""
    import flax.linen as nn
    from diffse_tpu.ops.pallas_kernels import groupnorm_silu_pallas

    x = jnp.asarray(rng.standard_normal((2, 8, 4, 16)).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1 + 1)
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    variables = {"params": {"scale": scale, "bias": bias}}
    ref = jax.nn.silu(gn.apply(variables, x))

    out = groupnorm_silu_pallas(x, scale, bias, num_groups=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_groupnorm_no_silu(rng):
    import flax.linen as nn
    from diffse_tpu.ops.pallas_kernels import groupnorm_silu_pallas

    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    scale = jnp.ones(8)
    bias = jnp.zeros(8)
    gn = nn.GroupNorm(num_groups=2, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    out = groupnorm_silu_pallas(x, scale, bias, num_groups=2, apply_silu=False,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ncsnpp_pallas_groupnorm_flag_parity():
    """use_pallas_groupnorm=True must leave the param tree unchanged and
    produce (numerically) the same forward as the flax GroupNorm path —
    interpret/jnp fallback on CPU, Mosaic on real TPU toolchains."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models.ncsnpp import NCSNpp

    cfg = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal((1, 2, 16, 16))
                     + 1j * rng.standard_normal((1, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.7], jnp.float32)

    base = NCSNpp(**cfg)
    fused = NCSNpp(**cfg, use_pallas_groupnorm=True)
    v = base.init(jax.random.PRNGKey(0), x, t)
    v_fused = fused.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_fused)

    o_base = np.asarray(base.apply(v, x, t))
    o_fused = np.asarray(fused.apply(v, x, t))
    np.testing.assert_allclose(o_fused, o_base, rtol=1e-4, atol=1e-5)


def test_pallas_groupnorm_silu_bf16_dtype_and_accuracy(rng):
    """bf16 input -> bf16 output (half HBM traffic on the trunk), with f32
    statistics inside: result must track the f32 reference within bf16
    quantization error."""
    from diffse_tpu.ops.pallas_kernels import groupnorm_silu_pallas

    x = jnp.asarray(rng.standard_normal((2, 8, 4, 32)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(32).astype(np.float32))

    ref = groupnorm_silu_pallas(x, scale, bias, num_groups=8, interpret=True)
    out = groupnorm_silu_pallas(x.astype(jnp.bfloat16), scale, bias,
                                num_groups=8, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )


class TestFusedGNSiLUConv:
    """groupnorm_silu_conv3x3_pallas: normalize+SiLU+conv3x3(+bias+skip) in
    one kernel — parity vs the separate flax chain, plus gradients."""

    def _mk(self, rng, b=2, h=16, w=8, cin=128, cout=128):
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
        gs = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cin).astype(np.float32))
        gb = jnp.asarray(0.1 * rng.standard_normal(cin).astype(np.float32))
        wk = jnp.asarray(
            0.05 * rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
        bt = jnp.asarray(0.1 * rng.standard_normal((b, cout)).astype(np.float32))
        return x, gs, gb, wk, bt

    def _flax_chain(self, x, gs, gb, wk, bt, skip=None, coef=1.0):
        import flax.linen as nn

        g = min(x.shape[-1] // 4, 32)
        gn = nn.GroupNorm(num_groups=g, epsilon=1e-6)
        h = gn.apply({"params": {"scale": gs, "bias": gb}}, x)
        h = jax.nn.silu(h)
        h = jax.lax.conv_general_dilated(
            h, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + bt[:, None, None, :]
        if skip is not None:
            h = (skip + h) * coef
        return h

    def test_matches_flax_chain(self, rng):
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, wk, bt = self._mk(rng)
        g = min(x.shape[-1] // 4, 32)
        out = groupnorm_silu_conv3x3_pallas(
            x, gs, gb, wk, bt, num_groups=g, interpret=True)
        ref = self._flax_chain(x, gs, gb, wk, bt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_skip_epilogue(self, rng):
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, wk, bt = self._mk(rng)
        skip = jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32))
        g = min(x.shape[-1] // 4, 32)
        coef = 1.0 / np.sqrt(2.0)
        out = groupnorm_silu_conv3x3_pallas(
            x, gs, gb, wk, bt, num_groups=g, skip=skip, skip_coef=coef,
            interpret=True)
        ref = self._flax_chain(x, gs, gb, wk, bt, skip=skip, coef=coef)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_bf16_compute(self, rng):
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, wk, bt = self._mk(rng)
        g = min(x.shape[-1] // 4, 32)
        out = groupnorm_silu_conv3x3_pallas(
            x.astype(jnp.bfloat16), gs, gb, wk, bt, num_groups=g,
            compute_dtype=jnp.bfloat16, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = self._flax_chain(x, gs, gb, wk, bt)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref),
            atol=0.15, rtol=0.1)

    def test_cin_cout_mismatch(self, rng):
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, _, _ = self._mk(rng, cin=128)
        wk = jnp.asarray(
            0.05 * np.random.default_rng(1).standard_normal(
                (3, 3, 128, 256)).astype(np.float32))
        bt = jnp.zeros((2, 256), jnp.float32)
        g = 32
        out = groupnorm_silu_conv3x3_pallas(
            x, gs, gb, wk, bt, num_groups=g, interpret=True)
        ref = self._flax_chain(x, gs, gb, wk, bt)
        assert out.shape == (2, 16, 8, 256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_gradients_match_reference(self, rng):
        from diffse_tpu.ops.pallas_kernels import (
            _gn_silu_conv3x3_reference,
            groupnorm_silu_conv3x3_pallas,
        )

        x, gs, gb, wk, bt = self._mk(rng, b=1, h=8, w=8)
        g = 32

        def loss_fused(args):
            x_, gs_, gb_, wk_, bt_ = args
            out = groupnorm_silu_conv3x3_pallas(
                x_, gs_, gb_, wk_, bt_, num_groups=g, interpret=True)
            return jnp.sum(out * out)

        def loss_ref(args):
            x_, gs_, gb_, wk_, bt_ = args
            out = _gn_silu_conv3x3_reference(
                x_, gs_, gb_, wk_, bt_, None, 1.0, g, 1e-6, None)
            return jnp.sum(out * out)

        gf = jax.grad(loss_fused)((x, gs, gb, wk, bt))
        gr = jax.grad(loss_ref)((x, gs, gb, wk, bt))
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)

    def test_fallback_on_unsupported_shape(self, rng):
        """Cin=32 (not a multiple of 128) must transparently take the jnp
        reference path."""
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, wk, bt = self._mk(rng, cin=32, cout=32)
        out = groupnorm_silu_conv3x3_pallas(
            x, gs, gb, wk, bt, num_groups=8, interpret=True)
        ref = self._flax_chain(x, gs, gb, wk, bt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_ncsnpp_matmul_conv_flag_parity():
    """matmul_conv_max_hw (im2col-matmul lowering of small-spatial stride-1
    3x3 convs, layers.MatmulConv) must leave the param tree unchanged and
    match the lax.conv path numerically — both in the standard resblock path
    and in the concat-free up-path (_call_split split convs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models.ncsnpp import NCSNpp

    # Two levels + num_res_blocks=1 exercises down, middle and the
    # virtual-concat up path; max_hw large enough to hit EVERY level so the
    # matmul formulation (not the fallback) is what's being tested.
    cfg = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    rng = np.random.default_rng(11)
    x = jnp.asarray((rng.standard_normal((2, 2, 16, 16))
                     + 1j * rng.standard_normal((2, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.3, 0.8], jnp.float32)

    base = NCSNpp(**cfg)
    mm = NCSNpp(**cfg, matmul_conv_max_hw=1024)
    v = base.init(jax.random.PRNGKey(0), x, t)
    v_mm = mm.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_mm)

    o_base = np.asarray(base.apply(v, x, t))
    o_mm = np.asarray(mm.apply(v, x, t))
    np.testing.assert_allclose(o_mm, o_base, rtol=1e-4, atol=1e-5)


def test_matmul_conv_vs_lax_conv_direct():
    """MatmulConv's im2col matmul equals lax.conv SAME for odd kernels, and
    the fallback branch (h*w > max_hw) takes the lax path bit-identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffse_tpu.models.layers import MatmulConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 4, 6, 8)).astype(np.float32))
    m_on = MatmulConv(features=16, kernel_size=3, max_hw=64)
    m_off = MatmulConv(features=16, kernel_size=3, max_hw=0)
    v = m_on.init(jax.random.PRNGKey(1), x)
    y_on = np.asarray(m_on.apply(v, x))
    y_off = np.asarray(m_off.apply(v, x))
    np.testing.assert_allclose(y_on, y_off, rtol=1e-5, atol=1e-5)


class TestFusedGNSiLUConvSmallMap:
    """The whole-tensor small-map regime of groupnorm_silu_conv3x3_pallas
    (deep U-Net levels: 4x1 / 8x2 feature maps at T=64, where the row-tiled
    kernel's W%8/H>=8 constraints cannot hold). The public wrapper must
    dispatch these shapes to the small kernel, and the fused chain must match
    the flax GroupNorm+SiLU+conv+bias(+skip) sequence."""

    def _mk(self, rng, b, h, w, cin, cout):
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
        gs = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cin).astype(np.float32))
        gb = jnp.asarray(0.1 * rng.standard_normal(cin).astype(np.float32))
        wk = jnp.asarray(
            0.05 * rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
        bt = jnp.asarray(0.1 * rng.standard_normal((b, cout)).astype(np.float32))
        return x, gs, gb, wk, bt

    def _flax_chain(self, x, gs, gb, wk, bt, skip=None, coef=1.0):
        import flax.linen as nn

        g = min(x.shape[-1] // 4, 32)
        gn = nn.GroupNorm(num_groups=g, epsilon=1e-6)
        h = gn.apply({"params": {"scale": gs, "bias": gb}}, x)
        h = jax.nn.silu(h)
        h = jax.lax.conv_general_dilated(
            h, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + bt[:, None, None, :]
        if skip is not None:
            h = (skip + h) * coef
        return h

    @pytest.mark.parametrize("shape", [(3, 4, 1, 128, 128), (2, 8, 2, 256, 256),
                                       (2, 4, 1, 256, 128), (1, 16, 4, 128, 256)])
    def test_matches_flax_chain(self, rng, shape):
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, wk, bt = self._mk(rng, *shape)
        g = min(x.shape[-1] // 4, 32)
        out = groupnorm_silu_conv3x3_pallas(
            x, gs, gb, wk, bt, num_groups=g, interpret=True)
        ref = self._flax_chain(x, gs, gb, wk, bt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_skip_epilogue_and_bf16(self, rng):
        from diffse_tpu.ops.pallas_kernels import groupnorm_silu_conv3x3_pallas

        x, gs, gb, wk, bt = self._mk(rng, 2, 4, 1, 256, 256)
        skip = jnp.asarray(rng.standard_normal((2, 4, 1, 256)).astype(np.float32))
        coef = 1.0 / np.sqrt(2.0)
        out = groupnorm_silu_conv3x3_pallas(
            x.astype(jnp.bfloat16), gs, gb, wk, bt, num_groups=32,
            skip=skip.astype(jnp.bfloat16), skip_coef=coef,
            compute_dtype=jnp.bfloat16, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = self._flax_chain(x, gs, gb, wk, bt, skip=skip, coef=coef)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref),
            atol=0.15, rtol=0.1)

    def test_gradients_match_reference(self, rng):
        from diffse_tpu.ops.pallas_kernels import (
            _gn_silu_conv3x3_reference,
            groupnorm_silu_conv3x3_pallas,
        )

        x, gs, gb, wk, bt = self._mk(rng, 2, 4, 1, 128, 128)
        g = 32

        def loss_fused(args):
            out = groupnorm_silu_conv3x3_pallas(
                *args, num_groups=g, interpret=True)
            return jnp.sum(out * out)

        def loss_ref(args):
            out = _gn_silu_conv3x3_reference(
                *args, None, 1.0, g, 1e-6, None)
            return jnp.sum(out * out)

        gf = jax.grad(loss_fused)((x, gs, gb, wk, bt))
        gr = jax.grad(loss_ref)((x, gs, gb, wk, bt))
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)


def test_ncsnpp_pallas_max_hw_flag_parity():
    """pallas_max_hw (fused Pallas resblock chain at small-spatial levels
    only) must leave the param tree unchanged and match the unfused path
    numerically. On CPU the op runs its jnp-reference equivalent, so this
    validates the per-level gating, the bias folding, and the param
    declarations; kernel numerics are covered by the interpret-mode tests."""
    from diffse_tpu.models.ncsnpp import NCSNpp

    cfg = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    rng = np.random.default_rng(12)
    x = jnp.asarray((rng.standard_normal((2, 2, 16, 16))
                     + 1j * rng.standard_normal((2, 2, 16, 16))).astype(np.complex64))
    t = jnp.asarray([0.3, 0.8], jnp.float32)

    base = NCSNpp(**cfg)
    deep = NCSNpp(**cfg, pallas_max_hw=64)  # gates in the 8x8 level and deeper
    v = base.init(jax.random.PRNGKey(0), x, t)
    v_deep = deep.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_deep)

    o_base = np.asarray(base.apply(v, x, t))
    o_deep = np.asarray(deep.apply(v, x, t))
    np.testing.assert_allclose(o_deep, o_base, rtol=1e-4, atol=1e-5)
