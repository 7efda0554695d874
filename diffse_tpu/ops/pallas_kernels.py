"""Pallas TPU kernels for the framework's custom-op surface.

The reference ships two CUDA kernels (SURVEY.md §2.2): upfirdn2d and
fused_bias_act. On TPU, upfirdn2d lowers to a single XLA convolution
(diffse_tpu/ops/upfirdn2d.py) that the conv emitter already schedules
optimally onto the MXU, so no hand kernel is needed for it. The fused
bias+LeakyReLU elementwise op is provided here as a Pallas VPU kernel for
op-surface parity (op/fused_bias_act_kernel.cu) and as a building block for
later fusions; on CPU test platforms it runs in interpreter mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _gn_pick_s_chunk(s: int, c: int, budget_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest spatial chunk that divides `s` and keeps the f32 working tile
    within `budget_bytes` (Mosaic scoped-vmem stack is ~16 MB on v5e; the
    block itself + double buffering also live there)."""
    cap = max(budget_bytes // (4 * c), 8)
    best = s
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= cap and s % cand == 0:
            best = cand
            break
    if best > cap and s > cap:
        # no divisor found under the cap; fall back to whole-s (small tensors)
        best = s
    return min(best, s)


def _groupnorm_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps,
                           apply_silu, s_chunk):
    """One (batch row, channel-group tile) per grid step: x_ref [1, S, Ct].

    GroupNorm statistics are computed per channel group over (spatial, C/G);
    the channel tile Ct is group-aligned, so each tile's statistics are
    self-contained. Scale/shift and (optionally) SiLU are applied in the same
    kernel — the block is loaded from HBM once and written once (XLA's chain
    pays an extra full read for the statistics pass).

    Layout/VMEM notes (what makes this compile and run fast):
      - the channel dim stays the minor (lane) dim throughout; the spatial
        reduction is over sublanes. Reshaping C -> (G, C/G) on a 2-D tile
        (the naive formulation) is a lane-dim layout cast Mosaic rejects, so
        the [C] -> [G] aggregation and [G] -> [C] scatter-back are expressed
        as tiny one-hot matmuls instead,
      - both passes stream the block through f32 in `s_chunk` slices inside
        fori_loops: upcasting the whole block to f32 at once would blow the
        ~16 MB scoped-vmem stack at production shapes ([16384, 128]),
      - input may be f32 or bf16; statistics always accumulate in f32; the
        store casts back to the input dtype, so a half-precision trunk pays
        half-precision HBM traffic here.
    """
    s, ct = x_ref.shape[1], x_ref.shape[2]
    cg = ct // num_groups
    n = s * cg
    nchunks = s // s_chunk

    def stats_body(i, carry):
        ssum, ssq = carry
        xb = x_ref[0, pl.ds(i * s_chunk, s_chunk), :].astype(jnp.float32)
        return (
            ssum + jnp.sum(xb, axis=0, keepdims=True),
            ssq + jnp.sum(xb * xb, axis=0, keepdims=True),
        )

    zeros = jnp.zeros((1, ct), jnp.float32)
    ssum, ssq = jax.lax.fori_loop(0, nchunks, stats_body, (zeros, zeros))

    # M[c,g] = 1 iff channel c belongs to group g (one-hot matmuls in place
    # of lane-dim reshapes).
    ci = jax.lax.broadcasted_iota(jnp.int32, (ct, num_groups), 0) // cg
    gi = jax.lax.broadcasted_iota(jnp.int32, (ct, num_groups), 1)
    m_cg = (ci == gi).astype(jnp.float32)  # [Ct, G]
    gi2 = jax.lax.broadcasted_iota(jnp.int32, (num_groups, ct), 0)
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (num_groups, ct), 1) // cg
    m_gc = (ci2 == gi2).astype(jnp.float32)  # [G, Ct]

    mean_g = jnp.dot(ssum, m_cg, preferred_element_type=jnp.float32) / n
    var_g = (
        jnp.dot(ssq, m_cg, preferred_element_type=jnp.float32) / n
        - mean_g * mean_g
    )
    mean_c = jnp.dot(mean_g, m_gc, preferred_element_type=jnp.float32)  # [1,Ct]
    rstd_c = jnp.dot(
        jax.lax.rsqrt(var_g + eps), m_gc, preferred_element_type=jnp.float32
    )
    a = rstd_c * scale_ref[0].astype(jnp.float32)[None, :]
    b = bias_ref[0].astype(jnp.float32)[None, :] - mean_c * a

    def apply_body(i, _):
        xb = x_ref[0, pl.ds(i * s_chunk, s_chunk), :].astype(jnp.float32)
        out = xb * a + b
        if apply_silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0, pl.ds(i * s_chunk, s_chunk), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, apply_body, 0)


def groupnorm_silu_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
    apply_silu: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused GroupNorm(+SiLU) as a Pallas kernel, NHWC.

    The GroupNorm -> activation pair opens every NCSN++ residual block
    (models/layers.py); fusing it keeps the normalized activations in VMEM.
    One grid step per batch row: requires H*W*C*itemsize bytes (x2 for
    pipelining) <= VMEM; for the production shapes ([256, 64, 128] bf16 =
    4 MB) this fits a v5e core comfortably.

    Input may be f32 or bf16: statistics/normalization always run in f32 in
    VMEM; the output keeps the input dtype (a bf16 trunk pays bf16 HBM
    traffic through this op).

    Args:
        x: ``[B, H, W, C]``.
        scale, bias: ``[C]`` affine parameters (kept f32 inside the kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    assert c % num_groups == 0
    s = h * w
    x2 = x.reshape(b, s, c)
    # 2-D [1, C] (not 1-D [C]): XLA tiles a bare f32[256] as T(256), which
    # Mosaic's T(128) operand layout rejects.
    scale = scale.astype(jnp.float32)[None, :]
    bias = bias.astype(jnp.float32)[None, :]

    # Channel-tile the grid on group boundaries. Constraints: the lane
    # (last) block dim must be a multiple of 128 or the whole C (Mosaic
    # tiling rule), the tile must be group-aligned, and the auto-pipeline
    # double-buffers both input and output blocks (4 block-sized buffers
    # live at once) within the ~16 MB scoped-vmem budget on v5e. Shapes
    # whose smallest legal tile still busts the budget (e.g. the level-0
    # [16384, 128] map) take the jnp path — the fused GN+SiLU+conv kernel
    # (groupnorm_silu_conv3x3_pallas) is the right tool there.
    cg = c // num_groups
    itemsize = jnp.dtype(x.dtype).itemsize
    ct = c
    if c > 128 and c % 128 == 0 and 128 % cg == 0:
        ct = 128
    groups_per_tile = ct // cg
    s_chunk = _gn_pick_s_chunk(s, ct)
    if not interpret and 4 * s * ct * itemsize > 15 * 1024 * 1024:
        return _groupnorm_silu_jnp(x, scale, bias, num_groups, eps, apply_silu)

    kernel = functools.partial(
        _groupnorm_silu_kernel, num_groups=groups_per_tile, eps=eps,
        apply_silu=apply_silu, s_chunk=s_chunk,
    )
    try:
        out = pl.pallas_call(
            kernel,
            grid=(b, c // ct),
            in_specs=[
                pl.BlockSpec((1, s, ct), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, ct), lambda i, j: (0, j)),
                pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, s, ct), lambda i, j: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            interpret=interpret,
        )(x2, scale, bias)
        return out.reshape(b, h, w, c)
    except Exception:
        # Mosaic compilation unavailable (e.g. remote-compile bridges without
        # a Pallas helper, see DEVNOTES.md): jnp fallback, same math.
        return _groupnorm_silu_jnp(x, scale, bias, num_groups, eps, apply_silu)


def _groupnorm_silu_jnp(x, scale, bias, num_groups, eps, apply_silu):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    out = xn * scale.reshape(1, 1, 1, -1).astype(jnp.float32) \
        + bias.reshape(1, 1, 1, -1).astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _fused_bias_lrelu_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[...]
    b = b_ref[...]
    v = x + b  # bias broadcasts along the trailing (channel) axis
    o_ref[...] = jnp.where(v >= 0, v, negative_slope * v) * scale


def fused_bias_leaky_relu_pallas(
    x: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused bias-add + LeakyReLU(0.2) * sqrt(2) as a Pallas kernel.

    Args:
        x: ``[..., C]`` (channels-last).
        bias: ``[C]``.
        interpret: force interpreter mode (auto-on for non-TPU backends).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = x.reshape(-1, c)

    kernel = functools.partial(
        _fused_bias_lrelu_kernel, negative_slope=negative_slope, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=interpret,
    )(x2, bias.astype(x2.dtype))
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# Fused GroupNorm + SiLU + 3x3 conv
# ---------------------------------------------------------------------------
#
# The NCSN++ trunk is HBM-bandwidth-bound at inference (DEVNOTES.md): each
# residual block runs two GroupNorm -> SiLU -> conv3x3 chains on full-width
# feature maps, and XLA executes each chain as
#     stats read + normalize/SiLU (read, write) + conv (read, write)
# = 3 reads + 2 writes of the map. This kernel computes the normalize + SiLU
# + 3x3 convolution in ONE pass (the group statistics come from a cheap XLA
# reduction prolog), i.e. 2 reads + 1 write — removing a full read+write of
# the feature map per chain. Functionally it replaces the reference's
# GroupNorm/act/conv sequence in every BigGAN resblock
# (sgmse/backbones/ncsnpp_utils/layerspp.py:214-276).
#
# The conv is expressed as 9 MXU matmuls over shifted views of the activated
# tile held in VMEM; halo rows come in as two extra 1-row blocks. The
# optional epilogue fuses the conv bias + per-batch conditioning bias
# (timestep/SNR embedding Dense output) and the residual skip-add * 1/sqrt(2)
# — everything the resblock does between convs except dropout (training with
# dropout falls back to the unfused path).


def _gn_silu_conv3x3_kernel(x_ref, top_ref, bot_ref, a_ref, b_ref, w_ref,
                            bias_ref, o_ref, *, h_t, wdt, cin, cout,
                            compute_dtype, with_skip, skip_coef,
                            skip_ref=None):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    a = a_ref[0].astype(jnp.float32)  # [1, Cin] per-channel scale (rstd*gamma)
    b = b_ref[0].astype(jnp.float32)  # [1, Cin] per-channel shift

    def act(t):
        v = t.astype(jnp.float32) * a + b
        return v * jax.nn.sigmoid(v)

    mid = act(x_ref[0])  # [h_t, W, Cin] f32
    top = act(top_ref[0])  # [1, W, Cin]
    bot = act(bot_ref[0])
    # SAME zero padding at the image's first/last row (the halo blocks are
    # clamped copies of row 0 / row H-1 there).
    top = jnp.where(j == 0, 0.0, top)
    bot = jnp.where(j == nj - 1, 0.0, bot)

    full = jnp.concatenate([top, mid, bot], axis=0)  # [h_t+2, W, Cin]
    zcol = jnp.zeros((h_t + 2, 1, cin), jnp.float32)
    padded = jnp.concatenate([zcol, full, zcol], axis=1)  # [h_t+2, W+2, Cin]
    if compute_dtype is not None:
        # match the unfused path: activations cross into the conv in the
        # trunk compute dtype (e.g. bf16 on the MXU), accumulation in f32
        padded = padded.astype(compute_dtype)

    acc = jnp.zeros((h_t * wdt, cout), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            sl = padded[dr : dr + h_t, dc : dc + wdt, :].reshape(h_t * wdt, cin)
            acc = acc + jnp.dot(
                sl, w_ref[dr * 3 + dc], preferred_element_type=jnp.float32
            )

    out = acc + bias_ref[0].astype(jnp.float32)  # [1, Cout] broadcast
    out = out.reshape(h_t, wdt, cout)
    if with_skip:
        out = (skip_ref[0].astype(jnp.float32) + out) * skip_coef
    o_ref[0] = out.astype(o_ref.dtype)


def _gn_stats_ab(x, gn_scale, gn_bias, num_groups, eps):
    """Per-(batch, channel) affine from GroupNorm statistics: one cheap XLA
    read of x. Returns a, b with  normalized = x * a + b."""
    bsz, h, w, c = x.shape
    cg = c // num_groups
    xg = x.astype(jnp.float32).reshape(bsz, h * w, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3))  # [B, G]
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)  # [B, C]
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    a = rstd_c * gn_scale.astype(jnp.float32)[None, :]
    b = gn_bias.astype(jnp.float32)[None, :] - mean_c * a
    return a, b


def _gn_silu_conv3x3_reference(x, gn_scale, gn_bias, w, bias_total, skip,
                               skip_coef, num_groups, eps, compute_dtype):
    """jnp reference: same math as the kernel (and as the unfused flax
    path), used for CPU fallback, interpret-mode tests, and the backward
    pass of the custom VJP."""
    a, b = _gn_stats_ab(x, gn_scale, gn_bias, num_groups, eps)
    v = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    act = v * jax.nn.sigmoid(v)
    cd = compute_dtype or jnp.float32
    out = jax.lax.conv_general_dilated(
        act.astype(cd), w.astype(cd), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + bias_total.astype(jnp.float32)[:, None, None, :]
    if skip is not None:
        out = (skip.astype(jnp.float32) + out) * skip_coef
    return out.astype(x.dtype)


def _gn_silu_conv3x3_small_kernel(x_ref, a_ref, b_ref, w_ref, bias_ref,
                                  o_ref, *, bsz, h, wdt, cin, cout,
                                  compute_dtype, with_skip, skip_coef,
                                  skip_ref=None):
    """Whole-tensor fused chain for TINY spatial maps (deep U-Net levels,
    e.g. 4x1 / 8x2 at T=64 where the row-tiled kernel's ``W % 8 == 0,
    H >= 8`` constraints cannot hold). Everything lives in VMEM as one
    flattened ``[B*H*W, C]`` block; the 3x3 SAME conv is at most 9 MXU
    matmuls over rolled+masked views of the activated rows — taps that are
    everywhere-invalid for the given (H, W) (e.g. the 6 off-column taps at
    W=1) are pruned at trace time. The per-row GroupNorm affine (a, b) and
    the conv/conditioning bias come in pre-expanded to rows."""
    hw = h * wdt
    rows = bsz * hw

    v = x_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
    act = v * jax.nn.sigmoid(v)
    # NOTE: act stays f32 through the roll/mask — Mosaic's rotate only
    # supports 32-bit data ("Rotate with non-32-bit data" compile error on
    # bf16, measured on v5e); the per-tap cast below commutes bit-exactly
    # with roll+mask (bf16(0) == 0), so numerics are unchanged.

    # Row r = b*H*W + hh*W + ww. Destination validity of tap (dy, dx) only
    # depends on (hh, ww); a row whose source crosses an image edge is
    # masked, which also kills every would-be cross-batch leak of the flat
    # roll (those sources always have hh+dy outside [0, H)).
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    hh = (r_iota % hw) // wdt
    ww = r_iota % wdt

    acc = jnp.zeros((rows, cout), jnp.float32)
    for dy in (-1, 0, 1):
        if h + min(dy, 0) <= 0 or dy >= h:  # no valid destination rows
            continue
        for dx in (-1, 0, 1):
            if wdt + min(dx, 0) <= 0 or dx >= wdt:
                continue
            shift = dy * wdt + dx
            # pltpu.roll requires a non-negative shift; (-s) mod rows is the
            # same circular move (wrapped rows are masked out below anyway)
            src = act if shift == 0 else pltpu.roll(act, (-shift) % rows, axis=0)
            valid = (
                (hh + dy >= 0) & (hh + dy < h) & (ww + dx >= 0) & (ww + dx < wdt)
            )
            tap = jnp.where(valid, src, jnp.zeros_like(src))
            if compute_dtype is not None:
                tap = tap.astype(compute_dtype)
            acc = acc + jnp.dot(
                tap, w_ref[(dy + 1) * 3 + (dx + 1)],
                preferred_element_type=jnp.float32,
            )

    out = acc + bias_ref[:].astype(jnp.float32)
    if with_skip:
        out = (skip_ref[:].astype(jnp.float32) + out) * skip_coef
    o_ref[:] = out.astype(o_ref.dtype)


def _gn_silu_conv3x3_small_impl(x, gn_scale, gn_bias, w, bias_total, skip,
                                skip_coef, num_groups, eps, compute_dtype,
                                interpret):
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    hw = h * wdt
    a, b = _gn_stats_ab(x, gn_scale, gn_bias, num_groups, eps)
    # expand per-batch vectors to flat rows: [B, C] -> [B*H*W, C]
    a_rows = jnp.repeat(a, hw, axis=0)
    b_rows = jnp.repeat(b, hw, axis=0)
    bias_rows = jnp.repeat(bias_total.astype(jnp.float32), hw, axis=0)
    x_rows = x.reshape(bsz * hw, cin)
    w9 = w.reshape(9, cin, cout)
    if compute_dtype is not None:
        w9 = w9.astype(compute_dtype)

    kernel = functools.partial(
        _gn_silu_conv3x3_small_kernel, bsz=bsz, h=h, wdt=wdt, cin=cin,
        cout=cout, compute_dtype=compute_dtype, with_skip=skip is not None,
        skip_coef=skip_coef,
    )
    args = [x_rows, a_rows, b_rows, w9, bias_rows]
    if skip is not None:
        args.append(skip.reshape(bsz * hw, cout))

        def body(x_ref, a_ref, b_ref, w_ref, bias_ref, skip_ref, o_ref):
            kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref,
                   skip_ref=skip_ref)
    else:
        body = kernel

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((bsz * hw, cout), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(bsz, h, wdt, cout)


def _small_map_ok(h, wdt, cin, num_groups):
    """Shapes served by the whole-tensor small-map kernel: tiny spatial maps
    with a lane-aligned channel dim (the deep U-Net levels)."""
    return h * wdt <= 256 and cin % 128 == 0 and cin % num_groups == 0


def _gn_silu_conv3x3_pallas_impl(x, gn_scale, gn_bias, w, bias_total, skip,
                                 skip_coef, num_groups, eps, compute_dtype,
                                 interpret):
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    if not (wdt % 8 == 0 and h >= 8):
        return _gn_silu_conv3x3_small_impl(
            x, gn_scale, gn_bias, w, bias_total, skip, skip_coef, num_groups,
            eps, compute_dtype, interpret,
        )
    a, b = _gn_stats_ab(x, gn_scale, gn_bias, num_groups, eps)
    # [B, C] vectors go in as [B, 1, C] so their (second-minor, minor) block
    # dims (1, C) equal the array dims (a Mosaic block-shape requirement).
    a = a[:, None, :]
    b = b[:, None, :]
    bias_total = bias_total[:, None, :]

    # Row-tile height: ~4096 spatial rows per MXU matmul, dividing H.
    h_t = min(h, max(4096 // wdt, 8))
    while h % h_t:
        h_t //= 2
    w9 = w.reshape(9, cin, cout)
    if compute_dtype is not None:
        w9 = w9.astype(compute_dtype)

    kernel = functools.partial(
        _gn_silu_conv3x3_kernel, h_t=h_t, wdt=wdt, cin=cin, cout=cout,
        compute_dtype=compute_dtype, with_skip=skip is not None,
        skip_coef=skip_coef,
    )

    def top_idx(i, j):
        return (i, jnp.maximum(j * h_t - 1, 0), 0, 0)

    def bot_idx(i, j):
        return (i, jnp.minimum((j + 1) * h_t, h - 1), 0, 0)

    in_specs = [
        pl.BlockSpec((1, h_t, wdt, cin), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, wdt, cin), top_idx),
        pl.BlockSpec((1, 1, wdt, cin), bot_idx),
        pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)),
    ]
    args = [x, x, x, a, b, w9, bias_total]
    if skip is not None:
        in_specs.append(pl.BlockSpec((1, h_t, wdt, cout), lambda i, j: (i, j, 0, 0)))
        args.append(skip)

        def kernel_skip(x_ref, top_ref, bot_ref, a_ref, b_ref, w_ref, bias_ref,
                        skip_ref, o_ref):
            kernel(x_ref, top_ref, bot_ref, a_ref, b_ref, w_ref, bias_ref,
                   o_ref, skip_ref=skip_ref)

        body = kernel_skip
    else:
        body = kernel

    out = pl.pallas_call(
        body,
        grid=(bsz, h // h_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_t, wdt, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), x.dtype),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _gn_silu_conv3x3_vjp(x, gn_scale, gn_bias, w, bias_total, skip,
                         with_skip, skip_coef, num_groups, eps, compute_dtype,
                         interpret):
    return _gn_silu_conv3x3_pallas_impl(
        x, gn_scale, gn_bias, w, bias_total, skip if with_skip else None,
        skip_coef, num_groups, eps, compute_dtype, interpret,
    )


def _gn_silu_conv3x3_fwd(x, gn_scale, gn_bias, w, bias_total, skip,
                         with_skip, skip_coef, num_groups, eps, compute_dtype,
                         interpret):
    out = _gn_silu_conv3x3_vjp(
        x, gn_scale, gn_bias, w, bias_total, skip, with_skip, skip_coef,
        num_groups, eps, compute_dtype, interpret,
    )
    return out, (x, gn_scale, gn_bias, w, bias_total, skip)


def _gn_silu_conv3x3_bwd(with_skip, skip_coef, num_groups, eps, compute_dtype,
                         interpret, res, g):
    """Backward via the jnp reference (recompute): the kernel is a pure
    reformulation of the same math, so its VJP is the reference's VJP.
    When with_skip is False the reference ignores the (dummy) skip input and
    jax.vjp yields a zero cotangent for it automatically."""
    x, gn_scale, gn_bias, w, bias_total, skip = res

    def ref(x_, s_, b_, w_, bt_, sk_):
        return _gn_silu_conv3x3_reference(
            x_, s_, b_, w_, bt_, sk_ if with_skip else None,
            skip_coef, num_groups, eps, compute_dtype,
        )

    _, vjp = jax.vjp(ref, x, gn_scale, gn_bias, w, bias_total, skip)
    return vjp(g)


_gn_silu_conv3x3_vjp.defvjp(_gn_silu_conv3x3_fwd, _gn_silu_conv3x3_bwd)


def groupnorm_silu_conv3x3_pallas(
    x: jnp.ndarray,
    gn_scale: jnp.ndarray,
    gn_bias: jnp.ndarray,
    w: jnp.ndarray,
    bias_total: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
    skip: jnp.ndarray | None = None,
    skip_coef: float = 1.0,
    compute_dtype=None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused GroupNorm + SiLU + conv3x3 (+bias [+skip-add * skip_coef]).

    Args:
        x: ``[B, H, W, Cin]`` feature map (f32 or bf16).
        gn_scale, gn_bias: ``[Cin]`` GroupNorm affine parameters.
        w: ``[3, 3, Cin, Cout]`` HWIO conv weights.
        bias_total: ``[B, Cout]`` conv bias + any per-batch conditioning bias
            (e.g. the timestep-embedding Dense output) folded together.
        skip: optional ``[B, H, W, Cout]`` residual added after the conv,
            with the sum scaled by ``skip_coef`` (1/sqrt(2) in NCSN++).
        compute_dtype: dtype for the conv matmuls (bf16 for the half trunk);
            statistics/normalization always run in f32.

    Two kernel regimes: the row-tiled halo kernel for full-size maps
    (W multiple of 8, H >= 8) and a whole-tensor VMEM-resident kernel for
    tiny maps (H*W <= 256 — the deep U-Net levels, e.g. 4x1 / 8x2 at T=64,
    where the conv emitter's tiling is weakest). Falls back to the
    equivalent jnp chain when the shape meets neither regime's constraints
    (input lane dim multiple of 128; the OUTPUT channel count is
    unconstrained — its block always covers the full dim, so e.g. the
    4-channel output pyramid conv is fine) or when Mosaic is unavailable. On non-TPU backends the jnp reference
    runs directly (interpret mode is for tests only — it is orders of
    magnitude slower at real shapes).
    """
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    if interpret is None:
        if jax.default_backend() != "tpu":
            return _gn_silu_conv3x3_reference(
                x, gn_scale, gn_bias, w, bias_total, skip, skip_coef,
                num_groups, eps, compute_dtype,
            )
        interpret = False
    ok = (
        cin % 128 == 0
        and cin % num_groups == 0
        and ((wdt % 8 == 0 and h >= 8) or _small_map_ok(h, wdt, cin, num_groups))
    )
    if not ok:
        return _gn_silu_conv3x3_reference(
            x, gn_scale, gn_bias, w, bias_total, skip, skip_coef, num_groups,
            eps, compute_dtype,
        )
    try:
        skip_arg = skip if skip is not None else jnp.zeros(
            (bsz, h, wdt, cout), x.dtype
        )
        return _gn_silu_conv3x3_vjp(
            x, gn_scale, gn_bias, w, bias_total, skip_arg, skip is not None,
            skip_coef, num_groups, eps, compute_dtype, interpret,
        )
    except Exception:
        return _gn_silu_conv3x3_reference(
            x, gn_scale, gn_bias, w, bias_total, skip, skip_coef, num_groups,
            eps, compute_dtype,
        )
