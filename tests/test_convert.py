"""Checkpoint-converter tests: the construction-walk correspondence covers the
full flax NCSN++ param tree and round-trips through the torch layout."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
spec = importlib.util.spec_from_file_location(
    "convert_torch_checkpoint", os.path.join(_TOOLS, "convert_torch_checkpoint.py")
)
conv = importlib.util.module_from_spec(spec)
spec.loader.exec_module(conv)

from diffse_tpu.models.ncsnpp import NCSNpp

TINY = dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,), image_size=16)


def _leaf_paths(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, prefix + (k,)))
        else:
            out.append(prefix + (k,))
    return out


@pytest.mark.parametrize("cfg", [TINY])
def test_correspondence_covers_full_tree(cfg):
    model = NCSNpp(**cfg)
    x = jnp.zeros((1, 2, 16, 16), jnp.complex64)
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))["params"]

    corr = conv.ncsnpp_correspondence(
        nf=cfg["nf"], ch_mult=cfg["ch_mult"], num_res_blocks=cfg["num_res_blocks"],
        attn_resolutions=cfg["attn_resolutions"], image_size=cfg["image_size"],
    )
    covered = set()
    for _tp, flax_path, kind in corr:
        node = conv._get_path(params, flax_path)
        for name in node:
            covered.add(flax_path + (name,))

    all_paths = set(_leaf_paths(params))
    missing = all_paths - covered
    assert not missing, f"correspondence misses params: {sorted(missing)[:10]}"
    extra = covered - all_paths
    assert not extra, f"correspondence has phantom params: {sorted(extra)[:10]}"


def test_roundtrip_through_torch_layout():
    model = NCSNpp(**TINY)
    x = jnp.zeros((1, 2, 16, 16), jnp.complex64)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))["params"]
    )
    corr = conv.ncsnpp_correspondence(
        nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,), image_size=16
    )
    sd = conv.convert_flax_to_state_dict(params, corr)
    # keys look like the reference's state_dict naming
    assert any(k.startswith("dnn.all_modules.0.") for k in sd)
    assert "dnn.output_layer.weight" in sd
    # conv weights are OIHW in the torch layout
    w = sd["dnn.output_layer.weight"]
    assert w.shape == (2, 4, 1, 1)

    back = conv.convert_state_dict_to_flax(sd, corr)
    for path in _leaf_paths(params):
        np.testing.assert_allclose(
            conv._get_path(back, path), conv._get_path(params, path), atol=0,
            err_msg=str(path),
        )


def test_converted_params_run_forward():
    model = NCSNpp(**TINY)
    x = jnp.zeros((1, 2, 16, 16), jnp.complex64)
    variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    corr = conv.ncsnpp_correspondence(
        nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,), image_size=16
    )
    sd = conv.convert_flax_to_state_dict(params, corr)
    back = conv.convert_state_dict_to_flax(sd, corr)
    out1 = model.apply({"params": back}, x, jnp.ones((1,)))
    out2 = model.apply(variables, x, jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_snrnet_conversion_roundtrip_and_forward():
    """SNRNet torch<->flax conversion: full-tree coverage and identical
    forward outputs after a round trip (incl. the BLSTM gate mapping)."""
    from diffse_tpu.models.snrnet import SNRNet

    model = SNRNet()
    x = jnp.zeros((1, 2, 256, 32))
    variables = model.init(jax.random.PRNGKey(3), x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = conv.snrnet_flax_to_state_dict(params)
    expected_keys = {
        "dnn.conv5x5_1.weight", "dnn.blstm.weight_ih_l0",
        "dnn.blstm.weight_ih_l0_reverse", "dnn.fc.weight",
    }
    assert expected_keys <= set(sd)
    assert sd["dnn.blstm.weight_ih_l0"].shape == (4 * 128, 128)
    assert sd["dnn.conv5x5_1.weight"].shape == (32, 2, 5, 5)

    back = conv.snrnet_state_dict_to_flax(sd)

    def _paths(tree, prefix=()):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out.extend(_paths(v, prefix + (k,)))
            else:
                out.append(prefix + (k,))
        return out

    assert sorted(_paths(back)) == sorted(_paths(params))

    x_in = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 256, 32))
    out1 = model.apply({"params": back}, x_in)
    out2 = model.apply(variables, x_in)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_snrnet_lstm_gate_mapping_against_torch():
    """Feed identical weights into torch nn.LSTM and our flax BLSTM stack and
    compare sequence outputs — validates the (i,f,g,o) gate slicing."""
    import torch

    h, d = 16, 12
    rng = np.random.default_rng(0)
    lstm_t = torch.nn.LSTM(d, h, 1, batch_first=True, bidirectional=False)
    sd = {f"dnn.blstm.{k}": v.detach().numpy() for k, v in
          lstm_t.state_dict().items()}

    # build the flax cell params via the converter's gate mapping
    w_ih = sd["dnn.blstm.weight_ih_l0"]
    w_hh = sd["dnn.blstm.weight_hh_l0"]
    b_ih = sd["dnn.blstm.bias_ih_l0"]
    b_hh = sd["dnn.blstm.bias_hh_l0"]
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    cell_params = {}
    for g, gi in gates.items():
        sl = slice(gi * h, (gi + 1) * h)
        cell_params[f"i{g}"] = {"kernel": w_ih[sl].T}
        cell_params[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b_ih[sl] + b_hh[sl]}

    import flax.linen as nn

    rnn = nn.RNN(nn.OptimizedLSTMCell(h))
    x = rng.standard_normal((2, 7, d)).astype(np.float32)
    out_f = rnn.apply({"params": {"cell": cell_params}}, jnp.asarray(x))
    out_t, _ = lstm_t(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.detach().numpy(),
                               atol=1e-5)


# ---------------------------------------------------- reference forward parity

_REF_ROOT = "/root/reference/sgmse-bbed"


def _import_reference_ncsnpp():
    """Import the reference NCSNpp on CPU, stubbing its JIT-compiled CUDA op
    module with exact CPU equivalents (the op's semantics are pinned by
    tests/test_ops.py::test_upfirdn2d_numpy_against_torch_spec)."""
    import types

    torch = pytest.importorskip("torch")
    if not os.path.isdir(_REF_ROOT):
        pytest.skip("reference repo not present")
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)

    mod_name = "sgmse.backbones.ncsnpp_utils.op"
    if mod_name not in sys.modules:
        from diffse_tpu.ops.upfirdn2d import upfirdn2d_numpy

        op_mod = types.ModuleType(mod_name)

        def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
            out = upfirdn2d_numpy(
                input.detach().cpu().double().numpy(),
                kernel.detach().cpu().double().numpy(),
                up=up, down=down, pad=(int(pad[0]), int(pad[1])),
            )
            return torch.from_numpy(out).to(input.dtype)

        def fused_leaky_relu(inp, bias, negative_slope=0.2, scale=2**0.5):
            shape = [1, -1] + [1] * (inp.ndim - 2)
            return torch.nn.functional.leaky_relu(
                inp + bias.view(*shape), negative_slope
            ) * scale

        class FusedLeakyReLU(torch.nn.Module):
            def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
                super().__init__()
                self.bias = torch.nn.Parameter(torch.zeros(channel))
                self.negative_slope = negative_slope
                self.scale = scale

            def forward(self, inp):
                return fused_leaky_relu(inp, self.bias, self.negative_slope, self.scale)

        op_mod.upfirdn2d = upfirdn2d
        op_mod.fused_leaky_relu = fused_leaky_relu
        op_mod.FusedLeakyReLU = FusedLeakyReLU
        sys.modules[mod_name] = op_mod

    from sgmse.backbones.ncsnpp import NCSNpp as RefNCSNpp

    return RefNCSNpp


def _reference_parity_case(cfg, f, t_frames, seed=0, t_value=0.37):
    """Instantiate the reference NCSNpp (random torch init), convert its
    weights, and return (reference_output, our_output) on identical input."""
    torch = pytest.importorskip("torch")
    RefNCSNpp = _import_reference_ncsnpp()

    torch.manual_seed(seed)
    ref_model = RefNCSNpp(**cfg).eval()
    sd = {f"dnn.{k}": v.detach().numpy() for k, v in ref_model.state_dict().items()}
    corr = conv.ncsnpp_correspondence(
        nf=cfg["nf"], ch_mult=cfg["ch_mult"], num_res_blocks=cfg["num_res_blocks"],
        attn_resolutions=cfg["attn_resolutions"], image_size=cfg["image_size"],
    )
    params = conv.convert_state_dict_to_flax(sd, corr)

    rng = np.random.default_rng(seed)
    xc = (rng.standard_normal((1, 2, f, t_frames))
          + 1j * rng.standard_normal((1, 2, f, t_frames))).astype(np.complex64)
    t_val = np.asarray([t_value], np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(xc), torch.from_numpy(t_val)).numpy()

    model = NCSNpp(nf=cfg["nf"], ch_mult=cfg["ch_mult"],
                   num_res_blocks=cfg["num_res_blocks"],
                   attn_resolutions=cfg["attn_resolutions"],
                   image_size=cfg["image_size"])
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(xc),
                                  jnp.asarray(t_val)))
    return ref_out, ours


def test_forward_parity_vs_reference_tiny():
    """End-to-end forward parity against the ACTUAL reference NCSN++ (torch
    CPU, random weights converted): any layer-semantics drift fails this."""
    cfg = dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
               image_size=16)
    ref_out, ours = _reference_parity_case(cfg, f=16, t_frames=16)
    assert ref_out.shape == ours.shape == (1, 1, 16, 16)
    scale = np.max(np.abs(ref_out))
    err = np.max(np.abs(ours - ref_out)) / scale
    assert err < 1e-4, f"relative deviation {err:.2e}"


@pytest.mark.slow
def test_forward_parity_vs_reference_full_size():
    """Same parity check at the production configuration (~65M params,
    7 resolutions, attention at 16) on a 0.5 s input."""
    cfg = dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2,
               attn_resolutions=(16,), image_size=256)
    ref_out, ours = _reference_parity_case(cfg, f=256, t_frames=64)
    assert ref_out.shape == ours.shape == (1, 1, 256, 64)
    scale = np.max(np.abs(ref_out))
    err = np.max(np.abs(ours - ref_out)) / scale
    assert err < 1e-3, f"relative deviation {err:.2e}"


def test_cli_end_to_end_roundtrip(tmp_path):
    """The converter CLI (`main`) turns a fabricated Lightning-style .ckpt —
    state_dict + hyper_parameters + torch_ema shadow list — into an orbax
    checkpoint directory that `load_score_model` restores exactly.

    Exercises the real-checkpoint EMA contract: torch_ema's shadow_params
    are ordered like [p for p in parameters() if p.requires_grad], which
    EXCLUDES the requires_grad=False GFP `W` (reference layerspp.py:37), and
    loaded state-dict tensors carry no requires_grad flags at all — the
    trainable key set must come from the correspondence, not the tensors."""
    torch = pytest.importorskip("torch")

    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig
    from diffse_tpu.train.restore import load_score_model

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="bbed", model_type="sebridge_v2",
        snr_conditioned="false", fixed_snr=1.0, sigma_max=1.0,
    )
    ours = ScoreModel(
        cfg, backbone_kwargs=TINY,
        sde_kwargs=dict(T_sampling=0.999, k=2.6, theta=0.52, N=30),
    )
    variables = ours.init_variables(
        jax.random.PRNGKey(3), num_frames=16, num_freq_bins=16
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    ema = jax.tree_util.tree_map(lambda a: (0.5 * a).astype(a.dtype), params)

    corr = conv.ncsnpp_correspondence(**TINY)
    sd = conv.convert_flax_to_state_dict(params, corr)
    sd_ema = conv.convert_flax_to_state_dict(ema, corr)
    gfp_w = {f"dnn.{tp}.W" for tp, _, kind in corr if kind == "gfp"}
    assert gfp_w, "expected at least the time-embedding GFP in the mapping"
    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    }
    shadow = [
        torch.from_numpy(np.ascontiguousarray(sd_ema[k]))
        for k in state_dict if k not in gfp_w
    ]
    ckpt_path = os.path.join(str(tmp_path), "ref.ckpt")
    torch.save(
        {
            "state_dict": state_dict,
            "hyper_parameters": dict(
                sde="bbed", model_type="sebridge_v2", snr_conditioned="false",
                fixed_snr=1.0, sigma_max=1.0, k=2.6, theta=0.52,
                T_sampling=0.999,
            ),
            "ema": {"shadow_params": shadow},
        },
        ckpt_path,
    )

    out_dir = os.path.join(str(tmp_path), "converted")
    argv = ["--torch_ckpt", ckpt_path, "--out_dir", out_dir, "--ema"]
    for k, v in TINY.items():
        argv += ["--arch", f"{k}={v!r}"]
    conv.main(argv)

    model2, state = load_score_model(out_dir)
    assert model2.cfg.model_type == "sebridge_v2"
    assert model2.cfg.snr_conditioned == "false"

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.variables["params"], params,
    )
    # EMA restores the scaled tree except the GFP W, which is not
    # EMA-tracked and carries the live value.
    expected_ema = jax.tree_util.tree_map(lambda a: a, ema)
    expected_ema["time_embed"]["W"] = params["time_embed"]["W"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.ema_params, expected_ema,
    )

    # the restored model scores identically to the source model
    x = jnp.asarray(
        (np.random.default_rng(0).standard_normal((1, 1, 16, 16))
         + 1j * np.random.default_rng(1).standard_normal((1, 1, 16, 16))
         ).astype(np.complex64)
    )
    t = jnp.asarray([0.5], jnp.float32)
    out1, _ = ours.forward(variables, x, t, x)
    out2, _ = model2.forward({"params": state.variables["params"]}, x, t, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_cli_snrnet_roundtrip(tmp_path):
    """`main --kind snrnet` converts a fabricated SNR-estimator Lightning
    ckpt (the reference's snr_estimator.ckpt format: SNRModel with dnn.*
    keys + torch_ema shadow over ALL params) into an orbax directory that
    `load_snr_model` restores exactly, producing identical estimates."""
    torch = pytest.importorskip("torch")

    from diffse_tpu.models.snr_model import SNRModel
    from diffse_tpu.train.restore import load_snr_model

    model = SNRModel()
    variables = model.init_variables(jax.random.PRNGKey(5), num_frames=32)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    ema = jax.tree_util.tree_map(lambda a: (0.25 * a).astype(a.dtype), params)

    sd = conv.snrnet_flax_to_state_dict(params)
    sd_ema = conv.snrnet_flax_to_state_dict(ema)
    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    }
    shadow = [
        torch.from_numpy(np.ascontiguousarray(sd_ema[k])) for k in state_dict
    ]
    ckpt_path = os.path.join(str(tmp_path), "snr_estimator.ckpt")
    torch.save(
        {
            "state_dict": state_dict,
            "hyper_parameters": {"transform_type": "none"},
            "ema": {"shadow_params": shadow},
        },
        ckpt_path,
    )

    out_dir = os.path.join(str(tmp_path), "converted_snr")
    conv.main(["--torch_ckpt", ckpt_path, "--out_dir", out_dir,
               "--kind", "snrnet", "--ema"])

    model2, state = load_snr_model(out_dir)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 2, 256, 32))
        .astype(np.float32)
    )
    out1 = model.dnn.apply(variables, x)
    out2 = model2.dnn.apply({"params": state.variables["params"]}, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)

    # the EMA round trip is lossy ONLY in the torch bias split (summed back
    # on conversion): values must match the scaled tree exactly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=1e-7),
        state.ema_params, ema,
    )
