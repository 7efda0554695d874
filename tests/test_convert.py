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
