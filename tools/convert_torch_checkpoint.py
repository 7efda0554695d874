#!/usr/bin/env python
"""Convert a reference PyTorch Lightning checkpoint to diffse_tpu flax params.

The published reference checkpoints (reference README.md:52-53) store the
score network as ``dnn.all_modules.<idx>.<param>`` entries in a flat
state_dict, where ``all_modules`` is the ModuleList built by the NCSN++
constructor (sgmse/backbones/ncsnpp.py:99-245) plus the separate
``dnn.output_layer``. This script rebuilds the same construction walk for our
flax NCSN++ (whose ``nn.compact`` call order mirrors that walk) and maps every
tensor across, transposing layouts:

    torch Conv2d   OIHW  [out, in, kh, kw] -> flax HWIO [kh, kw, in, out]
    torch Linear   [out, in]               -> flax [in, out]
    torch GroupNorm weight/bias            -> flax scale/bias
    NIN W [in, units] / b                  -> identical
    GaussianFourierProjection W            -> identical

Also converts the EMA shadow parameters (checkpoint['ema']['shadow_params'],
ordered like model.parameters()) when present.

Usage:
    python tools/convert_torch_checkpoint.py --torch_ckpt model.ckpt \
        --out_dir converted_ckpt [--ema]

The conversion is validated in tests/test_convert.py by round-tripping a
synthesized torch-layout state_dict.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------------
# Construction walk: emit (torch_prefix, flax_path, kind) correspondences.
# kind in {conv, linear, groupnorm, nin, gfp, fir_conv} decides the transform.
# --------------------------------------------------------------------------


def _resblock_entries(torch_prefix: str, flax_path: Tuple[str, ...], in_ch: int,
                      out_ch: int, up_down: bool) -> List[tuple]:
    """ResnetBlockBigGANpp params (layerspp.py:214-243 <-> models/layers.py)."""
    e = [
        (f"{torch_prefix}.GroupNorm_0", flax_path + ("GroupNorm_0",), "groupnorm"),
        (f"{torch_prefix}.Conv_0", flax_path + ("Conv_0",), "conv"),
        (f"{torch_prefix}.Dense_0", flax_path + ("Dense_0",), "linear"),
        (f"{torch_prefix}.GroupNorm_1", flax_path + ("GroupNorm_1",), "groupnorm"),
        (f"{torch_prefix}.Conv_1", flax_path + ("Conv_1",), "conv"),
    ]
    if in_ch != out_ch or up_down:
        e.append((f"{torch_prefix}.Conv_2", flax_path + ("Conv_2",), "conv"))
    return e


def _attn_entries(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[tuple]:
    return [
        (f"{torch_prefix}.GroupNorm_0", flax_path + ("GroupNorm_0",), "groupnorm"),
        (f"{torch_prefix}.NIN_0", flax_path + ("NIN_0",), "nin"),
        (f"{torch_prefix}.NIN_1", flax_path + ("NIN_1",), "nin"),
        (f"{torch_prefix}.NIN_2", flax_path + ("NIN_2",), "nin"),
        (f"{torch_prefix}.NIN_3", flax_path + ("NIN_3",), "nin"),
    ]


def ncsnpp_correspondence(
    nf: int = 128,
    ch_mult=(1, 1, 2, 2, 2, 2, 2),
    num_res_blocks: int = 2,
    attn_resolutions=(16,),
    image_size: int = 256,
    conditional: bool = True,
) -> List[tuple]:
    """Walk the NCSN++ construction (ncsnpp.py:99-245) and emit the mapping.

    flax paths are relative to params root; torch prefixes relative to `dnn.`.
    """
    num_resolutions = len(ch_mult)
    all_res = [image_size // (2**i) for i in range(num_resolutions)]
    entries: List[tuple] = []
    m = 0  # torch all_modules index

    def t(idx):
        return f"all_modules.{idx}"

    # counters for flax auto-names
    counters = {"res": 0, "attn": 0, "combine": 0, "conv": 0}

    def flax_res():
        p = (f"ResnetBlockBigGANpp_{counters['res']}",)
        counters["res"] += 1
        return p

    def flax_attn():
        p = (f"AttnBlockpp_{counters['attn']}",)
        counters["attn"] += 1
        return p

    def flax_conv():
        p = (f"Conv_{counters['conv']}",)
        counters["conv"] += 1
        return p

    # time embedding
    entries.append((t(m), ("time_embed",), "gfp")); m += 1
    if conditional:
        entries.append((t(m), ("temb_dense_0",), "linear")); m += 1
        entries.append((t(m), ("temb_dense_1",), "linear")); m += 1

    # input conv 4 -> nf
    entries.append((t(m), flax_conv(), "conv")); m += 1

    in_ch = nf
    hs_c = [nf]
    for i_level in range(num_resolutions):
        for _ in range(num_res_blocks):
            out_ch = nf * ch_mult[i_level]
            entries.extend(_resblock_entries(t(m), flax_res(), in_ch, out_ch, False))
            m += 1
            in_ch = out_ch
            if all_res[i_level] in attn_resolutions:
                entries.extend(_attn_entries(t(m), flax_attn())); m += 1
            hs_c.append(in_ch)
        if i_level != num_resolutions - 1:
            entries.extend(_resblock_entries(t(m), flax_res(), in_ch, in_ch, True))
            m += 1
            # Combine (input_skip): 1x1 conv, sum method keeps channels
            entries.append((f"{t(m)}.Conv_0",
                            (f"Combine_{counters['combine']}", "Conv_0"), "conv"))
            counters["combine"] += 1
            m += 1
            hs_c.append(in_ch)

    # bottleneck
    entries.extend(_resblock_entries(t(m), flax_res(), in_ch, in_ch, False)); m += 1
    entries.extend(_attn_entries(t(m), flax_attn())); m += 1
    entries.extend(_resblock_entries(t(m), flax_res(), in_ch, in_ch, False)); m += 1

    # up path (progressive == output_skip)
    gn_counter = 0
    for i_level in reversed(range(num_resolutions)):
        for _ in range(num_res_blocks + 1):
            out_ch = nf * ch_mult[i_level]
            skip_ch = hs_c.pop()
            entries.extend(
                _resblock_entries(t(m), flax_res(), in_ch + skip_ch, out_ch, False)
            )
            m += 1
            in_ch = out_ch
        if all_res[i_level] in attn_resolutions:
            entries.extend(_attn_entries(t(m), flax_attn())); m += 1
        # output_skip pyramid: GroupNorm + conv3x3(channels)
        entries.append((t(m), (f"GroupNorm_{gn_counter}",), "groupnorm"))
        gn_counter += 1
        m += 1
        entries.append((t(m), flax_conv(), "conv")); m += 1
        if i_level != 0:
            entries.extend(_resblock_entries(t(m), flax_res(), in_ch, in_ch, True))
            m += 1

    entries.append(("output_layer", ("output_layer",), "conv"))
    return entries


# ------------------------------------------------------------- tensor moves


def _torch_to_flax_tensors(kind: str, torch_params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if kind == "conv":
        out = {"kernel": np.transpose(torch_params["weight"], (2, 3, 1, 0))}
        if "bias" in torch_params:
            out["bias"] = torch_params["bias"]
        return out
    if kind == "linear":
        out = {"kernel": np.transpose(torch_params["weight"], (1, 0))}
        if "bias" in torch_params:
            out["bias"] = torch_params["bias"]
        return out
    if kind == "groupnorm":
        return {"scale": torch_params["weight"], "bias": torch_params["bias"]}
    if kind == "nin":
        return {"W": torch_params["W"], "b": torch_params["b"]}
    if kind == "gfp":
        return {"W": torch_params["W"]}
    raise ValueError(kind)


def _flax_to_torch_tensors(kind: str, flax_params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse mapping (used by the round-trip test)."""
    if kind == "conv":
        out = {"weight": np.transpose(flax_params["kernel"], (3, 2, 0, 1))}
        if "bias" in flax_params:
            out["bias"] = flax_params["bias"]
        return out
    if kind == "linear":
        out = {"weight": np.transpose(flax_params["kernel"], (1, 0))}
        if "bias" in flax_params:
            out["bias"] = flax_params["bias"]
        return out
    if kind == "groupnorm":
        return {"weight": flax_params["scale"], "bias": flax_params["bias"]}
    if kind in ("nin", "gfp"):
        return dict(flax_params)
    raise ValueError(kind)


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    correspondence: List[tuple],
    torch_root: str = "dnn.",
) -> dict:
    """Map a reference state_dict (numpy values) onto a flax params tree."""
    params: dict = {}
    for torch_prefix, flax_path, kind in correspondence:
        collected = {}
        prefix = torch_root + torch_prefix + "."
        for key, value in state_dict.items():
            if key.startswith(prefix):
                sub = key[len(prefix):]
                if "." not in sub:
                    collected[sub] = np.asarray(value)
        if not collected:
            raise KeyError(f"no params found under {prefix}")
        for name, value in _torch_to_flax_tensors(kind, collected).items():
            _set_path(params, flax_path + (name,), value)
    return params


def convert_flax_to_state_dict(
    params: dict,
    correspondence: List[tuple],
    torch_root: str = "dnn.",
) -> Dict[str, np.ndarray]:
    """Inverse conversion (round-trip testing / exporting to torch)."""
    state_dict: Dict[str, np.ndarray] = {}
    for torch_prefix, flax_path, kind in correspondence:
        flax_params = {
            k: np.asarray(v) for k, v in _get_path(params, flax_path).items()
            if not isinstance(v, dict)
        }
        for name, value in _flax_to_torch_tensors(kind, flax_params).items():
            state_dict[f"{torch_root}{torch_prefix}.{name}"] = value
    return state_dict


# Per-SDE constructor kwargs: defaults first, then overridden by matching
# entries in the checkpoint's hyper_parameters (the reference serializes its
# SDE args there via save_hyperparameters, sgmse/model.py:93).
_SDE_DEFAULTS = {
    "bbed": dict(k=2.6, theta=0.52, T_sampling=0.999),
    "bbve": dict(sigma_min=0.05, sigma_max=2.6, theta=0.52, T_sampling=0.999),
    "ouve": dict(theta=1.5, sigma_min=0.05, sigma_max=0.5),
    "proposed_1": dict(T_sampling=0.99, sigma_min=1.0, sigma_max=1.0,
                       theta=0.53),
}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch_ckpt", type=str, required=True,
                        help="Reference .ckpt (Lightning) file")
    parser.add_argument("--out_dir", type=str, required=True,
                        help="Output CheckpointManager directory")
    parser.add_argument("--ema", action="store_true",
                        help="Also convert EMA shadow params")
    parser.add_argument("--arch", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="Backbone architecture overrides, e.g. "
                             "--arch nf=8 --arch 'ch_mult=(1, 2)' "
                             "(default: the production 65M NCSN++ config)")
    parser.add_argument("--kind", choices=["score", "snrnet"], default="score",
                        help="Checkpoint family: the score ScoreModel "
                             "(default) or the SNR-estimator SNRModel "
                             "(the reference's snr_estimator.ckpt, "
                             "sgmse/model.py:25-30)")
    args = parser.parse_args(argv)

    import ast

    import torch  # local import: only needed for real conversions

    arch = {}
    for kv in args.arch:
        k, _, v = kv.partition("=")
        try:
            arch[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            arch[k] = v

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    hp = ckpt.get("hyper_parameters", {})

    import jax
    import optax

    from diffse_tpu.train.checkpoints import CheckpointManager
    from diffse_tpu.train.state import create_train_state

    if args.kind == "snrnet":
        from diffse_tpu.models.snr_model import SNRModel, SNRModelConfig

        params = snrnet_state_dict_to_flax(state_dict)
        ema_params = params
        if args.ema and "ema" in ckpt:
            # SNRNet has no requires_grad=False params, so the torch_ema
            # shadow list is the full state_dict in registration order.
            shadow = [np.asarray(p) for p in ckpt["ema"]["shadow_params"]]
            if len(shadow) != len(state_dict):
                raise ValueError(
                    f"EMA shadow count {len(shadow)} != param count "
                    f"{len(state_dict)}"
                )
            ema_params = snrnet_state_dict_to_flax(
                dict(zip(state_dict.keys(), shadow))
            )
        model = SNRModel(SNRModelConfig(
            transform_type=str(hp.get("transform_type", "none")),
        ))
        state = create_train_state({"params": params}, optax.adam(model.cfg.lr))
        state = state.replace(ema_params=ema_params)
        mgr = CheckpointManager(args.out_dir, hparams=model.hparams)
        mgr.save(0, jax.tree_util.tree_map(np.asarray, state), {})
        mgr.close()
        print(f"converted SNR-estimator checkpoint written to {args.out_dir}")
        return

    corr = ncsnpp_correspondence(**arch)
    params = convert_state_dict_to_flax(state_dict, corr)

    ema_params = params
    if args.ema and "ema" in ckpt:
        # torch_ema's shadow_params are ordered like
        # [p for p in model.parameters() if p.requires_grad] — the state_dict
        # key order minus the requires_grad=False GFP `W` parameters
        # (layerspp.py:37; torch_ema filters non-trainable params at ctor).
        # Loaded state-dict tensors never carry requires_grad, so the
        # trainable set is reconstructed from the correspondence instead.
        shadow = [np.asarray(p) for p in ckpt["ema"]["shadow_params"]]
        gfp_w = {f"dnn.{tp}.W" for tp, _, kind in corr if kind == "gfp"}
        param_keys = [k for k in state_dict if k not in gfp_w]
        if len(param_keys) != len(shadow):
            raise ValueError(
                f"EMA shadow count {len(shadow)} != trainable param count "
                f"{len(param_keys)} — wrong --arch for this checkpoint?"
            )
        ema_sd = dict(zip(param_keys, shadow))
        for k in gfp_w:  # not EMA-tracked: carry the live value over
            ema_sd[k] = state_dict[k]
        ema_params = convert_state_dict_to_flax(ema_sd, corr)

    from diffse_tpu.models.score_model import ScoreModel, ScoreModelConfig

    cfg = ScoreModelConfig(
        backbone="ncsnpp",
        sde=hp.get("sde", "bbed"),
        model_type=hp.get("model_type", "sebridge_v3"),
        snr_conditioned=hp.get("snr_conditioned", "true"),
        fixed_snr=float(hp.get("fixed_snr", 1.0)),
        sigma_max=float(hp.get("sigma_max", 1.0)),
    )
    sde_kwargs = {
        k: float(hp[k]) if k in hp else v
        for k, v in _SDE_DEFAULTS.get(cfg.sde, {}).items()
    }
    model = ScoreModel(cfg, backbone_kwargs=arch, sde_kwargs=sde_kwargs)
    state = create_train_state({"params": params}, optax.adam(cfg.lr))
    state = state.replace(ema_params=ema_params)

    mgr = CheckpointManager(args.out_dir, hparams=model.hparams)
    mgr.save(0, jax.tree_util.tree_map(np.asarray, state), {})
    # save() dispatches an ASYNC orbax write — join it before returning, or
    # a short-lived CLI process can exit with the checkpoint uncommitted.
    mgr.close()
    print(f"converted checkpoint written to {args.out_dir}")


if __name__ == "__main__":
    main()


# ----------------------------------------------------------------- SNRNet


def snrnet_state_dict_to_flax(state_dict: Dict[str, np.ndarray],
                              torch_root: str = "dnn.") -> dict:
    """Convert the reference SNRNet state_dict (sgmse/backbones/snrnet.py:15-44)
    to diffse_tpu/models/snrnet.py flax params.

    torch LSTM gate order is (i, f, g, o); weight_ih [4h, in] / weight_hh
    [4h, h] slices transpose into flax OptimizedLSTMCell's ii/if/ig/io
    (input, no bias) and hi/hf/hg/ho (hidden, bias = bias_ih + bias_hh)
    dense kernels. Bidirectional: the `_reverse` weights land in `lstm_bwd`.
    """
    sd = {k[len(torch_root):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(torch_root)}
    params: dict = {}

    def conv(name_t, name_f):
        params[name_f] = {
            "kernel": np.transpose(sd[f"{name_t}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{name_t}.bias"],
        }

    conv("conv5x5_1", "conv5x5_1")
    conv("conv3x3_1", "conv3x3_1")
    # torch convt_1..4 have time-kernel widths 1/2/4/8; flax names convt_{width}
    for idx, width in zip(range(1, 5), (1, 2, 4, 8)):
        conv(f"convt_{idx}", f"convt_{width}")

    def lstm(direction_suffix, flax_name):
        # flax param scope: the cell module's own name (the RNN wrapper shares
        # the cell's scope) — OptimizedLSTMCell_0 = fwd, _1 = bwd.
        w_ih = sd[f"blstm.weight_ih_l0{direction_suffix}"]  # [4h, in]
        w_hh = sd[f"blstm.weight_hh_l0{direction_suffix}"]  # [4h, h]
        b_ih = sd[f"blstm.bias_ih_l0{direction_suffix}"]
        b_hh = sd[f"blstm.bias_hh_l0{direction_suffix}"]
        h = w_hh.shape[1]
        gates = {"i": 0, "f": 1, "g": 2, "o": 3}
        cell: dict = {}
        for g, gi in gates.items():
            sl = slice(gi * h, (gi + 1) * h)
            cell[f"i{g}"] = {"kernel": w_ih[sl].T}
            cell[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b_ih[sl] + b_hh[sl]}
        params[flax_name] = cell

    lstm("", "OptimizedLSTMCell_0")
    lstm("_reverse", "OptimizedLSTMCell_1")

    params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return params


def snrnet_flax_to_state_dict(params: dict, torch_root: str = "dnn.") -> Dict[str, np.ndarray]:
    """Inverse of :func:`snrnet_state_dict_to_flax` (round-trip testing; the
    summed LSTM bias is emitted as bias_ih with bias_hh = 0)."""
    sd: Dict[str, np.ndarray] = {}

    def conv(name_f, name_t):
        sd[f"{torch_root}{name_t}.weight"] = np.transpose(
            np.asarray(params[name_f]["kernel"]), (3, 2, 0, 1))
        sd[f"{torch_root}{name_t}.bias"] = np.asarray(params[name_f]["bias"])

    conv("conv5x5_1", "conv5x5_1")
    conv("conv3x3_1", "conv3x3_1")
    for idx, width in zip(range(1, 5), (1, 2, 4, 8)):
        conv(f"convt_{width}", f"convt_{idx}")

    def lstm(flax_name, direction_suffix):
        cell = params[flax_name]
        w_ih = np.concatenate(
            [np.asarray(cell[f"i{g}"]["kernel"]).T for g in "ifgo"], axis=0)
        w_hh = np.concatenate(
            [np.asarray(cell[f"h{g}"]["kernel"]).T for g in "ifgo"], axis=0)
        b = np.concatenate([np.asarray(cell[f"h{g}"]["bias"]) for g in "ifgo"])
        sd[f"{torch_root}blstm.weight_ih_l0{direction_suffix}"] = w_ih
        sd[f"{torch_root}blstm.weight_hh_l0{direction_suffix}"] = w_hh
        sd[f"{torch_root}blstm.bias_ih_l0{direction_suffix}"] = b
        sd[f"{torch_root}blstm.bias_hh_l0{direction_suffix}"] = np.zeros_like(b)

    lstm("OptimizedLSTMCell_0", "")
    lstm("OptimizedLSTMCell_1", "_reverse")

    sd[f"{torch_root}fc.weight"] = np.asarray(params["fc"]["kernel"]).T
    sd[f"{torch_root}fc.bias"] = np.asarray(params["fc"]["bias"])
    return sd
