"""Torch checkpoint import/export.

The reference stores ``torch.save({"model": state_dict})`` checkpoints
(``train_Point2Cyl_without_sketch.py:406-430``) and 3-net dicts
{model, implicit_net, pn_encoder} (``train_Point2Cyl.py:753-777``); its
IGR checkpoints use {model_state_dict, encoder_state_dict}
(``eval.py:206-210``). This module maps those state_dicts to/from this
framework's flax parameter trees so reference-trained weights drop in and
weights trained here export back.

Key mapping (torch -> flax):
  sa{1,2}.mlp_convs.{j}   -> SetAbstraction_{0,1}/PointMLP_0/TorchDense_{j}
  sa3.mlp_convs.{j}       -> GlobalAbstraction_0/PointMLP_0/TorchDense_{j}
  fp{3,2,1}.mlp_convs.{j} -> FeaturePropagation_{0,1,2}/PointMLP_0/...
  *.mlp_bns.{j}           -> .../TorchBatchNorm_{j} (+ batch_stats)
  fc1 / bn1               -> TorchDense_0 / TorchBatchNorm_0 (top level)
  fc2.{i}                 -> TorchDense_{i+1}
Conv kernels (out, in, 1[, 1]) transpose to dense (in, out).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _to_numpy(x) -> np.ndarray:
    return np.asarray(getattr(x, "detach", lambda: x)().cpu().numpy()
                      if hasattr(x, "detach") else x)


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth into nested dicts of numpy arrays."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    def conv(obj):
        if isinstance(obj, dict):
            return {k: conv(v) for k, v in obj.items()}
        return _to_numpy(obj)
    return conv(ckpt)


def save_torch_checkpoint(path: str, tree: dict) -> None:
    """Save nested numpy dicts as a torch .pth."""
    import torch

    def conv(obj):
        if isinstance(obj, dict):
            return {k: conv(v) for k, v in obj.items()}
        return torch.from_numpy(np.asarray(obj))

    torch.save(conv(tree), path)


def _backbone_module_map(num_sa: int = 2, num_fp: int = 3) -> dict:
    """torch module prefix -> (flax scope path, number suffix start)."""
    mapping = {}
    for i in range(num_sa):
        mapping[f"sa{i + 1}"] = (f"SetAbstraction_{i}", "PointMLP_0")
    mapping[f"sa{num_sa + 1}"] = ("GlobalAbstraction_0", "PointMLP_0")
    for i in range(num_fp):
        mapping[f"fp{num_fp - i}"] = (f"FeaturePropagation_{i}", "PointMLP_0")
    return mapping


def import_backbone(state_dict: dict, params: Any, batch_stats: Any):
    """Populate flax backbone params/batch_stats from a reference
    state_dict. Returns new (params, batch_stats) (plain dict trees)."""
    import flax

    params = flax.core.unfreeze(
        flax.traverse_util.flatten_dict(params, sep="/")
    )
    stats = flax.core.unfreeze(
        flax.traverse_util.flatten_dict(batch_stats, sep="/")
    )
    mmap = _backbone_module_map()

    for key, val in state_dict.items():
        val = _to_numpy(val)
        parts = key.split(".")
        mod = parts[0]
        if mod in mmap:
            scope, mlp = mmap[mod]
            kind, j, leaf = parts[1], int(parts[2]), parts[3]
            if kind == "mlp_convs":
                dest = f"{scope}/{mlp}/TorchDense_{j}/"
                if leaf == "weight":
                    params[dest + "kernel"] = val.reshape(
                        val.shape[0], val.shape[1]
                    ).T
                else:
                    params[dest + "bias"] = val
            elif kind == "mlp_bns":
                dest = f"{scope}/{mlp}/TorchBatchNorm_{j}/"
                if leaf == "weight":
                    params[dest + "scale"] = val
                elif leaf == "bias":
                    params[dest + "bias"] = val
                elif leaf == "running_mean":
                    stats[dest + "mean"] = val
                elif leaf == "running_var":
                    stats[dest + "var"] = val
        elif mod == "fc1":
            leaf = parts[1]
            if leaf == "weight":
                params["TorchDense_0/kernel"] = val.reshape(
                    val.shape[0], val.shape[1]
                ).T
            else:
                params["TorchDense_0/bias"] = val
        elif mod == "bn1":
            leaf = parts[1]
            if leaf == "weight":
                params["TorchBatchNorm_0/scale"] = val
            elif leaf == "bias":
                params["TorchBatchNorm_0/bias"] = val
            elif leaf == "running_mean":
                stats["TorchBatchNorm_0/mean"] = val
            elif leaf == "running_var":
                stats["TorchBatchNorm_0/var"] = val
        elif mod == "fc2":
            i, leaf = int(parts[1]), parts[2]
            dest = f"TorchDense_{i + 1}/"
            if leaf == "weight":
                params[dest + "kernel"] = val.reshape(
                    val.shape[0], val.shape[1]
                ).T
            else:
                params[dest + "bias"] = val
    return (
        flax.traverse_util.unflatten_dict(params, sep="/"),
        flax.traverse_util.unflatten_dict(stats, sep="/"),
    )


def export_backbone(params: Any, batch_stats: Any) -> dict:
    """Inverse of ``import_backbone``: flax trees -> reference state_dict
    (conv weights reshaped back to (out, in, 1[, 1]))."""
    import flax

    flat_p = flax.traverse_util.flatten_dict(params, sep="/")
    flat_s = flax.traverse_util.flatten_dict(batch_stats, sep="/")
    out = {}
    mmap = _backbone_module_map()
    inv = {v[0]: (k, v[1]) for k, v in mmap.items()}

    for key, val in flat_p.items():
        val = np.asarray(val)
        parts = key.split("/")
        if parts[0] in inv:
            mod, _ = inv[parts[0]]
            layer = parts[2]
            j = int(layer.split("_")[1])
            conv_rank = 4 if mod.startswith("sa") else 3
            if layer.startswith("TorchDense"):
                leaf = parts[3]
                if leaf == "kernel":
                    w = val.T
                    w = w.reshape(w.shape + (1,) * (conv_rank - 2))
                    out[f"{mod}.mlp_convs.{j}.weight"] = w
                else:
                    out[f"{mod}.mlp_convs.{j}.bias"] = val
            else:  # TorchBatchNorm
                leaf = parts[3]
                name = {"scale": "weight", "bias": "bias"}[leaf]
                out[f"{mod}.mlp_bns.{j}.{name}"] = val
        elif parts[0] == "TorchDense_0":
            if parts[1] == "kernel":
                out["fc1.weight"] = val.T.reshape(*val.T.shape, 1)
            else:
                out["fc1.bias"] = val
        elif parts[0] == "TorchBatchNorm_0":
            name = {"scale": "weight", "bias": "bias"}[parts[1]]
            out[f"bn1.{name}"] = val
        elif parts[0].startswith("TorchDense_"):
            i = int(parts[0].split("_")[1]) - 1
            if parts[1] == "kernel":
                out[f"fc2.{i}.weight"] = val.T.reshape(*val.T.shape, 1)
            else:
                out[f"fc2.{i}.bias"] = val

    for key, val in flat_s.items():
        val = np.asarray(val)
        parts = key.split("/")
        leaf = {"mean": "running_mean", "var": "running_var"}[parts[-1]]
        if parts[0] in inv:
            mod, _ = inv[parts[0]]
            j = int(parts[2].split("_")[1])
            out[f"{mod}.mlp_bns.{j}.{leaf}"] = val
        elif parts[0] == "TorchBatchNorm_0":
            out[f"bn1.{leaf}"] = val
    return out


def import_implicit(state_dict: dict, params: Any):
    """Reference ImplicitNet lin{i}.{weight,bias} -> flax Dense_{i}."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    for key, val in state_dict.items():
        val = _to_numpy(val)
        layer, leaf = key.split(".")
        i = int(layer.replace("lin", ""))
        if leaf == "weight":
            flat[f"Dense_{i}/kernel"] = val.T
        else:
            flat[f"Dense_{i}/bias"] = val
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def export_implicit(params: Any) -> dict:
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for key, val in flat.items():
        val = np.asarray(val)
        i = int(key.split("/")[0].split("_")[1])
        if key.endswith("kernel"):
            out[f"lin{i}.weight"] = val.T
        else:
            out[f"lin{i}.bias"] = val
    return out


# Encoder layout: torch Sequential indices of convs/bns within mlp1/mlp2
_ENC_CONVS = [("mlp1", 0, 0), ("mlp1", 3, 1), ("mlp2", 0, 2),
              ("mlp2", 3, 3), ("mlp2", 6, 4)]
_ENC_BNS = [("mlp1", 1, 0), ("mlp1", 4, 1), ("mlp2", 1, 2),
            ("mlp2", 4, 3), ("mlp2", 7, 4)]


def import_encoder(state_dict: dict, params: Any, batch_stats: Any):
    """Reference PointNetEncoder (IGR/network.py:132-174) -> flax trees."""
    import flax

    flat_p = flax.traverse_util.flatten_dict(params, sep="/")
    flat_s = flax.traverse_util.flatten_dict(batch_stats, sep="/")
    for mod, t_idx, f_idx in _ENC_CONVS:
        w = _to_numpy(state_dict[f"{mod}.{t_idx}.weight"])
        flat_p[f"TorchDense_{f_idx}/kernel"] = w.reshape(
            w.shape[0], w.shape[1]
        ).T
        flat_p[f"TorchDense_{f_idx}/bias"] = _to_numpy(
            state_dict[f"{mod}.{t_idx}.bias"]
        )
    for mod, t_idx, f_idx in _ENC_BNS:
        flat_p[f"TorchBatchNorm_{f_idx}/scale"] = _to_numpy(
            state_dict[f"{mod}.{t_idx}.weight"]
        )
        flat_p[f"TorchBatchNorm_{f_idx}/bias"] = _to_numpy(
            state_dict[f"{mod}.{t_idx}.bias"]
        )
        flat_s[f"TorchBatchNorm_{f_idx}/mean"] = _to_numpy(
            state_dict[f"{mod}.{t_idx}.running_mean"]
        )
        flat_s[f"TorchBatchNorm_{f_idx}/var"] = _to_numpy(
            state_dict[f"{mod}.{t_idx}.running_var"]
        )
    flat_p["TorchDense_5/kernel"] = _to_numpy(state_dict["fc.weight"]).T
    flat_p["TorchDense_5/bias"] = _to_numpy(state_dict["fc.bias"])
    return (
        flax.traverse_util.unflatten_dict(flat_p, sep="/"),
        flax.traverse_util.unflatten_dict(flat_s, sep="/"),
    )


def export_encoder(params: Any, batch_stats: Any) -> dict:
    import flax

    flat_p = flax.traverse_util.flatten_dict(params, sep="/")
    flat_s = flax.traverse_util.flatten_dict(batch_stats, sep="/")
    out = {}
    for mod, t_idx, f_idx in _ENC_CONVS:
        w = np.asarray(flat_p[f"TorchDense_{f_idx}/kernel"]).T
        out[f"{mod}.{t_idx}.weight"] = w.reshape(*w.shape, 1)
        out[f"{mod}.{t_idx}.bias"] = np.asarray(
            flat_p[f"TorchDense_{f_idx}/bias"]
        )
    for mod, t_idx, f_idx in _ENC_BNS:
        out[f"{mod}.{t_idx}.weight"] = np.asarray(
            flat_p[f"TorchBatchNorm_{f_idx}/scale"]
        )
        out[f"{mod}.{t_idx}.bias"] = np.asarray(
            flat_p[f"TorchBatchNorm_{f_idx}/bias"]
        )
        out[f"{mod}.{t_idx}.running_mean"] = np.asarray(
            flat_s[f"TorchBatchNorm_{f_idx}/mean"]
        )
        out[f"{mod}.{t_idx}.running_var"] = np.asarray(
            flat_s[f"TorchBatchNorm_{f_idx}/var"]
        )
    out["fc.weight"] = np.asarray(flat_p["TorchDense_5/kernel"]).T
    out["fc.bias"] = np.asarray(flat_p["TorchDense_5/bias"])
    return out
