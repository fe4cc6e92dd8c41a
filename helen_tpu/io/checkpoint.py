"""Checkpoint I/O: native .npz format plus reference-checkpoint conversion.

Native format: a single ``.npz`` holding every pytree leaf under a
``/``-joined key path, plus a JSON ``__meta__`` blob (model dims, epoch,
format version). Optimizer state is stored the same way under ``opt/`` with
leaves in flatten order — reconstructed at load time against a freshly
``optimizer.init``-ed treedef, so no pickling of optax internals.

Reference conversion: the published HELEN models are torch ``.pkl``
checkpoints ``{model_state_dict, model_optimizer, hidden_size, gru_layers,
epochs}`` (reference ModelHander.py:127-133). ``import_torch_checkpoint``
maps torch nn.GRU / nn.Linear weight layouts onto helen_tpu's param pytree
(transposed for right-multiplication; DDP ``module.`` prefixes stripped as in
reference ModelHander.py:70-75). ``export_torch_state_dict`` goes the other
way so polished models remain usable with the reference tooling.
"""
from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# pytree <-> flat dict
# ---------------------------------------------------------------------------

def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            out.update(flatten_tree(tree[k], f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


# ---------------------------------------------------------------------------
# native checkpoint
# ---------------------------------------------------------------------------

def save_checkpoint(
    path: str,
    params: Any,
    meta: Optional[Dict[str, Any]] = None,
    opt_state: Any = None,
) -> None:
    """Atomically write params (+ optional optimizer state) to ``path``."""
    import jax

    arrays = {f"params/{k}": v for k, v in flatten_tree(jax.device_get(params)).items()}
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
        for i, leaf in enumerate(leaves):
            arrays[f"opt/{i:05d}"] = np.asarray(leaf)
    meta = dict(meta or {})
    meta["format_version"] = FORMAT_VERSION
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)  # atomic: a preempted writer never corrupts the file


def load_checkpoint(
    path: str, opt_state_template: Any = None
) -> Tuple[Dict[str, Any], Dict[str, Any], Any]:
    """Load (params, meta, opt_state). ``opt_state_template`` (e.g. from
    ``optimizer.init(params)``) supplies the treedef for optimizer state; pass
    None to skip optimizer restore, or a callable ``params -> template`` to
    build the template from the loaded params (single file read)."""
    import jax

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        params_flat = {
            k[len("params/") :]: data[k] for k in data.files if k.startswith("params/")
        }
        opt_keys = sorted(k for k in data.files if k.startswith("opt/"))
        opt_leaves = [data[k] for k in opt_keys]
    params = unflatten_tree(params_flat)
    opt_state = None
    if callable(opt_state_template) and not hasattr(opt_state_template, "ndim"):
        opt_state_template = opt_state_template(params) if opt_leaves else None
    if opt_state_template is not None and opt_leaves:
        treedef = jax.tree_util.tree_structure(opt_state_template)
        template_leaves = jax.tree_util.tree_leaves(opt_state_template)
        if len(template_leaves) != len(opt_leaves):
            raise ValueError(
                f"optimizer state mismatch: checkpoint has {len(opt_leaves)} leaves, "
                f"template has {len(template_leaves)}"
            )
        coerced = [
            np.asarray(saved, dtype=np.asarray(tmpl).dtype).reshape(np.shape(tmpl))
            for saved, tmpl in zip(opt_leaves, template_leaves)
        ]
        opt_state = jax.tree_util.tree_unflatten(treedef, coerced)
    return params, meta, opt_state


# ---------------------------------------------------------------------------
# reference (torch pkl) conversion
# ---------------------------------------------------------------------------

_GRU_MAP = {"gru_encoder": "encoder", "gru_decoder": "decoder"}
_HEAD_MAP = {"dense1_base": "base_head", "dense2_rle": "rle_head"}


def _strip_ddp(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def params_from_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference TransducerGRU state dict into helen_tpu params.

    Handles any gru_layers the reference supports (torch nn.GRU names deeper
    layers ``weight_ih_l<k>[_reverse]``); layer 0 lands in the stack's
    {"fwd", "bwd"} keys, layer k >= 1 under "l<k>" (models.transducer
    init_params layout)."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in _strip_ddp(state_dict).items()}
    params: Dict[str, Any] = {}
    for torch_name, ours in _GRU_MAP.items():

        def dir_params(k: int, suffix: str) -> Dict[str, Any]:
            return {
                # torch stores (3H, D); we right-multiply so transpose
                "w_ih": sd[f"{torch_name}.weight_ih_l{k}{suffix}"].T.copy(),
                "w_hh": sd[f"{torch_name}.weight_hh_l{k}{suffix}"].T.copy(),
                "b_ih": sd[f"{torch_name}.bias_ih_l{k}{suffix}"].copy(),
                "b_hh": sd[f"{torch_name}.bias_hh_l{k}{suffix}"].copy(),
            }

        stack: Dict[str, Any] = {
            "fwd": dir_params(0, ""), "bwd": dir_params(0, "_reverse")
        }
        k = 1
        while f"{torch_name}.weight_ih_l{k}" in sd:
            stack[f"l{k}"] = {
                "fwd": dir_params(k, ""), "bwd": dir_params(k, "_reverse")
            }
            k += 1
        params[ours] = stack
    for torch_name, ours in _HEAD_MAP.items():
        params[ours] = {
            "w": sd[f"{torch_name}.weight"].T.copy(),
            "b": sd[f"{torch_name}.bias"].copy(),
        }
    return params


def export_torch_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """Inverse of params_from_torch_state_dict (numpy arrays, torch layout)."""
    import jax

    p = jax.device_get(params)
    sd: Dict[str, np.ndarray] = {}
    for torch_name, ours in _GRU_MAP.items():
        stack = p[ours]
        layers = [{"fwd": stack["fwd"], "bwd": stack["bwd"]}]
        while f"l{len(layers)}" in stack:
            layers.append(stack[f"l{len(layers)}"])
        for k, layer in enumerate(layers):
            for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
                d = layer[direction]
                sd[f"{torch_name}.weight_ih_l{k}{suffix}"] = np.asarray(d["w_ih"]).T.copy()
                sd[f"{torch_name}.weight_hh_l{k}{suffix}"] = np.asarray(d["w_hh"]).T.copy()
                sd[f"{torch_name}.bias_ih_l{k}{suffix}"] = np.asarray(d["b_ih"]).copy()
                sd[f"{torch_name}.bias_hh_l{k}{suffix}"] = np.asarray(d["b_hh"]).copy()
    for torch_name, ours in _HEAD_MAP.items():
        sd[f"{torch_name}.weight"] = np.asarray(p[ours]["w"]).T.copy()
        sd[f"{torch_name}.bias"] = np.asarray(p[ours]["b"]).copy()
    return sd


def import_torch_checkpoint(pkl_path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference ``.pkl`` model and return (params, meta)."""
    import torch

    ckpt = torch.load(pkl_path, map_location="cpu", weights_only=False)
    state_dict = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    params = params_from_torch_state_dict(state_dict)
    meta = {
        "hidden_size": int(ckpt.get("hidden_size", 128)),
        "gru_layers": int(ckpt.get("gru_layers", 1)),
        "epochs": int(ckpt.get("epochs", 0)),
        "source": os.path.basename(pkl_path),
    }
    return params, meta


def export_torch_checkpoint(path: str, params: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    """Write a reference-format ``.pkl`` checkpoint (ModelHander.py:127-133
    layout) so models trained here remain usable with the reference tooling."""
    import torch

    from helen_tpu.models.transducer import model_geometry

    meta = dict(meta or {})
    geom = model_geometry(params)  # authoritative: shapes, not metadata
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params).items()}
    torch.save(
        {
            "model_state_dict": sd,
            "model_optimizer": {},
            "hidden_size": geom.hidden_size,
            "gru_layers": geom.gru_layers,
            "epochs": int(meta.get("epochs", 0)),
        },
        path,
    )


def load_model_any(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load either a native .npz checkpoint or a reference torch .pkl."""
    if path.endswith(".npz"):
        params, meta, _ = load_checkpoint(path)
        return params, meta
    # both npz and torch checkpoints are zip archives; probe for our marker
    try:
        with np.load(path) as data:
            is_native = "__meta__" in data.files
    except Exception:
        is_native = False
    if is_native:
        params, meta, _ = load_checkpoint(path)
        return params, meta
    return import_torch_checkpoint(path)
