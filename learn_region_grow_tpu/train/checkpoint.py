"""Checkpointing: flat-key npz of param/opt pytrees + JSON config sidecar.

The reference saves a full TF graph once at end of training
(``train_region_grow.py:222``); here checkpoints are host-portable npz files
written at configurable cadence, with the same config-keyed naming scheme
(``train_region_grow.py:39-54``) so runs are discoverable the same way.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str, params, config: Optional[dict] = None,
                    opt_state=None, step: int = 0):
    """Write params (+optionally the optimizer state) and a step counter.

    ``opt_state`` leaves are stored in ``jax.tree`` flatten order under
    ``opt/{i}`` keys; restore them with :func:`load_opt_state` against a
    freshly initialized state of the same structure (the treedef itself —
    optax namedtuples — is not serialized). The reference saves only a
    final full-graph checkpoint (``train_region_grow.py:222``); mid-train
    cadence + resume is the TPU-native extension (SURVEY.md §5 checkpoint
    row).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    flat["__step__"] = np.asarray(step)
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree_util.tree_leaves(
                jax.device_get(opt_state))):
            flat[f"opt/{i}"] = np.asarray(leaf)
    np.savez(path, **flat)
    if config is not None:
        with open(path + ".json", "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(path: str) -> Tuple[Any, int, Optional[dict]]:
    """Returns (params, step, config_or_None)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    flat = {}
    step = 0
    for k in data.files:
        if k == "__step__":
            step = int(data[k])
        elif k.startswith("params/"):
            flat[k[len("params/"):]] = data[k]
    params = _unflatten(flat)
    config = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            config = json.load(f)
    return params, step, config


def load_opt_state(path: str, like) -> Any:
    """Restore an optimizer state saved by :func:`save_checkpoint` into the
    tree structure of ``like`` (a freshly initialized state). Returns
    ``like`` unchanged when the checkpoint has no optimizer leaves."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    opt_keys = sorted((k for k in data.files if k.startswith("opt/")),
                      key=lambda k: int(k.split("/")[1]))
    if not opt_keys:
        return like
    leaves = [data[k] for k in opt_keys]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} optimizer leaves, expected "
            f"{treedef.num_leaves} — optimizer config mismatch")
    ref_leaves = jax.tree_util.tree_leaves(like)
    leaves = [np.asarray(l, dtype=np.asarray(r).dtype)
              for l, r in zip(leaves, ref_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def lrgnet_model_path(models_dir: str, val_area: str, feature_size: int = 13,
                      num_inlier: int = 512, num_neighbor: int = 512,
                      lite: Optional[int] = None,
                      cross_domain: bool = False,
                      train_area: Optional[str] = None,
                      emb: bool = False) -> str:
    """Config-keyed checkpoint naming, mirroring ``train_region_grow.py:39-54``
    (plus the embedding-conditioned variant, ``experimental/
    test_region_grow_emb.py`` — not named upstream, chosen here)."""
    if cross_domain:
        return os.path.join(models_dir, "cross_domain",
                            f"lrgnet_{train_area}.npz")
    if emb:
        return os.path.join(models_dir, f"lrgnet_emb_model{val_area}.npz")
    if feature_size == 6:
        name = f"lrgnet_model{val_area}_xyz"
    elif feature_size == 9:
        name = f"lrgnet_model{val_area}_xyzrgb"
    elif feature_size == 12:
        name = f"lrgnet_model{val_area}_xyzrgbn"
    elif num_inlier != 512 or num_neighbor != 512:
        name = f"lrgnet_model{val_area}_i_{num_inlier}_j_{num_neighbor}"
    elif lite is not None:
        name = f"lrgnet_model{val_area}_lite_{lite}"
    else:
        name = f"lrgnet_model{val_area}"
    return os.path.join(models_dir, name + ".npz")
