"""Checkpoint / resume — `GaussianModel.capture()/restore()` equivalent.

The reference snapshots (params, optimizer state, densification stats,
spatial_lr_scale) as a torch pickle tuple (`scene/gaussian_model.py:73-107`)
and persists config via an eval'd `cfg_args` file (`arguments/__init__.py:
100-120`). Here the whole `SLAMState` is one pytree: `save_state` writes it
as a flat npz + a json tree-def; `load_state` restores it bit-exact,
including Adam moments and the classifier. Config round-trips as json.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.core import config as config_mod
from sags_tpu.core.config import SLAMConfig
from sags_tpu.slam.step import SLAMState, init_state


def save_state(path: str, state: SLAMState, cfg: SLAMConfig) -> None:
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {}
    meta = []
    for i, leaf in enumerate(leaves):
        # jax PRNG keys serialize via key_data (np.asarray rejects them)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            arr = np.asarray(jax.random.key_data(leaf))
            meta.append({"idx": i, "kind": "prng"})
        else:
            arr = np.asarray(leaf)
            meta.append({"idx": i, "kind": "array"})
        arrays[f"leaf_{i}"] = arr
    np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"n_leaves": len(leaves), "leaves": meta}, f)
    with open(os.path.join(path, "cfg.json"), "w") as f:
        json.dump(_cfg_to_dict(cfg), f, indent=2)


def load_state(path: str) -> Tuple[SLAMState, SLAMConfig]:
    with open(os.path.join(path, "cfg.json")) as f:
        cfg = _cfg_from_dict(json.load(f))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "state.npz"))
    # rebuild against a template state with matching capacity
    capacity = int(data["leaf_0"].shape[0])  # map.xyz is the first leaf
    template = init_state(cfg, jax.random.key(0), capacity=capacity)
    _, treedef = jax.tree.flatten(template)
    leaves = []
    for entry in meta["leaves"]:
        arr = data[f"leaf_{entry['idx']}"]
        if entry["kind"] == "prng":
            leaves.append(jax.random.wrap_key_data(jnp.asarray(arr)))
        else:
            leaves.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, leaves), cfg


def _cfg_to_dict(cfg) -> dict:
    if dataclasses.is_dataclass(cfg):
        return {f.name: _cfg_to_dict(getattr(cfg, f.name))
                for f in dataclasses.fields(cfg)}
    return cfg


def _cfg_from_dict(d: dict, cls=SLAMConfig):
    kwargs = {}
    for f in dataclasses.fields(cls):
        v = d.get(f.name, dataclasses.MISSING)
        if v is dataclasses.MISSING:
            continue
        sub = f.type if isinstance(f.type, type) else None
        # resolve nested config dataclasses by field default factory
        default = (f.default_factory() if f.default_factory is not dataclasses.MISSING
                   else f.default)
        if dataclasses.is_dataclass(default):
            kwargs[f.name] = _cfg_from_dict(v, type(default))
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
