"""PLY checkpointing with the reference's exact attribute schema.

`save_ply`/`load_ply` write/read the layout of `gaussian_model.py:296-310,
663-681`: x,y,z, nx,ny,nz (zeros), f_dc_*, f_rest_*, opacity, scale_*,
rot_0..3 (xyzw), obj_dc_0..15 — so maps round-trip with the reference's
viewers/tools. Uses `plyfile` when available, else a built-in binary-LE
writer/reader (the format is trivial).
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

try:
    from plyfile import PlyData, PlyElement

    _HAVE_PLYFILE = True
except Exception:  # pragma: no cover
    _HAVE_PLYFILE = False


def _attribute_names(n_rest: int, n_obj: int):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    names += [f"obj_dc_{i}" for i in range(n_obj)]
    return names


def save_ply(
    path: str,
    xyz: np.ndarray,
    f_dc: np.ndarray,  # [N,3]
    f_rest: np.ndarray,  # [N,R,3] (may be R=0)
    opacity_logit: np.ndarray,  # [N]
    log_scales: np.ndarray,  # [N,3]
    quats: np.ndarray,  # [N,4] xyzw
    obj_dc: np.ndarray,  # [N,O]
):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(xyz)
    # channel-major flatten, matching `transpose(1,2).flatten(1)` in the ref
    f_rest_flat = (
        f_rest.transpose(0, 2, 1).reshape(n, -1)
        if f_rest.size
        else np.zeros((n, 0), np.float32)
    )
    attrs = np.concatenate(
        [
            xyz,
            np.zeros_like(xyz),
            f_dc,
            f_rest_flat,
            opacity_logit.reshape(n, 1),
            log_scales,
            quats,
            obj_dc,
        ],
        axis=1,
    ).astype(np.float32)
    names = _attribute_names(f_rest_flat.shape[1], obj_dc.shape[1])
    assert attrs.shape[1] == len(names)

    if _HAVE_PLYFILE:
        dtype_full = [(a, "f4") for a in names]
        elements = np.empty(n, dtype=dtype_full)
        elements[:] = list(map(tuple, attrs))
        PlyData([PlyElement.describe(elements, "vertex")]).write(path)
        return

    with open(path, "wb") as f:  # pragma: no cover - plyfile is available here
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += [f"property float {a}" for a in names]
        header += ["end_header", ""]
        f.write("\n".join(header).encode())
        f.write(attrs.tobytes())


def _read_ply_raw(path: str):
    """Minimal PLY reader: binary_little_endian or ascii, float32 vertex
    properties only (all this schema needs). Returns (names, dict-like)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n = int(next(l.split()[2] for l in header if l.startswith("element vertex")))
        names = [l.split()[2] for l in header if l.startswith("property")]
        if fmt == "binary_little_endian":
            data = np.frombuffer(f.read(n * len(names) * 4), dtype="<f4")
            data = data.reshape(n, len(names))
        elif fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float32, max_rows=n).reshape(n, len(names))
        else:  # pragma: no cover
            raise ValueError(f"unsupported ply format {fmt}")
    return names, {nm: data[:, i] for i, nm in enumerate(names)}


def load_ply(path: str):
    """Returns dict with xyz, f_dc, f_rest [N,R,3], opacity_logit, log_scales,
    quats, obj_dc — mirroring `load_ply` (`gaussian_model.py:380-426`)."""
    if _HAVE_PLYFILE:
        ply = PlyData.read(path)
        v = ply["vertex"]
        names = [p.name for p in v.properties]
    else:
        names, v = _read_ply_raw(path)
    xyz = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    n = len(xyz)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], -1).astype(np.float32)
    rest_names = sorted(
        (nm for nm in names if nm.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    R3 = len(rest_names)
    if R3:
        flat = np.stack([v[nm] for nm in rest_names], -1).astype(np.float32)
        f_rest = flat.reshape(n, 3, R3 // 3).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    obj_names = sorted(
        (nm for nm in names if nm.startswith("obj_dc_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    obj_dc = (
        np.stack([v[nm] for nm in obj_names], -1).astype(np.float32)
        if obj_names
        else np.zeros((n, 0), np.float32)
    )
    return dict(
        xyz=xyz,
        f_dc=f_dc,
        f_rest=f_rest,
        opacity_logit=np.asarray(v["opacity"], np.float32),
        log_scales=np.stack([v[f"scale_{i}"] for i in range(3)], -1).astype(np.float32),
        quats=np.stack([v[f"rot_{i}"] for i in range(4)], -1).astype(np.float32),
        obj_dc=obj_dc,
    )


def save_map_ply(path: str, m) -> None:
    """Save a (compacted) GaussianMap."""
    import jax.numpy as jnp

    from sags_tpu.mapping import gaussian_map as gm

    act = np.asarray(m.active)
    save_ply(
        path,
        np.asarray(m.xyz)[act],
        np.asarray(m.f_dc)[act],
        np.asarray(m.f_rest)[act],
        np.asarray(m.opacity_logit)[act],
        np.asarray(m.log_scales)[act],
        np.asarray(m.quats)[act],
        np.asarray(m.obj_dc)[act],
    )


def load_map_ply(path: str, capacity: Optional[int] = None, cfg=None):
    """Load into a fresh GaussianMap (capacity ≥ point count)."""
    import jax.numpy as jnp

    from sags_tpu.core.config import MapConfig
    from sags_tpu.mapping import gaussian_map as gm

    d = load_ply(path)
    n = len(d["xyz"])
    cap = capacity or max(1, 1 << (n - 1).bit_length())
    cfg = cfg or MapConfig(
        sh_degree=int(round((d["f_rest"].shape[1] + 1) ** 0.5)) - 1,
        num_objects=d["obj_dc"].shape[1] or 16,
    )
    m = gm.init_map(cap, cfg)
    O = m.obj_dc.shape[1]
    obj = d["obj_dc"] if d["obj_dc"].shape[1] == O else np.zeros((n, O), np.float32)
    m = m._replace(
        xyz=m.xyz.at[:n].set(d["xyz"]),
        f_dc=m.f_dc.at[:n].set(d["f_dc"]),
        f_rest=m.f_rest.at[:n].set(d["f_rest"][:, : m.f_rest.shape[1]]),
        opacity_logit=m.opacity_logit.at[:n].set(d["opacity_logit"]),
        log_scales=m.log_scales.at[:n].set(d["log_scales"]),
        quats=m.quats.at[:n].set(d["quats"]),
        obj_dc=m.obj_dc.at[:n].set(obj),
        active=m.active.at[:n].set(True),
        count=jnp.asarray(n, jnp.int32),
    )
    return m
