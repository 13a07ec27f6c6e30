"""Camera model: world→view, OpenGL-style projection, fov/focal conversions.

Matches the reference's camera math:
  * `getWorld2View_traditional` — V = [Rᵀ, −Rᵀ t; 0 1] (`scene/shared_objs.py:21-43`,
    `utils/graphics_utils.py:31-49`)
  * `getProjectionMatrix` (`utils/graphics_utils.py:52-73`, `shared_objs.py:91-111`)
  * `fov2focal` / `focal2fov` (`utils/graphics_utils.py:75-79`)
  * ndc→pixel mapping of the rasterizer (`cuda_rasterizer/auxiliary.h:41-48`)

All matrices here are in **math convention** (apply as `M @ [p; 1]`). The reference
stores them transposed on the torch side because its CUDA kernels index flat arrays
column-major; we keep the math form and document the difference.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: jax.Array, t: jax.Array) -> jax.Array:
    """Camera pose (R: cam→world rotation, t: cam center in world) → 4x4 view matrix.

    V = [Rᵀ, −Rᵀ t; 0, 1] — `getWorld2View_traditional` (`shared_objs.py:21-43`).
    """
    Rt = R.T
    V = jnp.eye(4, dtype=R.dtype)
    V = V.at[:3, :3].set(Rt)
    V = V.at[:3, 3].set(-Rt @ t)
    return V


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> jnp.ndarray:
    """OpenGL-style (but z∈[0,1]) projection, exactly `getProjectionMatrix`."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return jnp.asarray(P)


def ndc2pix(v: jax.Array, size: int) -> jax.Array:
    """NDC [-1,1] → pixel center coordinate (`auxiliary.h:41-44`)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def pix2ndc(y: jax.Array, size: int) -> jax.Array:
    return (2.0 * y + 1.0) / (size + 1e-6) - 1.0


@jax.tree_util.register_pytree_node_class
class Camera:
    """A pinhole camera, jit-friendly: pose matrices are pytree leaves (may be
    traced), while width/height/fov are static aux data so shape computations
    (tile grids) stay python ints under jit.

    Equivalent of the reference's `SharedCam` (`scene/shared_objs.py:198-276`)
    minus the shared-memory plumbing (unnecessary on TPU — the frame queue is
    host-side, see `sags_tpu.io.queue`).
    """

    def __init__(self, width, height, fovx, fovy, world_view, full_proj,
                 cam_center, znear=0.01, zfar=100.0):
        self.width = int(width)
        self.height = int(height)
        self.fovx = float(fovx)
        self.fovy = float(fovy)
        self.world_view = world_view  # [4,4] V (math convention)
        self.full_proj = full_proj  # [4,4] P @ V
        self.cam_center = cam_center  # [3] camera position in world
        self.znear = float(znear)
        self.zfar = float(zfar)

    def tree_flatten(self):
        leaves = (self.world_view, self.full_proj, self.cam_center)
        aux = (self.width, self.height, self.fovx, self.fovy, self.znear, self.zfar)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        w, h, fx, fy, zn, zf = aux
        return cls(w, h, fx, fy, *leaves, znear=zn, zfar=zf)

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> float:
        return fov2focal(self.fovx, self.width)

    @property
    def focal_y(self) -> float:
        return fov2focal(self.fovy, self.height)


def make_camera(
    R: jax.Array,
    t: jax.Array,
    width: int,
    height: int,
    fovx: float,
    fovy: float,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Build a Camera from pose (R: cam→world rotation, t: camera center)."""
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    V = world_to_view(R, t)
    P = projection_matrix(znear, zfar, fovx, fovy)
    # Geometry must stay fp32 even on TPU (default matmul precision is bf16,
    # which costs ~0.1% on projected coordinates — visible pixel error).
    full_proj = jnp.matmul(P, V, precision=jax.lax.Precision.HIGHEST)
    return Camera(
        width=width,
        height=height,
        fovx=fovx,
        fovy=fovy,
        world_view=V,
        full_proj=full_proj,
        cam_center=t,
        znear=znear,
        zfar=zfar,
    )


def make_camera_from_intrinsics(
    R,
    t,
    width: int,
    height: int,
    fx: float,
    fy: float,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    return make_camera(
        R, t, width, height, focal2fov(fx, width), focal2fov(fy, height), znear, zfar
    )


def camera_to_json(cam_id: int, camera: Camera, img_name: str = "") -> dict:
    """Serializable camera entry for `cameras.json` (SIBR-viewer convention),
    matching `utils/camera_utils.py:66-88` (`camera_to_JSON`): position and
    rotation are camera→world, focals derived from the fovs.
    """
    V = np.asarray(camera.world_view)  # W2C in math convention
    rot = V[:3, :3].T                  # C2W rotation
    pos = np.asarray(camera.cam_center)
    return {
        "id": int(cam_id),
        "img_name": img_name,
        "width": int(camera.width),
        "height": int(camera.height),
        "position": [float(x) for x in pos],
        "rotation": [[float(x) for x in row] for row in rot],
        "fy": fov2focal(camera.fovy, camera.height),
        "fx": fov2focal(camera.fovx, camera.width),
    }
