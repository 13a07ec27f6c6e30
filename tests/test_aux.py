"""Aux subsystems: checkpoint/resume, network GUI socket, COLMAP readers,
PCD I/O, opacity resets, NDT wrapper."""

import json
import socket
import struct
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sags_tpu.core.config import MapConfig, RasterizeConfig, SemanticsConfig, SLAMConfig
from sags_tpu.io import colmap
from sags_tpu.io.pcd import load_pcd, save_pcd
from sags_tpu.mapping import gaussian_map as gm
from sags_tpu.slam import checkpoint as ckpt
from sags_tpu.slam import step as slam


def small_cfg():
    return SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=128, chunk=32),
        map=MapConfig(initial_capacity=64),
        semantics=SemanticsConfig(cls3d_sample=8, num_classes=12),
    )


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = small_cfg()
    state = slam.init_state(cfg, jax.random.key(3))
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    cols = rng.uniform(size=(16, 3)).astype(np.float32)
    state, _ = slam.add_frame_points(
        state, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(16, bool), cfg
    )
    path = str(tmp_path / "ckpt")
    ckpt.save_state(path, state, cfg)
    state2, cfg2 = ckpt.load_state(path)
    assert cfg2.map.initial_capacity == cfg.map.initial_capacity
    assert cfg2.semantics.num_classes == 12
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        if jnp.issubdtype(jnp.asarray(a).dtype, jax.dtypes.prng_key):
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state steps identically
    from sags_tpu.core.camera import make_camera

    cam = make_camera(np.eye(3), np.zeros(3), 32, 32, 1.0, 1.0)
    img = jnp.zeros((3, 32, 32))
    obj = jnp.zeros((32, 32), jnp.int32)
    _, m1 = slam.slam_step(state, cam, img, obj, cfg)
    _, m2 = slam.slam_step(state2, cam, img, obj, cfg)
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-6)


def test_pcd_roundtrip(rng, tmp_path):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    save_pcd(path, pts)
    back = load_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_colmap_text_roundtrip(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500.0 501.0 320.0 240.0\n"
    )
    (tmp_path / "images.txt").write_text(
        "# comment\n1 0.9999 0.01 0.0 0.0 0.5 0.2 0.1 1 img0.png\n0 0 -1\n"
    )
    (tmp_path / "points3D.txt").write_text(
        "# comment\n1 1.0 2.0 3.0 255 128 0 0.5 1 0\n"
    )
    cams, imgs, xyz, rgb = colmap.load_colmap_model(str(tmp_path))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 501, 320, 240])
    assert imgs[1].name == "img0.png"
    R = colmap.qvec2rotmat(imgs[1].qvec)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(xyz[0], [1, 2, 3])
    # qvec roundtrip
    q2 = colmap.rotmat2qvec(R)
    sign = np.sign(q2[0]) * np.sign(imgs[1].qvec[0])
    np.testing.assert_allclose(q2 * sign, imgs[1].qvec / np.linalg.norm(imgs[1].qvec), atol=1e-3)


def test_network_gui_roundtrip():
    """Drive the SIBR socket protocol end-to-end against a fake viewer."""
    from sags_tpu.viz.network_gui import NetworkGUI

    gui = NetworkGUI(port=0)  # ephemeral
    port = gui.listener.getsockname()[1]
    H = W = 32
    result = {}

    def viewer():
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        msg = {
            "resolution_x": W, "resolution_y": H, "train": True,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False, "keep_alive": True,
            "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little"))
        c.sendall(payload)
        img = b""
        want = H * W * 3
        while len(img) < want:
            img += c.recv(want - len(img))
        n = int.from_bytes(c.recv(4), "little")
        result["verify"] = c.recv(n).decode()
        result["img"] = img
        c.close()

    t = threading.Thread(target=viewer)
    t.start()
    deadline = time.time() + 5
    served = False
    while time.time() < deadline and not served:
        served = gui.serve_once(lambda cam: np.full((3, cam.height, cam.width), 0.5),
                                verify="test-ok")
        time.sleep(0.01)
    t.join(timeout=5)
    gui.close()
    assert served
    assert result["verify"] == "test-ok"
    assert len(result["img"]) == H * W * 3
    assert result["img"][0] == 127  # 0.5 * 255


def test_opacity_resets(rng):
    cfg = small_cfg()
    m = gm.init_map(16, cfg.map)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    cols = rng.uniform(size=(8, 3)).astype(np.float32)
    m, _ = gm.add_points(m, jnp.asarray(pts), jnp.asarray(cols),
                         jnp.ones(8, bool), jax.random.key(0))
    m = m._replace(opacity_logit=m.opacity_logit.at[:8].set(
        gm.inverse_sigmoid(jnp.float32(0.8))))
    m2 = gm.reset_opacity(m)
    assert np.all(np.asarray(gm.get_opacity(m2))[:8] <= 0.011)

    flt = jnp.arange(16) < 4
    m3 = gm.reset_unreliable_opacity(m, flt)
    op3 = np.asarray(gm.get_opacity(m3))
    assert np.all(op3[:4] <= 0.011) and np.all(op3[4:8] > 0.7)

    # large visible gaussians get log1p decay
    m4 = m._replace(log_scales=m.log_scales.at[:2].set(jnp.log(0.05)))
    m5 = gm.reset_visible_opacity(m4, jnp.ones(16, bool))
    op5 = np.asarray(gm.get_opacity(m5))
    assert np.all(op5[:2] < 0.8) and np.all(op5[2:8] > 0.79)
