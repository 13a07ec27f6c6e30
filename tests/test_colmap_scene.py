"""COLMAP offline scene assembly (VERDICT round-1 item 5): a synthetic
COLMAP text model + rendered images must assemble into cameras + initial
point cloud and train end-to-end through `train_offline_scene`
(`readColmapSceneInfo` parity, reference `scene/dataset_readers.py:28-424`).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sags_tpu.core.camera import make_camera
from sags_tpu.core.config import MapConfig, OptimizationConfig, RasterizeConfig, SLAMConfig
from sags_tpu.io.colmap import rotmat2qvec
from sags_tpu.io.colmap_scene import load_colmap_scene
from sags_tpu.ops import rasterize as rz


def _write_colmap_text_model(tmp_path, cams, imgs, xyz, rgb):
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse, exist_ok=True)
    with open(sparse / "cameras.txt", "w") as f:
        f.write("# cameras\n")
        for cid, (model, w, h, params) in cams.items():
            f.write(f"{cid} {model} {w} {h} " + " ".join(map(str, params)) + "\n")
    with open(sparse / "images.txt", "w") as f:
        f.write("# images\n")
        for iid, (qvec, tvec, cam_id, name) in imgs.items():
            f.write(
                f"{iid} " + " ".join(map(str, qvec)) + " "
                + " ".join(map(str, tvec)) + f" {cam_id} {name}\n"
            )
            f.write("\n")  # empty points2D line
    with open(sparse / "points3D.txt", "w") as f:
        f.write("# points\n")
        for i, (p, c) in enumerate(zip(xyz, rgb)):
            f.write(
                f"{i + 1} {p[0]} {p[1]} {p[2]} "
                f"{int(c[0])} {int(c[1])} {int(c[2])} 0.5\n"
            )


@pytest.fixture(scope="module")
def colmap_fixture(tmp_path_factory):
    """A tiny world rendered from 3 poses, written as a COLMAP text model."""
    tmp_path = tmp_path_factory.mktemp("colmap")
    rng = np.random.default_rng(0)
    n = 512
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)

    W, H, f = 64, 48, 60.0
    cams = {1: ("PINHOLE", W, H, [f, f, W / 2, H / 2])}
    imgs = {}
    os.makedirs(tmp_path / "images", exist_ok=True)
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256, chunk=64)
    from sags_tpu.core.camera import focal2fov

    for i in range(3):
        center = np.array([0.3 * (i - 1), 0.0, 0.0], np.float32)
        R_c2w = np.eye(3, dtype=np.float32)
        # COLMAP stores world→cam: qvec of R_c2wᵀ, tvec = −R_c2wᵀ·center
        qvec = rotmat2qvec(R_c2w.T)
        tvec = -R_c2w.T @ center
        imgs[i + 1] = (qvec.tolist(), tvec.tolist(), 1, f"view{i}.npy")
        cam = make_camera(R_c2w, center, W, H, focal2fov(f, W), focal2fov(f, H))
        out = rz.rasterize(
            jnp.asarray(pts), jnp.full((n,), 0.8),
            jnp.full((n, 3), 0.05), jnp.tile(jnp.asarray([[0., 0., 0., 1.]]), (n, 1)),
            cam, cfg, colors=jnp.asarray(cols),
        )
        img = np.asarray(out.color).transpose(1, 2, 0)
        np.save(tmp_path / "images" / f"view{i}.npy", img)
    _write_colmap_text_model(tmp_path, cams, imgs,
                             pts.tolist(), (cols * 255).tolist())
    return str(tmp_path), pts, cols


def test_load_colmap_scene(colmap_fixture):
    root, pts, cols = colmap_fixture
    scene = load_colmap_scene(root)
    assert len(scene.train_views) == 3
    assert scene.points.shape == pts.shape
    np.testing.assert_allclose(scene.points, pts, atol=1e-4)
    assert 0.0 <= scene.colors.min() and scene.colors.max() <= 1.0
    assert scene.radius > 0
    v = scene.train_views[0]
    assert v.camera.width == 64 and v.camera.height == 48
    # cameras must reproject the model: render the known world from the
    # assembled camera and compare against the stored image
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256, chunk=64)
    n = len(pts)
    out = rz.rasterize(
        jnp.asarray(pts), jnp.full((n,), 0.8), jnp.full((n, 3), 0.05),
        jnp.tile(jnp.asarray([[0., 0., 0., 1.]]), (n, 1)),
        v.camera, cfg, colors=jnp.asarray(cols),
    )
    assert v.image is not None
    err = float(np.abs(np.asarray(out.color) - v.image).max())
    assert err < 1e-3, err


def test_depth_bin_roundtrip(tmp_path):
    """`read_depth_bin` parses the reference's `W&H&C&`-header Fortran-order
    float32 format exactly (`read_depth_normalized`,
    `scene/dataset_readers.py:28-45`), including non-square shapes."""
    from sags_tpu.io.colmap_scene import read_depth_bin, write_depth_bin

    rng = np.random.default_rng(3)
    d = rng.uniform(0.1, 9.0, (48, 64)).astype(np.float32)
    path = str(tmp_path / "view0.bin")
    write_depth_bin(path, d)
    # byte-level check of the header the reference's parser expects
    with open(path, "rb") as f:
        assert f.read(8) == b"64&48&1&"
    back = read_depth_bin(path)
    assert back.shape == (48, 64)
    np.testing.assert_array_equal(back, d)
    # normalized_const divides through, as in the reference
    np.testing.assert_allclose(read_depth_bin(path, 2.0), d / 2.0, rtol=1e-6)


def test_scene_loads_depth_images(colmap_fixture):
    """`load_colmap_scene` picks up `depth_images/<stem>.bin` per view
    (`readColmapCameras` depth path, `dataset_readers.py:176-182`); views
    without a depth file get None (the reference's try/except)."""
    from sags_tpu.io.colmap_scene import write_depth_bin

    root, _, _ = colmap_fixture
    ddir = os.path.join(root, "depth_images")
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.default_rng(5)
    d0 = rng.uniform(0.5, 5.0, (48, 64)).astype(np.float32)
    write_depth_bin(os.path.join(ddir, "view0.bin"), d0)
    try:
        scene = load_colmap_scene(root)
        by_name = {v.name: v for v in scene.train_views}
        assert by_name["view0.npy"].depth is not None
        np.testing.assert_array_equal(by_name["view0.npy"].depth, d0)
        assert by_name["view1.npy"].depth is None
    finally:
        os.remove(os.path.join(ddir, "view0.bin"))
        os.rmdir(ddir)


def test_eval_split(colmap_fixture):
    root, _, _ = colmap_fixture
    scene = load_colmap_scene(root, eval_split=True, llffhold=2)
    assert len(scene.test_views) == 2 and len(scene.train_views) == 1


def test_train_offline_scene(colmap_fixture):
    from sags_tpu.slam.offline import train_offline_scene

    root, _, _ = colmap_fixture
    scene = load_colmap_scene(root)
    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=256,
                               chunk=64, windowed=False),
        map=MapConfig(initial_capacity=2048),
        opt=OptimizationConfig(densify_from_iter=10_000),
    )
    state, losses = train_offline_scene(scene, cfg, iterations=20)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_images_text_blank_separator_shape(tmp_path):
    """Blank lines BETWEEN records (separator style) must not shift parity;
    empty points2D lines (featureless images) must still hold their slot."""
    from sags_tpu.io.colmap import read_images_text

    p = tmp_path / "images.txt"
    p.write_text(
        "# comment\n"
        "1 1 0 0 0 0.5 0.5 0.5 1 a.png\n"
        "10 10 5\n"
        "\n"
        "2 1 0 0 0 0.1 0.2 0.3 1 b.png\n"
        "\n"          # featureless image: empty points2D line
        "\n"          # separator
        "3 1 0 0 0 0.0 0.0 0.0 1 c.png\n"
        "1 2 7\n"
    )
    imgs = read_images_text(str(p))
    assert sorted(imgs) == [1, 2, 3]
    assert imgs[2].name == "b.png"
