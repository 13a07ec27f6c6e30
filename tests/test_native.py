"""Native host runtime (C++ via ctypes) vs the JAX/numpy reference paths."""

import struct

import numpy as np
import pytest

from sags_tpu.io import native


def test_native_available():
    """The library should be built in-tree (make -C native)."""
    assert native.available(), "libsags_native.so missing — run make -C native"


def test_voxel_downsample_matches_semantics(rng):
    pts = rng.uniform(0, 4, (2000, 3)).astype(np.float32)
    out = native.voxel_downsample(pts, 2.0)
    assert 4 <= len(out) <= 8
    assert (out >= 0).all() and (out <= 4).all()
    # each centroid is the mean of its voxel's points
    for c in out:
        cell = np.floor(c / 2.0)
        sel = (np.floor(pts / 2.0) == cell).all(1)
        np.testing.assert_allclose(c, pts[sel].mean(0), atol=1e-4)


def test_kdtree_knn_exact(rng):
    pts = rng.normal(size=(1500, 3)).astype(np.float32)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    tree = native.KDTree(pts)
    d2, idx = tree.knn(q, k=5)
    # brute force
    D = ((q[:, None] - pts[None]) ** 2).sum(-1)
    bf_d2 = np.sort(D, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(d2, 1), bf_d2, rtol=1e-4, atol=1e-5)


def test_decode_xyzrgb(rng):
    n = 100
    step = 32
    raw = bytearray(n * step)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3))
    for i in range(n):
        struct.pack_into("<fff", raw, i * step, *xyz[i])
        packed = (int(cols[i, 0]) << 16) | (int(cols[i, 1]) << 8) | int(cols[i, 2])
        struct.pack_into("<I", raw, i * step + 16, packed)
    got_xyz, got_rgb = native.decode_xyzrgb(bytes(raw), step, 0, 16)
    np.testing.assert_allclose(got_xyz, xyz, atol=1e-6)
    np.testing.assert_allclose(got_rgb, cols / 255.0, atol=1e-6)


def test_kdtree_python_fallback(rng, monkeypatch):
    """The JAX fallback must agree with the native path."""
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    q = rng.normal(size=(16, 3)).astype(np.float32)
    tree = native.KDTree(pts)
    d2_n, _ = tree.knn(q, k=4)
    monkeypatch.setattr(native, "_lib", None)
    tree2 = native.KDTree(pts)
    d2_f, _ = tree2.knn(q, k=4)
    np.testing.assert_allclose(np.sort(d2_n, 1), np.sort(d2_f, 1), rtol=1e-4, atol=1e-5)
