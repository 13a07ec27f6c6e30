"""CLI smoke tests — drive the entry points as a user would."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# Clean env for subprocesses, plus the persistent-compile-cache knobs from
# conftest so repeated CLI spawns don't recompile the SLAM step from scratch.
CLI_ENV = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": "/root/repo", "HOME": "/root"}
CLI_ENV.update({k: v for k, v in os.environ.items()
                if k.startswith(("JAX_COMPILATION_CACHE",
                                 "JAX_PERSISTENT_CACHE"))})


def run_cli(*args, timeout=420):
    out = subprocess.run(
        [sys.executable, "-m", "sags_tpu.cli.main", *args],
        capture_output=True, text=True, timeout=timeout, cwd="/root/repo",
        env=CLI_ENV,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out


@pytest.mark.slow
def test_run_slam_synthetic(tmp_path):
    out = run_cli(
        "run-slam", "--dataset", "synthetic", "--frames", "3",
        "--width", "64", "--height", "48", "--post-train", "2",
        "--point-budget", "256", "--capacity", "4096", "--save", str(tmp_path / "map.ply"),
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frames"] == 3 and res["train_iters"] >= 1
    assert np.isfinite(res["ate_rmse"])
    # the reference's full calc_2d_metric triple reaches the CLI surface
    # (`scripts/gaussian_splatting.py:405-443`): PSNR, SSIM, LPIPS all
    # non-null with the LPIPS backend identified
    for k in ("mean_psnr", "mean_ssim", "mean_lpips"):
        assert res[k] is not None and np.isfinite(res[k]), (k, res)
    assert res["lpips_net"] in ("alex", "random_alex")
    assert (tmp_path / "map.ply").exists()

    # render from the saved map
    out2 = run_cli(
        "render", "--map", str(tmp_path / "map.ply"),
        "--out", str(tmp_path / "view.png"), "--width", "64", "--height", "48",
    )
    assert (tmp_path / "view.png").exists()

    # eval against the dataset
    out3 = run_cli(
        "eval", "--map", str(tmp_path / "map.ply"), "--dataset", "synthetic",
        "--frames", "2", "--width", "64", "--height", "48", "--every", "1",
    )
    res3 = json.loads(out3.stdout.strip().splitlines()[-1])
    assert res3["n_eval"] == 2 and np.isfinite(res3["psnr"])


@pytest.mark.slow
def test_run_gicp_synthetic():
    out = run_cli(
        "run-gicp", "--dataset", "synthetic", "--frames", "3",
        "--width", "64", "--height", "48",
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frames"] == 3
    assert np.isfinite(res["ate_rmse"])


@pytest.mark.slow
def test_run_gicp_map_mode():
    """Scan-to-keyframe-map odometry (`using_previous_30_*.py`): every scan
    aligns against the accumulated world-registered keyframe stack."""
    out = run_cli(
        "run-gicp", "--dataset", "synthetic", "--frames", "4",
        "--width", "64", "--height", "48", "--mode", "map",
        "--keyframe-every", "2",
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frames"] == 4 and res["mode"] == "map"
    assert np.isfinite(res["ate_rmse"])
    assert res["ate_rmse"] < 0.5


@pytest.mark.slow
def test_run_slam_checkpoint_resume(tmp_path):
    ckpt = tmp_path / "state.ckpt"
    run_cli(
        "run-slam", "--dataset", "synthetic", "--frames", "2",
        "--width", "64", "--height", "48", "--post-train", "1",
        "--point-budget", "256", "--capacity", "4096",
        "--tracking", "gicp", "--checkpoint", str(ckpt),
    )
    assert ckpt.exists()
    out = run_cli(
        "run-slam", "--dataset", "synthetic", "--frames", "2",
        "--width", "64", "--height", "48", "--post-train", "1",
        "--point-budget", "256", "--capacity", "4096",
        "--resume", str(ckpt),
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frames"] == 2
    # cfg_args parity: the resumed run keeps the persisted tracking backend
    # (it was once clobbered back to the CLI default "none")
    assert res["tracking"] == "gicp"


@pytest.mark.slow
def test_run_slam_socket_stream(tmp_path):
    """run-slam --dataset socket consumes a live TCP publisher end-to-end."""
    import threading

    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.io.stream import serve_frames

    ds = list(SyntheticDataset(n_frames=2, width=48, height=36,
                               pts_per_frame=256))
    ready = threading.Event()
    threading.Thread(target=serve_frames, args=(ds,),
                     kwargs={"port": 0, "ready": ready}, daemon=True).start()
    assert ready.wait(10.0)
    out = run_cli(
        "run-slam", "--dataset", "socket", "--port", str(ready.port),
        "--post-train", "1", "--point-budget", "256", "--capacity", "2048",
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frames"] == 2 and not res["timed_out"]


@pytest.mark.slow
def test_serve_and_run_slam_two_processes(tmp_path):
    """`serve` (publisher CLI) feeding `run-slam --dataset socket`."""
    import subprocess
    import sys as _sys

    srv = subprocess.Popen(
        [_sys.executable, "-m", "sags_tpu.cli.main", "serve",
         "--dataset", "synthetic", "--frames", "2",
         "--width", "48", "--height", "36", "--port", "7213"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd="/root/repo",
        env=CLI_ENV,
    )
    try:
        out = run_cli(
            "run-slam", "--dataset", "socket", "--port", "7213",
            "--post-train", "1", "--point-budget", "256", "--capacity", "2048",
        )
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["frames"] == 2
    finally:
        try:
            srv.wait(timeout=120)
        except subprocess.TimeoutExpired:
            srv.kill()
            raise


@pytest.mark.slow
def test_run_slam_gicp_map_tracking():
    """`run-slam --tracking gicp_map` (scan-to-MAP against the trackable
    Gaussians) produces a finite ATE from the CLI surface."""
    out = run_cli(
        "run-slam", "--dataset", "synthetic", "--frames", "4",
        "--width", "64", "--height", "48", "--post-train", "0",
        "--point-budget", "256", "--capacity", "4096",
        "--tracking", "gicp_map",
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["tracking"] == "gicp_map"
    assert res["frames"] == 4
    assert np.isfinite(res["ate_rmse"])
