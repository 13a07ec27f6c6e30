"""Benchmark: 720p splatting render FPS + map-optimization rate on the real
TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline render metric, carrying the training-rate measurement in the same
object (train_metric/train_value/train_unit/train_vs_baseline) so the driver
records both in one run. Baselines: 30 FPS at 720p render, 10 Hz map-opt
(BASELINE.md — the reference publishes no numbers; these are the north-star
gates).

The headline render is the EXACT-coverage mode (slice store + tight rect:
every alpha-gate-passing pair composited — the reference's dynamic
num_rendered completeness contract); the capped tiered mode rides along in
`fast_*` fields with its coverage caveat.

Env knobs: SAGS_BENCH_GAUSSIANS (default 262144), SAGS_BENCH_W/H (1280x720),
SAGS_BENCH_ITERS (20), SAGS_BENCH_MODE (render|train|both; default both),
SAGS_BENCH_FAST=1 (headline the capped mode instead).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache. The env vars alone are NOT enough on this
# runtime: a sitecustomize imports jax at interpreter startup, which
# snapshots the (unset) env before this module runs — the cache then reports
# "disabled/not initialized" and every axon-tunnel compile (measured 146 s
# for a trivial 512x512 program) is paid fresh in every process. The
# config.update calls below work AFTER import and are what actually enables
# it; the env vars still help subprocesses whose sitecustomize runs with
# them already exported (tests/conftest.py's CLI children).
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a hard dep
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


_enable_compile_cache()


def measure_rtt() -> float:
    """Host↔device round-trip of a value fetch on a trivial op. Through the
    axon tunnel this is ~30 ms and must be subtracted from per-iteration
    fetch timings (block_until_ready alone does not expose queue completion
    reliably on this runtime — only a value fetch does)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 1.0001)
    o = f(jnp.ones((8, 128)))
    float(o.sum())
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        o = f(o)
        float(o.sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_train(emit=True):
    """Map-optimization rate: fused slam_step iterations/sec at the reference
    operating point (640x512, the SLAM node's image size)."""
    import jax
    import jax.numpy as jnp

    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import MapConfig, RasterizeConfig, SLAMConfig
    from sags_tpu.slam import step as slam

    P = int(os.environ.get("SAGS_BENCH_GAUSSIANS", 131072))
    W = int(os.environ.get("SAGS_BENCH_W", 640))
    H = int(os.environ.get("SAGS_BENCH_H", 512))
    iters = int(os.environ.get("SAGS_BENCH_ITERS", 20))

    cfg = SLAMConfig(
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=512,
                               chunk=64),
        map=MapConfig(initial_capacity=P),
    )
    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 12.0, (P, 1))
    xy = rng.uniform(-0.55, 0.55, (P, 2)) * z * np.array([1.25, 1.0])
    pts = np.concatenate([xy, z], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)

    state = slam.init_state(cfg, jax.random.key(0), capacity=P)
    add = slam.make_add_points(cfg, donate=False)
    B = 65536
    for i in range(0, P, B):
        state, _ = add(state, jnp.asarray(pts[i:i + B]), jnp.asarray(cols[i:i + B]),
                       jnp.ones(min(B, P - i), bool))
    scales = np.exp(rng.normal(np.log(0.02), 0.5, (P, 3))).clip(0.004, 0.12)
    state = state._replace(map=state.map._replace(
        log_scales=jnp.where(state.map.active[:, None],
                             jnp.log(jnp.asarray(scales, jnp.float32)),
                             state.map.log_scales)))
    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.9)
    gt_img = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    gt_obj = jnp.zeros((H, W), jnp.int32)
    stepfn = slam.make_slam_step(cfg, donate=False)

    state, m = stepfn(state, cam, gt_img, gt_obj)
    float(m.loss)
    rtt = measure_rtt()
    # per-iteration VALUE-FETCH sync (see measure_rtt) minus the RTT baseline
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = stepfn(state, cam, gt_img, gt_obj)
        float(m.loss)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - rtt, 1e-6)
    hz = 1.0 / dt
    result = {
        "metric": f"map_opt_iters_per_sec_{W}x{H}_{P//1024}k",
        "value": round(hz, 2),
        "unit": "iters/s",
        "vs_baseline": round(hz / 10.0, 3),  # >=10 Hz map-opt target
    }
    if emit:
        print(json.dumps(result))
    print(f"# slam_step {dt*1000:.1f} ms device (+{rtt*1000:.1f} ms tunnel RTT), "
          f"loss={float(m.loss):.4f}, active={int(m.n_active)}, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)
    return result


def bench_pipeline():
    """Steady-state online-SLAM frame rate: the full per-frame loop (GICP
    tracking + map growth + keyframe/replay training) on a synthetic
    640x512 sequence. Driver-visible as `slam_frame_hz` (the reference's
    30 Hz loop-rate operating point, `scripts/gaussian_splatting.py:645`).

    Measured as SYNC-BOUNDED THROUGHPUT: a warm-up segment pays the XLA
    compiles, then a second segment through the SAME pipeline is timed
    end-to-end including a final block_until_ready. The fused front-end
    dispatches frames without per-frame value fetches, so per-frame wall
    times alone would measure Python enqueue time, not device completion."""
    import time as _time

    import jax as _jax

    from sags_tpu.core.config import (KeyframeConfig, MapConfig,
                                      RasterizeConfig, SLAMConfig,
                                      TrackingConfig)
    from sags_tpu.io.datasets import SyntheticDataset
    from sags_tpu.slam.pipeline import SLAMPipeline

    n_frames = int(os.environ.get("SAGS_BENCH_PIPE_FRAMES", 16))
    n_warm = int(os.environ.get("SAGS_BENCH_PIPE_WARM", 32))
    cfg = SLAMConfig(
        # capacity sized for the FULL warm+timed run so the timed segment
        # crosses no growth/recompile boundary (growth cost amortizes to
        # zero over a long run; it is one recompile per doubling). The warm
        # segment is long enough for the startup overflow transient to
        # grow AND shrink-back tile_capacity (metrics_interval=5: the
        # 4-quiet-drain shrink lands by ~frame 28), so the tail times the
        # settled steady-state program.
        raster=RasterizeConfig(max_tiles_per_gaussian=16, tile_capacity=512,
                               chunk=64),
        map=MapConfig(initial_capacity=2 ** 18),
        keyframes=KeyframeConfig(keyframe_freq=5, window=16),
        tracking=TrackingConfig(backend="gicp", max_points=4096),
        post_train_iters=0, metrics_interval=5,
    )
    ds = list(SyntheticDataset(n_frames=n_warm + n_frames, width=640,
                               height=512, n_world=65536, pts_per_frame=4096,
                               step=0.075, clutter=0.3))
    pipe = SLAMPipeline(cfg, point_budget=4096, rng_seed=0)
    pipe.run(ds[:n_warm], post_train=0)  # warm-up: compiles + transient
    t0 = _time.perf_counter()
    res = pipe.run(ds[n_warm:], post_train=0)
    _jax.block_until_ready(res.state.map.xyz)
    dt = (_time.perf_counter() - t0) / n_frames
    return {"slam_frame_hz": round(1.0 / dt, 2),
            "slam_frame_ms_median": round(dt * 1000, 1)}


def bench_pipeline_bounded(budget_s: int = 300, attempts: int = 2):
    """Run bench_pipeline in a subprocess with a hard wall-clock bound so a
    slow tunnel/compile phase can NEVER sink the headline JSON the driver
    records (the pipeline rate is supplementary).

    A timed-out attempt still WROTE its compiles to the persistent cache, so
    one retry typically starts warm and finishes well inside the budget."""
    import subprocess

    code = ("import json; from bench import bench_pipeline; "
            "print('PIPE_JSON ' + json.dumps(bench_pipeline()))")
    for attempt in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=budget_s,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
        except subprocess.TimeoutExpired:
            print(f"# pipeline bench attempt {attempt + 1} hit the "
                  f"{budget_s}s budget" + (
                      " (cache warmed, retrying)"
                      if attempt + 1 < attempts else ""),
                  file=sys.stderr)
            continue
        for line in p.stdout.splitlines():
            if line.startswith("PIPE_JSON "):
                return json.loads(line[len("PIPE_JSON "):])
        tail = (p.stderr or "").strip().splitlines()
        print("# pipeline bench child produced no result: "
              + "; ".join(tail[-2:]), file=sys.stderr)
    return None


def main():
    mode = os.environ.get("SAGS_BENCH_MODE", "both")
    if mode == "train":
        return bench_train()
    import jax
    import jax.numpy as jnp

    from sags_tpu.core.camera import make_camera
    from sags_tpu.core.config import RasterizeConfig
    from sags_tpu.ops import rasterize as rz

    P = int(os.environ.get("SAGS_BENCH_GAUSSIANS", 262144))
    W = int(os.environ.get("SAGS_BENCH_W", 1280))
    H = int(os.environ.get("SAGS_BENCH_H", 720))
    iters = int(os.environ.get("SAGS_BENCH_ITERS", 20))
    tile_capacity = int(os.environ.get("SAGS_BENCH_TILE_CAP", 512))
    chunk = int(os.environ.get("SAGS_BENCH_CHUNK", 64))

    rng = np.random.default_rng(0)
    # A 720p-filling scene at the SLAM operating point: the reference seeds
    # Gaussians at 0.01 world scale (`scripts/gaussian_splatting.py:684`) and
    # densification grows some — log-normal world scales around 0.02 give the
    # 1-10 px screen footprints real maps have.
    z = rng.uniform(2.0, 12.0, (P, 1))
    xy = rng.uniform(-0.55, 0.55, (P, 2)) * z * np.array([1.6, 0.9])
    means = np.concatenate([xy, z], 1).astype(np.float32)
    scales = np.exp(rng.normal(np.log(0.02), 0.5, (P, 3))).clip(0.004, 0.12)
    scales = scales.astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, (P,)).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    objs = rng.normal(size=(P, 16)).astype(np.float32)

    cam = make_camera(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                      W, H, 1.2, 0.75)
    # HEADLINE = EXACT-coverage rendering: every pair the compositing alpha
    # gate accepts is composited (slice store on, tight rect) — the same
    # completeness contract as the reference's dynamic num_rendered
    # (`rasterizer_impl.cu:288-294`). SAGS_BENCH_FAST=1 measures the capped
    # tiered mode instead (R×R window, drops counted; tools/exactness_check
    # puts its image ~19.7 dB PSNR from exact at this operating point) —
    # the default run also reports that mode in `fast_*` fields.
    # feature_precision="default" = 1-pass bf16 feature matmul (−2 to −4 ms
    # on-chip): ~4e-3 abs on [0,1] color — under the 8-bit display quantum
    # (≈50 dB PSNR floor, far above any 3DGS quality bar). Coverage
    # exactness (which pairs composite, their depth order, alpha math in
    # fp32) is untouched; the library default stays "highest".
    # Round-3 interleaved A/Bs (tools/ab_interleaved.py, paired per-round
    # deltas): window_prefetch −0.7 ms, windowed_chunk=512 −1.9 ms,
    # scan_impl="pad" −0.6 ms, windowed_copy_ring_frac=0.5 −1.2 ms (coverage-
    # identical at this point), snug mid/big fracs −0.9 ms, window_blocks=15
    # free AND zeroes the last overflow counter — tile=rect=win=big=0:
    # EVERY alpha-gate-passing pair composites, the reference's dynamic
    # num_rendered contract with no drops at all.
    # windowed_expand_frac=0.6 is the biggest single lever (−3.4 ms, 5/5):
    # the slice store's static copy buffers make P_all ≈ 370k rows of which
    # only ~191k are live — the expansion trim drops the dead tail from
    # every pair-sort lane. 0.6 is counter-verified ZERO-drop at this point
    # (0.55 loses 926 pairs); the fast config's P_all is just P, so its
    # lossless budget is 0.75.
    exact_cfg = RasterizeConfig(
        max_tiles_per_gaussian=16, tile_capacity=tile_capacity, chunk=chunk,
        remat=False, windowed_big_capacity=256, feature_precision="default",
        window_prefetch=True, windowed_chunk=512, scan_impl="pad",
        windowed_copy_ring_frac=0.5, windowed_mid_frac=0.21,
        windowed_big_frac=0.095, window_blocks=15, windowed_expand_frac=0.6,
    )
    fast_cfg = RasterizeConfig(
        max_tiles_per_gaussian=16, tile_capacity=tile_capacity, chunk=chunk,
        remat=False, windowed_big_capacity=0, feature_precision="default",
        window_prefetch=True, windowed_chunk=512, scan_impl="pad",
        windowed_expand_frac=0.75,
    )
    fast_only = os.environ.get("SAGS_BENCH_FAST", "") == "1"
    cfg = fast_cfg if fast_only else exact_cfg

    args = tuple(jnp.asarray(a) for a in (means, opac, scales, quats, colors, objs))

    # Derive the windowed-path buffer budgets from the scene itself
    # (VERDICT r3 weak #3: no hand-tuned expansion constants): one cheap
    # occupancy probe counts the rows each tier/store/window buffer needs,
    # `derive_windowed_budgets` sizes them with a 5% margin, and the render's
    # overflow counters still verify exactness per frame. SAGS_BENCH_DERIVE=0
    # falls back to the hand-tuned config above.
    if os.environ.get("SAGS_BENCH_DERIVE", "1") == "1":
        def _derive(c, tag):
            try:
                occ_fn = jax.jit(lambda m, o, s, q: rz.windowed_occupancy(
                    m, o, s, q, cam, c))
                occ = {k: np.asarray(v) for k, v in
                       occ_fn(*args[:4]).items()}
                c = rz.derive_windowed_budgets(c, occ, P)
                print(
                    f"# derived budgets ({tag}): live="
                    f"{int(occ['live_parents']) + int(occ['live_copies'])} "
                    f"(expand_frac {c.windowed_expand_frac:.3f}), "
                    f"mid={int(occ['n_mid'])} big={int(occ['n_big'])} "
                    f"ring={int(occ['n_ring'])} "
                    f"store={[int(x) for x in occ['store']]} "
                    f"window_blocks={c.window_blocks}",
                    file=sys.stderr,
                )
            except Exception as e:
                print(f"# budget derivation failed ({e}); hand-tuned {tag}",
                      file=sys.stderr)
            return c

        cfg = _derive(cfg, "exact" if not fast_only else "fast")
        fast_cfg = cfg if fast_only else _derive(fast_cfg, "fast")
    variants = [
        (args[0], args[1] * (1.0 - 0.001 * v), *args[2:]) for v in range(4)
    ]

    def bench_cfg(c, passes=3):
        @jax.jit
        def render(means, opac, scales, quats, colors, objs):
            out = rz.rasterize(means, opac, scales, quats, cam, c,
                               colors=colors, obj_features=objs)
            # checksum forces full-frame completion on value fetch
            return (out.color.sum(), out.n_binned, out.overflow_tile,
                    out.overflow_rect, out.overflow_window, out.overflow_big)

        out = render(*args)  # compile + warmup
        float(out[0])
        n_binned = int(out[1])
        overflow = (f"tile={int(out[2])},rect={int(out[3])},"
                    f"window={int(out[4])},big={int(out[5])}")
        # vary inputs + VALUE-FETCH sync per frame, minus the tunnel RTT
        # baseline. The shared tunnel/chip shows multi-minute slow phases
        # (identical program measured 30.7 and 33.4 ms in different
        # sessions), so run several passes with fresh RTT baselines and
        # take the best median — min-time across repetitions de-noises
        # external interference and measures the program.
        best_dt, rtt = None, None
        for _ in range(passes):
            rtt_p = measure_rtt()
            times = []
            for i in range(iters):
                t0 = time.perf_counter()
                o = render(*variants[i % 4])
                float(o[0])
                times.append(time.perf_counter() - t0)
            dt_p = max(float(np.median(times)) - rtt_p, 1e-6)
            if best_dt is None or dt_p < best_dt:
                best_dt, rtt = dt_p, rtt_p
        return best_dt, rtt, n_binned, overflow

    # 4 passes with fresh RTT baselines: the shared chip has multi-minute
    # speed phases (±10%); best-median measures the program, not the phase
    dt, rtt, n_binned, overflow = bench_cfg(cfg, passes=4)
    fps = 1.0 / dt

    result = {
        "metric": f"720p_render_fps_{P//1024}k_gaussians"
                  + ("" if fast_only else "_exact"),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "coverage": "capped" if fast_only else "exact",
    }
    print(
        f"# {W}x{H}, {P} gaussians, {n_binned} binned pairs, overflow={overflow}, "
        f"{dt*1000:.1f} ms/frame device (+{rtt*1000:.1f} ms tunnel RTT), "
        f"device={jax.devices()[0].platform}; baseline 30 FPS is the v5e-8 "
        f"north star, measured here on ONE chip",
        file=sys.stderr,
    )
    if not fast_only:
        # secondary: the capped tiered mode (fast, drops counted+adapted)
        dt_f, _, nb_f, ov_f = bench_cfg(fast_cfg, passes=2)
        result["fast_value"] = round(1.0 / dt_f, 2)
        result["fast_coverage_note"] = (
            "capped R-window mode; exactness_check PSNR vs exact ~19.7 dB "
            "at this operating point")
        print(f"# fast mode: {nb_f} binned, overflow={ov_f}, "
              f"{dt_f*1000:.1f} ms/frame", file=sys.stderr)
    if mode == "both":
        try:
            train = bench_train(emit=False)
            result.update({
                "train_metric": train["metric"],
                "train_value": train["value"],
                "train_unit": train["unit"],
                "train_vs_baseline": train["vs_baseline"],
            })
        except Exception as e:  # render metric must still be recorded
            print(f"# train bench failed: {e}", file=sys.stderr)
        if os.environ.get("SAGS_BENCH_PIPELINE", "1") == "1":
            try:
                pipe = bench_pipeline_bounded(
                    int(os.environ.get("SAGS_BENCH_PIPE_BUDGET", 300)))
                if pipe:
                    result.update(pipe)
                    result["slam_frame_note"] = (
                        "full track+grow+train loop, sync-bounded throughput "
                        "(warm segment excluded, timed segment ends with "
                        "block_until_ready); the fused front-end issues ONE "
                        "dispatch per frame with no per-frame value fetches, "
                        "so the loop is device-compute-bound (~90 ms train "
                        "step at the adapted tile capacity + ~11 ms "
                        "tracking), not RTT-bound as in round 4")
                    print(f"# pipeline steady-state: {pipe['slam_frame_hz']} Hz "
                          f"({pipe['slam_frame_ms_median']} ms/frame median, "
                          f"full track+grow+train loop)", file=sys.stderr)
                else:
                    print("# pipeline bench skipped (wall-clock budget)",
                          file=sys.stderr)
            except Exception as e:
                print(f"# pipeline bench failed: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
