"""Host-side async frame queue — the ingestion "communication backend".

The reference couples a ROS callback thread to a training thread through an
unsynchronized shared dict (`scripts/gaussian_splatting.py:277` vs `:668-675`
— a benign-by-luck race, SURVEY.md §5). Here a producer thread pre-stages
frames into fixed-size device buffers (`jax.device_put`) behind a bounded
queue, so the upload of frame k+1 overlaps the optimization of frame k —
the double-buffering the reference lacks (it pays per-frame sync `.cuda()`
uploads, `scripts/gaussian_splatting.py:679-685`).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sags_tpu.io.datasets import Frame


class DeviceFrame(NamedTuple):
    """A frame staged in HBM with static shapes (points padded + masked)."""

    image: jax.Array  # [3,H,W]
    points: jax.Array  # [P,3]
    colors: jax.Array  # [P,3]
    mask: jax.Array  # [P]
    pose: jax.Array  # [4,4]
    timestamp: float
    # True = `points` holds the SENSOR-frame scan (pose-less frame): the
    # consumer must transform by its pose ESTIMATE before map registration
    sensor_frame: bool = False
    # Tracker inputs, staged to their own (scan_budget) shape so the fused
    # front-end consumes device arrays directly: frame.scan when present,
    # else the world points un-projected through the carried pose (the
    # legacy `pipeline._track` host math, now done in the producer thread
    # so it overlaps compute). None when scan_budget wasn't requested.
    scan: Optional[jax.Array] = None  # [S,3] sensor-frame
    scan_mask: Optional[jax.Array] = None  # [S]


def stage_frame(frame: Frame, point_budget: int, device=None,
                scan_budget: Optional[int] = None) -> DeviceFrame:
    # A pose-less frame stages its sensor scan in the points slot — the
    # upload still overlaps compute; only the (cheap, on-device) world
    # transform waits for the tracker's estimate.
    sensor = frame.pose is None
    src = frame.scan if sensor else frame.points
    n = min(len(src), point_budget)
    pts = np.zeros((point_budget, 3), np.float32)
    cols = np.zeros((point_budget, 3), np.float32)
    msk = np.zeros(point_budget, bool)
    pts[:n] = src[:n]
    cols[:n] = frame.colors[:n]
    msk[:n] = True
    put = lambda x: jax.device_put(x, device)
    scan_d = scan_mask_d = None
    if scan_budget is not None:
        if frame.scan is not None:
            sc = np.asarray(frame.scan, np.float32)
        elif frame.pose is not None:
            Tw = np.asarray(frame.pose, np.float32)
            sc = ((np.asarray(frame.points, np.float32) - Tw[:3, 3])
                  @ Tw[:3, :3])
        else:
            sc = np.zeros((0, 3), np.float32)
        ns = min(len(sc), scan_budget)
        scan_p = np.zeros((scan_budget, 3), np.float32)
        scan_p[:ns] = sc[:ns]
        smsk = np.zeros(scan_budget, bool)
        smsk[:ns] = True
        scan_d, scan_mask_d = put(jnp.asarray(scan_p)), put(jnp.asarray(smsk))
    return DeviceFrame(
        image=put(jnp.asarray(frame.image)),
        points=put(jnp.asarray(pts)),
        colors=put(jnp.asarray(cols)),
        mask=put(jnp.asarray(msk)),
        pose=put(jnp.eye(4, dtype=jnp.float32) if sensor
                 else jnp.asarray(frame.pose)),
        timestamp=frame.timestamp,
        sensor_frame=sensor,
        scan=scan_d,
        scan_mask=scan_mask_d,
    )


class FrameQueue:
    """Bounded prefetch queue: a daemon thread stages frames ahead of use.

    Yields `(DeviceFrame, Frame)` pairs — staged device buffers plus the host
    frame they came from — so any iterable (including live generators that
    block on sensor input) is consumed exactly once.

    `timeout_s` reproduces the reference's topic-silence shutdown
    (`scripts/gaussian_splatting.py:652-666`): if no frame arrives within the
    window after the first one was seen, iteration ends gracefully and
    `timed_out` is set (the caller proceeds to post-training).
    """

    _DONE = object()

    def __init__(self, frames: Iterable[Frame], point_budget: int,
                 prefetch: int = 2, device=None,
                 timeout_s: Optional[float] = None,
                 scan_budget: Optional[int] = None):
        import time

        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._point_budget = point_budget
        self._scan_budget = scan_budget
        self._device = device
        self._timeout_s = timeout_s
        self.timed_out = False
        self._err: Optional[BaseException] = None
        self._waiting_source = True
        self._stop = False
        self._last_rx = time.monotonic()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(frames),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator[Frame]):
        import time

        try:
            while not self._stop:
                # silence is measured at the SOURCE (the reference's
                # topic-silence clock, `:652-666`) — staging or a slow
                # consumer must not count toward it
                self._waiting_source = True
                try:
                    f = next(it)
                except StopIteration:
                    break
                self._waiting_source = False
                self._last_rx = time.monotonic()
                item = (stage_frame(f, self._point_budget, self._device,
                                    scan_budget=self._scan_budget), f)
                if not self._put_unless_stopped(item):
                    return  # consumer timed out; don't park forever on put
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._put_unless_stopped(self._DONE)

    def _put_unless_stopped(self, item) -> bool:
        """Bounded put that gives up once the consumer has abandoned us —
        otherwise a timed-out run would leak this thread (parked in
        `Queue.put`) plus the staged device buffers it holds."""
        while True:
            try:
                self._q.put(item, timeout=0.25)
                return True
            except queue.Full:
                if self._stop:
                    return False

    def __iter__(self):
        import time

        first = True
        while True:
            try:
                poll = 0.25 if (self._timeout_s is not None and not first) else None
                item = self._q.get(timeout=poll)
            except queue.Empty:
                # Reference semantics: the silence clock starts after the
                # first topic (`:657`) and fires only when the producer has
                # been blocked waiting on the source for > timeout_s.
                if (self._waiting_source
                        and time.monotonic() - self._last_rx > self._timeout_s):
                    self.timed_out = True
                    self._stop = True
                    # drain anything already staged so a producer blocked in
                    # put() wakes up and exits promptly
                    while True:
                        try:
                            self._q.get_nowait()
                        except queue.Empty:
                            break
                    return
                continue
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            first = False
            yield item
