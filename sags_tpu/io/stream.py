"""ROS-free live frame streaming over TCP.

The reference is driven by three ROS topics through an
ApproximateTimeSynchronizer (`scripts/gaussian_splatting.py:227-235`); this
module provides the same live-sensor shape without ROS: a publisher sends
already-synchronized `Frame`s as length-prefixed npz records over a socket,
and `socket_frames` yields them as a generator that plugs straight into
`SLAMPipeline.run` (which stages frames through `io.queue.FrameQueue` and
applies the `cfg.timeout_s` source-silence shutdown, `:652-666`).

Wire format per record: 8-byte big-endian length, then an `np.savez`
archive of the Frame's array fields (npz, not pickle — safe to receive
from an untrusted peer). A zero length terminates the stream.
"""

from __future__ import annotations

import io as _io
import socket
import struct
from typing import Iterable, Iterator, Optional

import numpy as np

from sags_tpu.io.datasets import Frame

_LEN = struct.Struct(">Q")


def _encode(frame: Frame) -> bytes:
    buf = _io.BytesIO()
    arrays = {
        "image": frame.image,
        "points": frame.points,
        "colors": frame.colors,
        # pose=None (pose-less raw-odometry stream) rides as NaNs — npz has
        # no null; the decoder maps all-NaN back to None
        "pose": (np.full((4, 4), np.nan, np.float32)
                 if frame.pose is None else frame.pose),
        "timestamp": np.float64(frame.timestamp),
    }
    if frame.depth is not None:
        arrays["depth"] = frame.depth
    if frame.imu is not None:
        arrays["imu"] = frame.imu
    if frame.scan is not None:
        arrays["scan"] = frame.scan
    np.savez(buf, **arrays)
    return buf.getvalue()


def _decode(payload: bytes) -> Frame:
    z = np.load(_io.BytesIO(payload))
    pose = z["pose"]
    return Frame(
        image=z["image"],
        points=z["points"],
        colors=z["colors"],
        pose=None if np.isnan(pose).all() else pose,
        timestamp=float(z["timestamp"]),
        depth=z["depth"] if "depth" in z else None,
        imu=z["imu"] if "imu" in z else None,
        scan=z["scan"] if "scan" in z else None,
    )


MAX_RECORD_BYTES = 256 << 20  # reject absurd headers (DoS / desync guard)


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    chunks = []
    while n:
        b = conn.recv(min(n, 1 << 20))
        if not b:
            return None
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def serve_frames(
    frames: Iterable[Frame],
    port: int = 0,
    host: str = "127.0.0.1",
    ready=None,
) -> int:
    """Publish `frames` to the first client that connects; returns the bound
    port (useful with port=0). `ready`, if given, is an `threading.Event`
    set once listening — lets a test start the consumer race-free."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    bound = srv.getsockname()[1]
    if ready is not None:
        ready.port = bound  # type: ignore[attr-defined]
        ready.set()
    conn, _ = srv.accept()
    try:
        for f in frames:
            payload = _encode(f)
            conn.sendall(_LEN.pack(len(payload)))
            conn.sendall(payload)
        conn.sendall(_LEN.pack(0))
    finally:
        conn.close()
        srv.close()
    return bound


def socket_frames(
    port: int,
    host: str = "127.0.0.1",
    connect_timeout: float = 10.0,
    first_frame_timeout: Optional[float] = 60.0,
) -> Iterator[Frame]:
    """Generator of Frames from a `serve_frames` publisher. Blocks on the
    socket between frames — exactly the live-sensor shape `SLAMPipeline.run`
    consumes (its FrameQueue measures source silence against `cfg.timeout_s`
    while this generator waits; that clock only starts after the FIRST
    frame, so a publisher that connects but never sends gets its own
    `first_frame_timeout` here). A clean stream ends with the zero-length
    terminator; bare EOF or a desynced/oversized header raises
    ConnectionError instead of silently truncating the run.

    Connection attempts retry until `connect_timeout` elapses — a live
    publisher may come up slower than its consumer."""
    import time as _time

    deadline = _time.monotonic() + connect_timeout
    while True:
        try:
            conn = socket.create_connection((host, port), timeout=2.0)
            break
        except OSError:
            if _time.monotonic() >= deadline:
                raise
            _time.sleep(0.25)
    conn.settimeout(first_frame_timeout)
    try:
        first = True
        while True:
            try:
                hdr = _recv_exact(conn, _LEN.size)
            except socket.timeout:
                raise ConnectionError(
                    f"publisher sent no frame within {first_frame_timeout}s"
                )
            if hdr is None:
                raise ConnectionError(
                    "stream ended without the zero-length terminator "
                    "(publisher crashed?)"
                )
            (n,) = _LEN.unpack(hdr)
            if n == 0:
                return
            if n > MAX_RECORD_BYTES:
                raise ConnectionError(f"record header {n} bytes: desync/DoS")
            payload = _recv_exact(conn, n)
            if payload is None:
                raise ConnectionError("stream ended mid-record")
            if first:
                conn.settimeout(None)  # silence now belongs to FrameQueue
                first = False
            yield _decode(payload)
    finally:
        conn.close()
