"""Live event sources for streaming inference.

The reference stack has no serving path at all (its eval replays a prebuilt
dataset, ``test.py:101-150``); :mod:`stereospike_tpu.streaming` added the
stateful low-latency evaluator, and this module supplies what feeds it: a
small source abstraction a live DVS driver can stand behind.

A *source* is any iterable yielding per-window event dicts
``{eye: [N, 4] float32}`` with XYTP rows and **window-relative** timestamps
(seconds since the window start — exactly what
:meth:`streaming.StreamingEvaluator.push` consumes). Three implementations:

* :class:`SyntheticSource` — random windows (smoke tests, latency probes).
* :class:`ReplayDirSource` — replays a DENSE-format ``events/data/*.npy``
  directory (reference ``dense_dataset.py`` layout), optionally paced to
  wall-clock real time.
* :class:`SocketSource` — a live TCP feed. Event-camera drivers publish
  length-prefixed binary packets (see :data:`PACKET_HEADER`); the source
  assembles them into fixed-duration windows by timestamp, per eye. This is
  the adapter a real camera plugs into: run the driver-side
  :func:`send_events` on the machine with the camera, point
  ``stereospike_tpu.cli stream --listen`` at it.

Wire format (little-endian), one packet per ``send_events`` call::

    u32 magic = 0x53504B45 ("SPKE")   u16 version = 1
    u16 eye index (into the source's ``eyes`` tuple)
    u32 n_rows
    f64 t_base — absolute seconds (epoch or camera clock) of the packet
    n_rows × 4 float32 (x, y, dt, p) — dt = t − t_base, monotone per eye

Timestamps reach the assembler as float64 ``t_base + dt``: a float32
*absolute* epoch stamp has ~128 s resolution (the classic event-camera
data-killer — see ``data/mvsec.py:160-167``), while a float32 offset within
a packet is exact to well under a microsecond. ``send_events`` does the
split; only monotonicity matters, not the epoch.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

PACKET_MAGIC = 0x53504B45  # "SPKE"
PACKET_VERSION = 1
# magic, version, eye, n_rows, t_base (float64 absolute seconds)
PACKET_HEADER = struct.Struct("<IHHId")
# depth reply (server → producer): magic, version, n_streams, h, w, then
# n_streams·h·w float32 row-major depth values
DEPTH_MAGIC = 0x53504B44  # "SPKD"
DEPTH_HEADER = struct.Struct("<IHHII")

Window = Dict[str, np.ndarray]


def send_events(sock: socket.socket, eye: int, events: np.ndarray) -> None:
    """Driver-side helper: publish one packet of [N, 4] XYTP rows.

    Timestamps may be float64 epoch seconds: the packet carries the first
    event's stamp as a float64 base and float32 offsets, so no absolute
    precision is lost on the wire."""
    ev = np.asarray(events, np.float64)
    if ev.ndim != 2 or ev.shape[1] != 4:
        raise ValueError(f"events must be [N, 4] XYTP, got {ev.shape}")
    t_base = float(ev[0, 2]) if ev.shape[0] else 0.0
    wire = ev.astype(np.float32)
    wire[:, 2] = (ev[:, 2] - t_base).astype(np.float32)
    sock.sendall(PACKET_HEADER.pack(PACKET_MAGIC, PACKET_VERSION, eye,
                                    ev.shape[0], t_base)
                 + np.ascontiguousarray(wire).tobytes())


def recv_depth(sock: socket.socket) -> Optional[np.ndarray]:
    """Producer-side helper: read one depth reply → [S, H, W] float32.

    None on end of stream — including a server that died mid-reply (the
    partial packet is unusable; a camera driver's reader loop should just
    stop, not crash)."""
    try:
        hdr = _recv_exact(sock, DEPTH_HEADER.size)
        if hdr is None:
            return None
        magic, version, s, h, w = DEPTH_HEADER.unpack(hdr)
        if magic != DEPTH_MAGIC or version != PACKET_VERSION:
            raise ValueError(f"bad depth header (magic={magic:#x})")
        body = _recv_exact(sock, s * h * w * 4)
    except _Truncated:
        return None
    if body is None:
        return None
    return np.frombuffer(body, np.float32).reshape(s, h, w)


class _Truncated(ConnectionError):
    """Peer closed mid-packet (partial header/body)."""


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    """Read exactly n bytes; None on CLEAN EOF (zero bytes), raises
    :class:`_Truncated` on a partial read — a connection that dies (or was
    never speaking SPKE and sent fewer bytes than a header) must be
    distinguishable from a producer that finished."""
    chunks = []
    want = n
    while n:
        b = sock.recv(min(n, 1 << 20))
        if not b:
            if n == want:
                return None
            raise _Truncated(f"peer closed {want - n} bytes into a "
                             f"{want}-byte read")
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


class _WindowAssembler:
    """Slice per-eye absolute-timestamp event packets into fixed windows.

    Maintains one pending buffer per eye; a window [t0, t0 + w) is emitted
    (timestamps relativized to t0) once every eye has seen an event at or
    past the window end — or unconditionally on ``flush``. Events that
    arrive with timestamps BEFORE the current window start (late packets,
    e.g. reordered driver threads) are counted in ``late_dropped`` rather
    than silently binned wrong.
    """

    def __init__(self, eyes: Sequence[str], window_s: float):
        self.eyes = tuple(eyes)
        self.window_s = float(window_s)
        self._pending: Dict[str, list] = {e: [] for e in self.eyes}
        self._t0: Optional[float] = None
        self.late_dropped = 0

    def add(self, eye: str, events: np.ndarray) -> None:
        if events.shape[0] == 0:
            return
        ev = np.asarray(events, np.float64)
        if self._t0 is None:
            self._t0 = float(ev[0, 2])
        if ev[-1, 2] < self._t0:
            self.late_dropped += ev.shape[0]
            return
        late = ev[:, 2] < self._t0
        if late.any():
            self.late_dropped += int(late.sum())
            ev = ev[~late]
        self._pending[eye].append(ev)

    def _eye_max_t(self, eye: str) -> float:
        p = self._pending[eye]
        return float(p[-1][-1, 2]) if p else -np.inf

    def ready(self) -> bool:
        """A full window is available on every eye."""
        if self._t0 is None:
            return False
        end = self._t0 + self.window_s
        return all(self._eye_max_t(e) >= end for e in self.eyes)

    def emit(self) -> Window:
        """Pop the oldest window (relativized timestamps); advances t0."""
        assert self._t0 is not None
        end = self._t0 + self.window_s
        out: Window = {}
        for e in self.eyes:
            if self._pending[e]:
                ev = np.concatenate(self._pending[e])
                take = ev[:, 2] < end
                w = ev[take]
                w[:, 2] -= self._t0
                out[e] = w.astype(np.float32)
                rest = ev[~take]
                self._pending[e] = [rest] if rest.shape[0] else []
            else:
                out[e] = np.zeros((0, 4), np.float32)
        self._t0 = end
        return out

    def flush(self) -> Optional[Window]:
        """Emit whatever remains as a final (possibly partial) window."""
        if self._t0 is None or not any(p for p in self._pending.values()):
            return None
        return self.emit()


class SyntheticSource:
    """Random event windows at a fixed rate (smoke tests, latency probes)."""

    def __init__(self, *, hw: Tuple[int, int], eyes: Sequence[str],
                 n_windows: int, events_per_window: int = 20000,
                 window_s: float = 0.05, seed: int = 0):
        self.hw, self.eyes = hw, tuple(eyes)
        self.n_windows = n_windows
        self.events_per_window = events_per_window
        self.window_s = window_s
        self.seed = seed

    def __iter__(self) -> Iterator[Window]:
        h, w = self.hw
        for i in range(self.n_windows):
            r = np.random.default_rng(self.seed + i)
            n = self.events_per_window
            yield {eye: np.stack([
                r.integers(0, w, n).astype(np.float32),
                r.integers(0, h, n).astype(np.float32),
                np.sort(r.uniform(0, self.window_s, n)).astype(np.float32),
                r.choice([0.0, 1.0], n).astype(np.float32)], axis=1)
                for eye in self.eyes}


class ReplayDirSource:
    """Replay a DENSE-format ``events/data/*.npy`` directory (monocular,
    reference ``dense_dataset.py:60-78`` layout), one file per window.

    ``realtime=True`` paces emission to each window's recorded span — a
    live-camera stand-in for end-to-end latency rehearsal.
    ``window_s`` (derived from the max file span unless given) is exposed
    so the evaluator's bin grid can match the recording cadence.
    """

    def __init__(self, events_dir: str, *, aer_format: str = "TXYP",
                 n_windows: Optional[int] = None, realtime: bool = False,
                 window_s: Optional[float] = None):
        from stereospike_tpu.data.dense import aer_to_xytp

        self._to_xytp = aer_to_xytp
        self.events_dir = events_dir
        self.aer_format = aer_format
        self.realtime = realtime
        files = sorted(f for f in os.listdir(events_dir)
                       if f.endswith(".npy"))
        if not files:
            raise FileNotFoundError(f"no .npy event files in {events_dir}")
        self.files = files[:n_windows] if n_windows else files
        if window_s is None:
            # span needs only the raw time column: memory-map instead of
            # loading+converting every file twice (once here, once on
            # iteration). Column index by AER layout: TXYP → 0, XYTP → 2.
            t_col = 0 if aer_format.upper().startswith("T") else 2
            spans = []
            for f in self.files:
                raw = np.load(os.path.join(events_dir, f), mmap_mode="r")
                spans.append(float(raw[-1, t_col]) - float(raw[0, t_col]))
            # headroom keeps the last event inside the final bin under
            # floor(t/dt) binning (see train/loop.py stream_loop)
            window_s = max(max(spans), 1e-6) * (1 + 1e-6)
        self.window_s = float(window_s)
        self.eyes = ("left",)

    def _load(self, fname: str) -> np.ndarray:
        raw = np.load(os.path.join(self.events_dir, fname))
        return self._to_xytp(raw, self.aer_format).astype(np.float64)

    def __iter__(self) -> Iterator[Window]:
        for f in self.files:
            ev = self._load(f)
            span = float(ev[-1, 2]) - float(ev[0, 2])
            ev[:, 2] -= ev[0, 2]
            if self.realtime:
                time.sleep(span)
            yield {"left": ev.astype(np.float32)}


class SocketSource:
    """Live TCP event feed → fixed-duration windows.

    Listens on ``(host, port)``, accepts ONE producer connection, decodes
    :data:`PACKET_HEADER` packets and yields windows as they complete.
    Ends (StopIteration) when the producer disconnects, after flushing the
    partial tail window. ``late_dropped`` counts events that arrived after
    their window was already emitted (driver reordering) — surfaced instead
    of binned into the wrong window.

    The accept/recv runs in the consumer's thread (one camera, one
    connection — recv is idle-blocking, not compute); a multi-camera
    deployment runs one source per camera and batches via the evaluator's
    ``n_streams``.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 7007, *,
                 eyes: Sequence[str] = ("left", "right"),
                 window_s: float = 0.05, timeout: Optional[float] = 30.0,
                 reconnect: bool = False,
                 _listen_sock: Optional[socket.socket] = None):
        self.eyes = tuple(eyes)
        self.window_s = float(window_s)
        self.timeout = timeout
        # serve-forever mode: when the producer disconnects, flush its tail
        # window, then accept the NEXT producer (fresh clock epoch → fresh
        # assembler) instead of ending iteration. A timed-out re-accept
        # ends iteration cleanly.
        self.reconnect = bool(reconnect)
        if _listen_sock is not None:
            self._srv = _listen_sock
        else:
            self._srv = socket.create_server((host, port))
        self._srv.settimeout(timeout)
        self.late_dropped = 0
        self.bad_packets = 0
        self._conn: Optional[socket.socket] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self._srv.getsockname()[:2]

    def reply(self, depth: np.ndarray) -> None:
        """Send a depth map back to the connected producer over the same
        connection (``[H, W]``, ``[H, W, 1]`` or ``[S, H, W, 1]``); the
        driver side reads it with :func:`recv_depth`. With evaluator
        pipelining the replies lag the event feed by the pipeline depth."""
        if self._conn is None:
            raise RuntimeError("no producer connected")
        d = np.asarray(depth, np.float32)
        if d.ndim == 2:
            d = d[None]
        elif d.ndim == 3 and d.shape[-1] == 1:
            d = d[None, ..., 0]
        elif d.ndim == 4 and d.shape[-1] == 1:
            d = d[..., 0]
        else:
            raise ValueError(f"unexpected depth shape {d.shape}")
        s, h, w = d.shape
        self._conn.sendall(
            DEPTH_HEADER.pack(DEPTH_MAGIC, PACKET_VERSION, s, h, w)
            + np.ascontiguousarray(d).tobytes())

    def _serve_connection(self, conn) -> Iterator[Window]:
        asm = _WindowAssembler(self.eyes, self.window_s)
        late0 = self.late_dropped
        while True:
            try:
                hdr = _recv_exact(conn, PACKET_HEADER.size)
                if hdr is None:
                    break
                magic, version, eye, n_rows, t_base = PACKET_HEADER.unpack(hdr)
                if magic != PACKET_MAGIC or version != PACKET_VERSION:
                    raise ValueError(
                        f"bad packet header (magic={magic:#x}, "
                        f"version={version}) — not a SPKE v1 stream")
                body = _recv_exact(conn, n_rows * 16)
            except _Truncated:
                self.bad_packets += 1
                break  # died mid-packet (or sent < one header of garbage)
            except (socket.timeout, TimeoutError):
                # gone-silent producer: treat like EOF so the tail drain
                # below still emits every fully-buffered window (a stalled
                # eye can leave several) instead of unwinding past it
                self.bad_packets += 1
                break
            if body is None:
                self.bad_packets += 1
                break  # clean EOF where a body belonged
            if eye >= len(self.eyes):
                self.bad_packets += 1
                continue
            ev = np.frombuffer(body, np.float32).reshape(n_rows, 4)
            ev = ev.astype(np.float64)
            ev[:, 2] += t_base  # exact absolute stamps (float64)
            asm.add(self.eyes[eye], ev)
            while asm.ready():
                self.late_dropped = late0 + asm.late_dropped
                yield asm.emit()
        # a stalled eye can leave SEVERAL windows buffered (ready() waits
        # for every eye): drain them all, not just the first
        while True:
            tail = asm.flush()
            self.late_dropped = late0 + asm.late_dropped
            if tail is None:
                break
            yield tail

    def __iter__(self) -> Iterator[Window]:
        first = True
        try:
            while True:
                try:
                    conn, _ = self._srv.accept()
                except (socket.timeout, TimeoutError):
                    if first:
                        raise  # no producer ever showed up: misconfig
                    return     # reconnect mode: served everyone, done
                first = False
                conn.settimeout(self.timeout)
                self._conn = conn
                try:
                    yield from self._serve_connection(conn)
                except (ValueError, socket.timeout, TimeoutError,
                        ConnectionError, OSError):
                    # serve-forever must survive stray connections (port
                    # scanners, health checks) and producers that stall
                    # mid-packet: count, drop the connection, re-accept.
                    # Single-shot mode keeps the loud failure.
                    if not self.reconnect:
                        raise
                    self.bad_packets += 1
                finally:
                    self._conn = None
                    conn.close()
                if not self.reconnect:
                    return
        finally:
            self._srv.close()
