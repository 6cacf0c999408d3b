"""Streaming inference: low-latency stateful depth from live event streams.

The event-camera serving mode the reference never had (its eval replays a
prebuilt dataset, ``test.py:101-150``). Here raw AER events are pushed into
fixed-capacity host ring buffers as they arrive; every 50 ms window (the
LIDAR/GT cadence, ``utils.py:6-11``) the buffered events are padded to a
static block, voxelized ON-DEVICE (rectification gather + scatter-add,
``data/voxelizer.py``), and fed through ONE jitted step that also carries
the membrane-potential state — so the whole per-window pipeline is a single
static-shape XLA program with no recompiles and one host→device transfer
per eye.

Typical use::

    ev = StreamingEvaluator(params, model_cfg, maps={'left': (xm, ym),
                                                     'right': (xm2, ym2)})
    for window in camera:                 # dict eye -> [N, 4] (x, y, t, p)
        depth = ev.push(window)           # [H, W, 1] depth map

``reset_each_window=True`` reproduces the reference's stateless flagship
(fresh state per chunk, train.py:221); ``False`` carries state across
windows (the recurrent/tempo mode).
"""

from __future__ import annotations

import collections
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stereospike_tpu.data.voxelizer import events_to_frames, rectify_events
from stereospike_tpu.models.stereospike import (
    StereoSpikeConfig,
    forward,
    init_state,
)

Array = jax.Array


class EventRingBuffer:
    """Fixed-capacity host ring buffer for one AER stream ([N, 4] rows).

    Overwrites the oldest events when full (a live camera must never block
    the producer); ``pop()`` drains the current contents in arrival order.
    """

    def __init__(self, capacity: int = 1 << 20):
        self._buf = np.zeros((capacity, 4), np.float32)
        self._capacity = capacity
        self._head = 0          # next write position
        self._size = 0
        self.dropped = 0        # total overwritten rows (observability)

    def __len__(self) -> int:
        return self._size

    def push(self, events: np.ndarray) -> None:
        events = np.asarray(events, np.float32)
        n = events.shape[0]
        if n == 0:
            return
        if n >= self._capacity:  # keep only the newest capacity rows
            self.dropped += self._size + n - self._capacity
            self._buf[:] = events[-self._capacity:]
            self._head, self._size = 0, self._capacity
            return
        end = self._head + n
        if end <= self._capacity:
            self._buf[self._head:end] = events
        else:
            k = self._capacity - self._head
            self._buf[self._head:] = events[:k]
            self._buf[:end - self._capacity] = events[k:]
        overflow = max(0, self._size + n - self._capacity)
        self.dropped += overflow
        self._size = min(self._size + n, self._capacity)
        self._head = end % self._capacity

    def pop(self) -> np.ndarray:
        """Drain all buffered events in arrival order."""
        start = (self._head - self._size) % self._capacity
        end = start + self._size
        if end <= self._capacity:
            out = self._buf[start:end].copy()
        else:
            out = np.concatenate(
                [self._buf[start:], self._buf[:end - self._capacity]])
        self._size = 0
        return out


class StreamingEvaluator:
    """Stateful serving evaluator: events in, depth maps out, one jitted step.

    ``maps``: optional per-eye rectification maps ``{eye: (x_map, y_map)}``.
    ``eyes`` orders the input channel blocks (must match the model's
    training layout: left then right, train.py:214-218). Event timestamps
    must be window-relative (seconds since the window start) — a live
    driver's epoch stamps should be relativized by the caller (float64 −
    window t0, as the dataset path does).

    ``n_streams > 1`` serves that many independent cameras in ONE batched
    device step (per-stream ring buffers and membrane state; voxelization
    vmapped over streams, forward at B = n_streams) — amortizing dispatch
    and lifting the MXU out of the B=1 regime, the multi-camera throughput
    mode. ``push`` then takes a list of per-stream event dicts and returns
    a stacked ``[n_streams, H, W, 1]`` array.
    """

    def __init__(
        self,
        params: Dict,
        cfg: StereoSpikeConfig,
        *,
        maps: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None,
        eyes: Tuple[str, ...] = ("left", "right"),
        nfpdm: int = 1,
        window: float = 0.05,
        block: int = 1 << 16,
        reset_each_window: bool = True,
        buffer_capacity: int = 1 << 20,
        pipeline: int = 0,
        n_streams: int = 1,
        compute_dtype=None,
    ):
        if len(eyes) * nfpdm * 2 != cfg.in_channels:
            raise ValueError(
                f"{len(eyes)} eyes x nfpdm={nfpdm} gives "
                f"{len(eyes) * nfpdm * 2} channels; model expects "
                f"{cfg.in_channels}")
        # serving is forward-only: run the inference execution profile
        self.cfg = cfg.for_inference()
        # ``compute_dtype=jnp.bfloat16`` halves the serving HBM working set
        # and runs the convs at MXU bf16 rate; the float32 master params are
        # cast ONCE here, not per window. Depths return as float32 either
        # way. None (default) serves at the params' own precision.
        self._compute_dtype = compute_dtype
        # membrane carries must live in the compute dtype: a float32 state
        # would promote the spike chain back to f32 and break conv dtype
        # agreement
        self._state_dtype = compute_dtype or jnp.float32
        if compute_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if x.dtype == jnp.float32 else x, params)
        self.params = params
        self.eyes = eyes
        self.nfpdm = nfpdm
        self.window = window
        self.block = block
        self.reset_each_window = reset_each_window
        self.pipeline = int(pipeline)
        self.n_streams = int(n_streams)
        # events the voxelizer rejected (timestamp outside [0, window) or
        # out-of-FOV after rectification) — distinct from the ring buffers'
        # overwrite/truncation ``dropped``. Folded into ONE on-device
        # scalar accumulator per fetch (an async add) and only D2H-fetched
        # when ``binning_dropped`` is READ: an eager int() per push would
        # add a whole round trip (~30 ms on this tunnel) to the
        # latency-critical path, and parking a list would grow without
        # bound in serve-forever mode.
        self._host_binning_dropped = 0
        self._drop_acc = None
        # pipelined results in flight: (depth, dropped count, was_list)
        self._pending: "collections.deque[Tuple[Array, Array, bool]]" = collections.deque()
        self.stream_buffers = [
            {e: EventRingBuffer(buffer_capacity) for e in eyes}
            for _ in range(self.n_streams)
        ]
        self.buffers = self.stream_buffers[0]  # single-stream alias
        self._maps = {
            e: (jnp.asarray(maps[e][0], jnp.float32),
                jnp.asarray(maps[e][1], jnp.float32))
            if maps and e in maps else None
            for e in eyes
        }
        # state construction is a closure so the artifact-backed evaluator
        # (from_artifact) can substitute the exported zero-state initializer
        self._init_state = lambda: init_state(cfg, self.n_streams,
                                              self._state_dtype)
        self._state = self._init_state()
        h, w = cfg.in_hw
        dt = window / nfpdm

        def voxelize(ev: Array, valid: Array, eye: str):
            valid_in = valid  # PRE-rectification: FOV rejects must count
            if self._maps[eye] is not None:
                ev, valid = rectify_events(ev, *self._maps[eye], valid,
                                           width=w, height=h)
            fr = events_to_frames(ev, valid, jnp.float32(0.0),
                                  jnp.float32(dt), n_frames=nfpdm,
                                  height=h, width=w)
            # every binned event contributes exactly one count, so the
            # difference against the INPUT's valid rows is the number of
            # events the window silently rejected (timestamp outside
            # [0, window) → the voxelizer's dump bin, or out-of-FOV after
            # rectification — counted against the pre-rectification mask,
            # else a miscalibrated camera reports 0 while serving empty
            # frames) — a mis-relativized live feed would otherwise show
            # clean latencies and empty frames
            dropped = jnp.sum(valid_in) - jnp.sum(fr)
            # [nfpdm, H, W, 2] -> [H, W, nfpdm*2] (frame, pol) stacking
            return jnp.transpose(fr, (1, 2, 0, 3)).reshape(h, w, -1), dropped

        def step(params, state, evs: Dict[str, Array], valids: Dict[str, Array]):
            frames = []
            dropped = jnp.float32(0.0)
            for e in eyes:
                if self.n_streams == 1:
                    # keep the previous B=1 lowering on the latency-critical
                    # single-camera path (no size-1 vmap dimension)
                    fr, dr = voxelize(evs[e][0], valids[e][0], e)
                    frames.append(fr[None])
                else:
                    # evs[e]: [S, block, 4]; vmap the voxelizer over streams
                    fr, dr = jax.vmap(lambda a, v, e=e: voxelize(a, v, e))(
                        evs[e], valids[e])
                    frames.append(fr)
                dropped = dropped + jnp.sum(dr)
            frame = jnp.concatenate(frames, axis=-1)  # [S, H, W, C]
            if self._compute_dtype is not None:
                frame = frame.astype(self._compute_dtype)
            depths, _, new_state = forward(params, frame, self.cfg, state)
            return depths[0].astype(jnp.float32), new_state, dropped

        self._step = jax.jit(step)

    @classmethod
    def from_artifact(cls, path: str, *, buffer_capacity: int = 1 << 20,
                      pipeline: int = 0,
                      reset_each_window: bool = True) -> "StreamingEvaluator":
        """Serve from an exported ``.ssx`` artifact (:mod:`deploy`) instead
        of live params: the whole compute step — rectification, voxelizer,
        stateful forward, weights — comes from the artifact's serialized
        StableHLO, while this class supplies the runtime plumbing (ring
        buffers, padding, pipelining, drop accounting). The deployment
        config: no model/checkpoint code on the serving host."""
        from stereospike_tpu.deploy import load_serving_artifact

        art = load_serving_artifact(path)
        m = art.meta
        self = cls.__new__(cls)
        self.cfg = None  # geometry comes from the manifest
        self.artifact = art
        self._compute_dtype = None
        self._state_dtype = None
        self.params = None
        self.eyes = tuple(m["eyes"])
        self.nfpdm = int(m["nfpdm"])
        self.window = float(m["window_s"])
        self.block = int(m["block"])
        self.reset_each_window = reset_each_window
        self.pipeline = int(pipeline)
        self.n_streams = int(m["n_streams"])
        self._host_binning_dropped = 0
        self._drop_acc = None
        self._pending = collections.deque()
        self.stream_buffers = [
            {e: EventRingBuffer(buffer_capacity) for e in self.eyes}
            for _ in range(self.n_streams)
        ]
        self.buffers = self.stream_buffers[0]
        self._maps = {e: None for e in self.eyes}  # baked into the artifact
        self._init_state = art.init_state
        self._state = art.init_state()
        # jit the exported call once: eager Exported.call re-flattens and
        # re-binds per invocation — repeated host work the latency-critical
        # push() path must not pay every window
        art_step = jax.jit(lambda state, evs, valids: art.step(state, evs,
                                                               valids))
        self._step = lambda params, state, evs, valids: art_step(
            state, evs, valids)
        return self

    def reset(self) -> None:
        self._state = self._init_state()
        self._pending.clear()

    def _pad(self, ev: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        n = min(ev.shape[0], self.block)
        out = np.zeros((self.block, 4), np.float32)
        out[:n] = ev[-self.block:] if ev.shape[0] > self.block else ev
        valid = np.zeros(self.block, bool)
        valid[:n] = True
        return out, valid

    @property
    def binning_dropped(self) -> int:
        """Total voxelizer-rejected events so far (one deferred D2H fetch)."""
        if self._drop_acc is not None:
            self._host_binning_dropped += int(np.asarray(self._drop_acc))
            self._drop_acc = None
        return self._host_binning_dropped

    def _fetch(self, pending) -> np.ndarray:
        depth, dropped, was_list = pending
        self._drop_acc = (dropped if self._drop_acc is None
                          else self._drop_acc + dropped)
        # dict input -> [H, W, 1]; list input -> [S, H, W, 1] (even S = 1),
        # so code parameterized over n_streams can always index stream s
        return np.asarray(depth) if was_list else np.asarray(depth[0])

    def push(self, window_events) -> Optional[np.ndarray]:
        """Feed one window's events per eye; returns a depth map [H, W, 1].

        Static shapes: each eye's events are padded/truncated to ``block``
        rows (truncation keeps the newest events and is counted per stream
        in ``stream_buffers[s][eye].dropped``).

        With ``pipeline=0`` the returned depth is THIS window's
        (synchronous: blocks on device compute + the D2H round trip — on a
        tunneled chip that round trip alone can approach the 50 ms window).
        With ``pipeline=N >= 1`` the new window is dispatched asynchronously
        with up to N windows in flight, and the oldest finished depth is
        fetched and returned once the pipeline is full (``None`` for the
        first N pushes; :meth:`flush` drains the tail). The fetch overlaps
        the in-flight device compute, so the steady-state rate approaches
        the D2H round trip alone, at N windows of extra result latency.
        The membrane-state carry chains on-device either way.

        Multi-stream (``n_streams > 1``): pass a LIST of per-stream event
        dicts; the returned depth is ``[n_streams, H, W, 1]``. A list input
        always yields the stacked stream axis (even for one stream), a dict
        input yields ``[H, W, 1]``.
        """
        single = isinstance(window_events, dict)
        streams = [window_events] if single else list(window_events)
        if single and self.n_streams != 1:
            raise ValueError(
                f"evaluator serves {self.n_streams} streams; push a list of "
                "per-stream event dicts")
        if len(streams) != self.n_streams:
            raise ValueError(
                f"got {len(streams)} streams, evaluator serves {self.n_streams}")
        evs, valids = {}, {}
        for e in self.eyes:
            per_stream_ev, per_stream_valid = [], []
            for s, win in enumerate(streams):
                buf = self.stream_buffers[s][e]
                buf.push(win.get(e, np.zeros((0, 4), np.float32)))
                raw = buf.pop()
                if raw.shape[0] > self.block:
                    buf.dropped += raw.shape[0] - self.block
                ev, valid = self._pad(raw)
                per_stream_ev.append(ev)
                per_stream_valid.append(valid)
            evs[e] = jnp.asarray(np.stack(per_stream_ev))       # [S, block, 4]
            valids[e] = jnp.asarray(np.stack(per_stream_valid))  # [S, block]
        state = (self._init_state()
                 if self.reset_each_window else self._state)
        depth, self._state, dropped = self._step(self.params, state, evs,
                                                 valids)

        if not self.pipeline:
            return self._fetch((depth, dropped, not single))
        self._pending.append((depth, dropped, not single))
        if len(self._pending) > self.pipeline:
            return self._fetch(self._pending.popleft())
        return None

    def flush(self) -> Optional[np.ndarray]:
        """Pipelined mode: fetch the oldest in-flight depth (FIFO, shaped
        per that push's input form), or ``None`` when drained."""
        if not self._pending:
            return None
        return self._fetch(self._pending.popleft())
