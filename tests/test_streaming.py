"""Streaming inference: ring buffer semantics + evaluator equivalence with
the offline voxelize→forward pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.models import init_params, stereospike_monocular, stereospike_tempo
from stereospike_tpu.models.stereospike import forward, init_state
from stereospike_tpu.streaming import EventRingBuffer, StreamingEvaluator

HW = (32, 44)


def _events(n, hw, t_lo, t_hi, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.integers(0, hw[1], n).astype(np.float32),
        rng.integers(0, hw[0], n).astype(np.float32),
        np.sort(rng.uniform(t_lo, t_hi, n)).astype(np.float32),
        rng.choice([0.0, 1.0], n).astype(np.float32),
    ], axis=1)


def test_ring_buffer_order_and_wraparound():
    buf = EventRingBuffer(capacity=8)
    a = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    buf.push(a)
    assert len(buf) == 6
    b = np.arange(100, 100 + 4 * 4, dtype=np.float32).reshape(4, 4)
    buf.push(b)  # wraps: oldest 2 rows of `a` overwritten
    assert len(buf) == 8 and buf.dropped == 2
    out = buf.pop()
    np.testing.assert_array_equal(out, np.concatenate([a[2:], b]))
    assert len(buf) == 0
    # oversized push keeps only the newest `capacity` rows
    big = np.arange(12 * 4, dtype=np.float32).reshape(12, 4)
    buf.push(big)
    np.testing.assert_array_equal(buf.pop(), big[-8:])


def test_streaming_matches_offline_pipeline():
    """One window through the evaluator == events_to_frames + forward."""
    from stereospike_tpu.data.voxelizer import events_to_frames

    cfg = stereospike_monocular(in_hw=HW, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ev = _events(900, HW, 0.0, 0.05, seed=1)
    evaluator = StreamingEvaluator(params, cfg, eyes=("left",), block=1024)
    depth = evaluator.push({"left": ev})

    fr = events_to_frames(jnp.asarray(ev), jnp.ones(900, bool),
                          jnp.float32(0.0), jnp.float32(0.05),
                          n_frames=1, height=HW[0], width=HW[1])
    frame = jnp.transpose(fr, (1, 2, 0, 3)).reshape(HW[0], HW[1], 2)[None]
    depths, _, _ = forward(params, frame, cfg)
    np.testing.assert_allclose(depth, np.asarray(depths[0][0]),
                               rtol=1e-5, atol=1e-5)


def test_streaming_state_carry():
    """reset_each_window=False carries membrane state across windows ==
    two chained stateful forwards."""
    cfg = stereospike_monocular(in_hw=HW, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    w1 = _events(500, HW, 0.0, 0.05, seed=2)
    w2 = _events(500, HW, 0.0, 0.05, seed=3)

    ev = StreamingEvaluator(params, cfg, eyes=("left",), block=512,
                            reset_each_window=False)
    ev.push({"left": w1})
    depth2 = ev.push({"left": w2})

    from stereospike_tpu.data.voxelizer import events_to_frames

    def frame_of(w):
        fr = events_to_frames(jnp.asarray(w), jnp.ones(len(w), bool),
                              jnp.float32(0.0), jnp.float32(0.05),
                              n_frames=1, height=HW[0], width=HW[1])
        return jnp.transpose(fr, (1, 2, 0, 3)).reshape(HW[0], HW[1], 2)[None]

    st = init_state(cfg, 1)
    _, _, st = forward(params, frame_of(w1), cfg, st)
    depths, _, _ = forward(params, frame_of(w2), cfg, st)
    np.testing.assert_allclose(depth2, np.asarray(depths[0][0]),
                               rtol=1e-5, atol=1e-5)


def test_streaming_binocular_channel_layout():
    """Left-then-right channel blocks, matching the training layout."""
    cfg = stereospike_tempo(in_hw=HW, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ev_l = _events(400, HW, 0.0, 0.05, seed=4)
    evaluator = StreamingEvaluator(params, cfg, block=512)
    d = evaluator.push({"left": ev_l, "right": ev_l.copy()})
    assert d.shape == HW + (1,)
    assert np.isfinite(d).all()


def test_streaming_pipelined_mode():
    """pipeline=True returns the previous window's depth (one-window lag),
    flush() drains the last; values match the synchronous evaluator."""
    cfg = stereospike_monocular(in_hw=HW, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    windows = [_events(400, HW, 0.0, 0.05, seed=s) for s in (5, 6, 7)]

    sync = StreamingEvaluator(params, cfg, eyes=("left",), block=512,
                              reset_each_window=False)
    expected = [sync.push({"left": w}) for w in windows]

    pipe = StreamingEvaluator(params, cfg, eyes=("left",), block=512,
                              reset_each_window=False, pipeline=True)
    assert pipe.push({"left": windows[0]}) is None
    d0 = pipe.push({"left": windows[1]})
    d1 = pipe.push({"left": windows[2]})
    d2 = pipe.flush()
    assert pipe.flush() is None
    for got, exp in zip((d0, d1, d2), expected):
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_multi_stream_batched_serving():
    """n_streams=2 serves two cameras in one batched step, matching two
    independent single-stream evaluators (within SNN tolerance)."""
    cfg = stereospike_monocular(in_hw=HW, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    wins_a = [_events(400, HW, 0.0, 0.05, seed=s) for s in (11, 12)]
    wins_b = [_events(400, HW, 0.0, 0.05, seed=s) for s in (13, 14)]

    multi = StreamingEvaluator(params, cfg, eyes=("left",), block=512,
                               reset_each_window=False, n_streams=2)
    d1 = multi.push([{"left": wins_a[0]}, {"left": wins_b[0]}])
    d2 = multi.push([{"left": wins_a[1]}, {"left": wins_b[1]}])
    assert d1.shape == (2,) + HW + (1,) and d2.shape == (2,) + HW + (1,)

    for i, wins in enumerate((wins_a, wins_b)):
        solo = StreamingEvaluator(params, cfg, eyes=("left",), block=512,
                                  reset_each_window=False)
        e1 = solo.push({"left": wins[0]})
        e2 = solo.push({"left": wins[1]})
        np.testing.assert_allclose(d1[i], e1, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(d2[i], e2, rtol=1e-4, atol=1e-4)

    # shape/arity errors are loud
    with pytest.raises(ValueError, match="push a list"):
        multi.push({"left": wins_a[0]})
    with pytest.raises(ValueError, match="got 1 streams"):
        multi.push([{"left": wins_a[0]}])


def test_multi_stream_pipelined_with_maps():
    """Multi-stream x pipelining x rectification maps: FIFO order, stacked
    [S,H,W,1] shapes from list input (even at S=1), flush drains."""
    cfg = stereospike_monocular(in_hw=HW, multiply_factor=10.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # identity rectification maps exercise the vmapped rectify path
    yy, xx = np.mgrid[0:HW[0], 0:HW[1]].astype(np.float32)
    maps = {"left": (xx, yy)}
    wins = [[{"left": _events(300, HW, 0.0, 0.05, seed=10 * w + s)}
             for s in range(2)] for w in range(3)]

    ev = StreamingEvaluator(params, cfg, eyes=("left",), block=512, maps=maps,
                            reset_each_window=False, n_streams=2, pipeline=1)
    assert ev.push(wins[0]) is None
    d0 = ev.push(wins[1])
    d1 = ev.push(wins[2])
    d2 = ev.flush()
    assert ev.flush() is None
    for d in (d0, d1, d2):
        assert d.shape == (2,) + HW + (1,) and np.isfinite(d).all()

    # matches the unpipelined multi-stream evaluator window for window
    ref = StreamingEvaluator(params, cfg, eyes=("left",), block=512, maps=maps,
                             reset_each_window=False, n_streams=2)
    for got, win in zip((d0, d1, d2), wins):
        np.testing.assert_allclose(got, ref.push(win), rtol=1e-5, atol=1e-5)

    # list input to a single-stream evaluator keeps the stream axis
    solo = StreamingEvaluator(params, cfg, eyes=("left",), block=512)
    out = solo.push([wins[0][0]])
    assert out.shape == (1,) + HW + (1,)
    out2 = solo.push(wins[0][0])
    assert out2.shape == HW + (1,)


def test_ring_buffer_property_random_sequences():
    """Randomized push/pop sequences against a deque oracle: contents,
    order, and drop accounting all match for every wraparound pattern."""
    import collections

    rng = np.random.default_rng(0)
    for cap in (7, 16, 64):
        buf = EventRingBuffer(cap)
        oracle = collections.deque(maxlen=cap)
        dropped = 0
        for _ in range(60):
            op = rng.random()
            if op < 0.7:
                n = int(rng.integers(0, 2 * cap))
                ev = rng.normal(size=(n, 4)).astype(np.float32)
                before = len(oracle)
                buf.push(ev)
                for row in ev:
                    if len(oracle) == cap:
                        dropped += 1
                    oracle.append(row)
                assert len(buf) == len(oracle)
            else:
                got = buf.pop()
                exp = np.asarray(list(oracle), np.float32).reshape(-1, 4)
                np.testing.assert_array_equal(got, exp)
                oracle.clear()
                assert len(buf) == 0
        assert buf.dropped == dropped, (cap, buf.dropped, dropped)


def test_binning_window_drops_are_counted():
    """Events whose (supposedly window-relative) timestamps land outside
    [0, window) vanish into the voxelizer's dump bin; the evaluator must
    surface them — a mis-relativized live feed would otherwise show clean
    latencies and empty frames."""
    cfg = stereospike_monocular(in_hw=HW, in_channels=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ev = StreamingEvaluator(params, cfg, eyes=("left",), block=256,
                            window=0.05)

    d = ev.push({"left": _events(100, HW, 0.0, 0.049)})
    assert d.shape == (*HW, 1)
    assert ev.binning_dropped == 0

    # absolute (epoch-like) stamps: every event is out of window
    d = ev.push({"left": _events(100, HW, 1.5e6, 1.5e6 + 0.05)})
    assert ev.binning_dropped == 100

    # half in, half out
    ev.push({"left": np.concatenate([_events(50, HW, 0.0, 0.049),
                                     _events(50, HW, 0.2, 0.25)])})
    assert ev.binning_dropped == 150
