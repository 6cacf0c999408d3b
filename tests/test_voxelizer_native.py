"""Tests: device voxelizer vs per-event oracle; native area closing
properties; C++ vs Python fallback agreement; host/device agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.data.voxelizer import (
    events_to_frames,
    rectify_events,
    voxelize_sequence,
)
from stereospike_tpu.native import (
    _area_closing_py,
    area_closing,
    rectify_bin_events,
)


def _random_events(n=5000, seed=0, h=32, w=40, t_max=0.5, signed=False):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    t = np.sort(rng.uniform(0, t_max, n))
    if signed:
        p = rng.choice([-1.0, 0.0, 1.0], n)
    else:
        p = rng.choice([0.0, 1.0], n)
    return np.stack([x, y, t, p], axis=1).astype(np.float32)


def _oracle_bin(events, n_frames, t0, dt, h, w, signed=False):
    """Per-event loop oracle (the reference's accumulation semantics)."""
    frames = np.zeros((n_frames, h, w, 2), np.float32)
    for x, y, t, p in events:
        f = int(np.floor((t - t0) / dt))
        if not (0 <= f < n_frames):
            continue
        if signed and p not in (1.0, -1.0):
            continue
        c = 0 if p == 1 else 1
        frames[f, int(y), int(x), c] += 1
    return frames


@pytest.mark.parametrize("signed", [False, True])
def test_events_to_frames_matches_oracle(signed):
    h, w, n_frames, dt = 32, 40, 7, 0.05
    ev = _random_events(h=h, w=w, signed=signed)
    ref = _oracle_bin(ev, n_frames, 0.0, dt, h, w, signed=signed)
    out = events_to_frames(
        jnp.asarray(ev), jnp.ones(len(ev), bool), jnp.float32(0.0),
        jnp.float32(dt), n_frames=n_frames, height=h, width=w,
        polarity_encoding="signed" if signed else "binary")
    np.testing.assert_array_equal(np.asarray(out), ref)
    # total event mass conserved (minus out-of-window/ignored polarities)
    assert float(out.sum()) <= len(ev)


def test_events_to_frames_masks_invalid():
    ev = _random_events(n=100, h=8, w=8)
    valid = np.zeros(100, bool)
    out = events_to_frames(jnp.asarray(ev), jnp.asarray(valid),
                           jnp.float32(0.0), jnp.float32(0.05),
                           n_frames=2, height=8, width=8)
    assert float(out.sum()) == 0.0


def test_rectify_events_gather_and_fov():
    h, w = 8, 10
    # identity maps except one pixel mapped out of FOV
    x_map = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    y_map = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))
    x_map[2, 3] = -5.0  # events at (3,2) become invalid
    ev = np.array([[3, 2, 0.1, 1], [4, 5, 0.2, 0]], np.float32)
    rect, ok = rectify_events(jnp.asarray(ev), jnp.asarray(x_map),
                              jnp.asarray(y_map), width=w, height=h)
    assert list(np.asarray(ok)) == [False, True]
    np.testing.assert_allclose(np.asarray(rect)[1, :2], [4, 5])


def test_voxelize_sequence_host_wrapper():
    h, w = 16, 20
    ev = _random_events(n=3000, h=h, w=w, t_max=0.3)
    out = voxelize_sequence(ev, n_chunks=3, nfpdm=2, height=h, width=w,
                            block=1 << 10)
    assert out.shape == (3, 2, h, w, 2)
    ref = _oracle_bin(ev, 6, ev[0, 2], 1.0 / 40.0, h, w)
    np.testing.assert_array_equal(out.reshape(6, h, w, 2), ref)


def test_host_rectify_bin_matches_device():
    h, w = 16, 20
    ev = _random_events(n=4000, h=h, w=w, t_max=0.3)
    # jittered rectification map
    rng = np.random.default_rng(1)
    x_map = np.tile(np.arange(w, dtype=np.float32), (h, 1)) + rng.normal(0, 1, (h, w))
    y_map = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w)) + rng.normal(0, 1, (h, w))
    t0, dt, n_frames = float(ev[0, 2]), 0.05, 6
    host = rectify_bin_events(ev, n_frames, t0, dt, x_map=x_map, y_map=y_map,
                              height=h, width=w)
    rect, ok = rectify_events(jnp.asarray(ev), jnp.asarray(x_map),
                              jnp.asarray(y_map), width=w, height=h)
    dev = events_to_frames(rect, ok, jnp.float32(t0), jnp.float32(dt),
                           n_frames=n_frames, height=h, width=w)
    np.testing.assert_array_equal(host, np.asarray(dev))


# ------------------------------------------------------------ area closing
def test_area_closing_fills_small_hole():
    img = np.full((9, 9), 5.0, np.float32)
    img[4, 4] = 1.0  # single dark pixel, area 1 < 24
    out = area_closing(img, 24)
    np.testing.assert_array_equal(out, np.full((9, 9), 5.0))


def test_area_closing_keeps_large_hole():
    img = np.full((12, 12), 5.0, np.float32)
    img[3:9, 3:8] = 1.0  # area 30 >= 24 survives
    out = area_closing(img, 24)
    np.testing.assert_array_equal(out, img)


def test_area_closing_threshold_boundary():
    img = np.full((12, 12), 5.0, np.float32)
    img[2:6, 2:8] = 1.0  # area 24
    assert np.array_equal(area_closing(img, 24), img)      # 24 >= 24 kept
    assert not np.array_equal(area_closing(img, 25), img)  # filled


def test_area_closing_nested_levels():
    # dark hole (area 4) inside darker ring: fills to darkest enclosing level
    img = np.full((10, 10), 9.0, np.float32)
    img[2:8, 2:8] = 4.0   # area 36: survives at threshold 24
    img[4:6, 4:6] = 1.0   # area 4 inside: fills to 4.0
    out = area_closing(img, 24)
    expect = img.copy()
    expect[4:6, 4:6] = 4.0
    np.testing.assert_array_equal(out, expect)


def test_area_closing_properties_random():
    rng = np.random.default_rng(0)
    img = rng.normal(5, 2, (20, 25)).astype(np.float32)
    out = area_closing(img, 10)
    assert np.all(out >= img - 1e-6)                      # extensive
    np.testing.assert_array_equal(area_closing(out, 10), out)  # idempotent


def test_cpp_matches_python_fallback():
    rng = np.random.default_rng(3)
    # quantized values create flat zones — the tricky case for union-find
    img = rng.integers(0, 6, (18, 22)).astype(np.float32)
    np.testing.assert_array_equal(area_closing(img, 12),
                                  _area_closing_py(img, 12))
