#!/usr/bin/env python
"""Layout-native Pallas T-step recurrence: the round-3 attack on the
measured 12.8 ms (fwd) recurrence-serialization floor (t5_breakdown.json).

Round 2's fused kernels (snn/pallas_kernels.py) lose 3x to custom-call
relayouts: they take x as [T, M], but the conv produces [T*B, h, w, c]
whose chosen layout keeps c in lanes and T*B in SUBLANES (observed on the
v5e: bf16[160,65,87,128]{3,0,2,1:T(8,128)(2,1)}), so the flatten is a
physical copy. The trick tested here: present the SAME bytes to Pallas as
the logical array [h*w, T*B, c] — whose DEFAULT layout {2,1,0} is exactly
the conv output's chosen physical order (h,w major; T*B sublanes; c lanes)
— via transpose+reshape that XLA should turn into bitcasts. The kernel
then walks t with the membrane in VMEM scratch, one grid axis per
(row-tile, lane-tile) and t innermost.

Measures, at the three largest neuron-site shapes (B=16, T=5):
  * unrolled slab chain (the production path in models/multistep.py)
  * this layout-native kernel, including the transpose round trip
  * the round-2 [T, M] kernel, including its relayout
fwd and fwd+bwd (kernel bwd pending the fwd verdict).

Writes ``benchmarks/pallas_recurrence_attempt.json``.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

B = int(os.environ.get("BENCH_BATCH_T", "16"))
T = int(os.environ.get("BENCH_T", "5"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
LANE = 128
ROWS = int(os.environ.get("BENCH_ROWS", "8"))  # hw rows per block


def _fwd_kernel(x_ref, v0_ref, s_ref, vT_ref, *, T, B, v_th, v_reset):
    # blocks: x/s [ROWS, T*B, LANE] (ALL steps: one contiguous DMA per hw
    # row), v0/vT [ROWS, B, LANE]; the T recurrence is an in-kernel loop
    # over sublane slices, carry in registers/VMEM values (no scratch, no
    # cross-invocation state - each block is self-contained)
    v = v0_ref[...].astype(jnp.float32)
    outs = []
    for t in range(T):
        h = v + x_ref[:, t * B:(t + 1) * B, :].astype(jnp.float32)
        s = (h - v_th >= 0).astype(jnp.float32)
        v = (1.0 - s) * h + s * v_reset
        outs.append(s)
        s_ref[:, t * B:(t + 1) * B, :] = s.astype(s_ref.dtype)
    vT_ref[...] = v.astype(vT_ref.dtype)


def fire_native(x4, v0, v_th=1.0, v_reset=0.0):
    """x4: [T*B, h, w, c]; v0: [B, h, w, c] → (spikes [T*B,h,w,c], vT)."""
    TB, h, w, c = x4.shape
    hw = h * w
    # logical view matching the conv output's physical byte order
    x3 = jnp.transpose(x4, (1, 2, 0, 3)).reshape(hw, TB, c)
    v3 = jnp.transpose(v0, (1, 2, 0, 3)).reshape(hw, B, c)
    grid = (hw // ROWS, c // LANE)
    s3, vT3 = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, B=B, v_th=v_th, v_reset=v_reset),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, TB, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, B, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, TB, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, B, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hw, TB, c), x4.dtype),
            jax.ShapeDtypeStruct((hw, B, c), x4.dtype),
        ],
    )(x3, v3)
    s4 = jnp.transpose(s3.reshape(h, w, TB, c), (2, 0, 1, 3))
    vT = jnp.transpose(vT3.reshape(h, w, B, c), (2, 0, 1, 3))
    return s4, vT


def fire_native_pre(x3, v3, shape, v_th=1.0, v_reset=0.0):
    """The same kernel on PRE-SHAPED [hw, TB, c] operands: isolates the
    kernel's own cost from the transpose round trip."""
    hw, TB, c = x3.shape
    grid = (hw // ROWS, c // LANE)
    s3, vT3 = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, B=B, v_th=v_th, v_reset=v_reset),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, TB, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, B, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, TB, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, B, LANE), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hw, TB, c), x3.dtype),
            jax.ShapeDtypeStruct((hw, B, c), x3.dtype),
        ],
    )(x3, v3)
    return s3, vT3


def fire_unrolled(x4, v0, v_th=1.0, v_reset=0.0):
    """The production slab chain (models/multistep.py fire_unrolled)."""
    from stereospike_tpu.snn.neurons import if_step
    from stereospike_tpu.snn.surrogate import make_spike_fn
    spike_fn = make_spike_fn("atan", None)
    v = v0.astype(x4.dtype)
    outs = []
    for t in range(T):
        x_t = jax.lax.slice_in_dim(x4, t * B, (t + 1) * B, axis=0)
        v, s = if_step(v, x_t, v_threshold=v_th, v_reset=v_reset,
                       spike_fn=spike_fn, detach_reset=True)
        outs.append(s)
    return jnp.concatenate(outs, axis=0), v


def fire_r2_kernel(x4, v0, v_th=1.0, v_reset=0.0):
    """Round-2 [T, M] kernel including its relayout cost."""
    from stereospike_tpu.snn.pallas_kernels import multistep_fire
    TB = x4.shape[0]
    M = v0.size
    x2 = x4.reshape(T, M)
    s2, vT = multistep_fire(x2, v0.reshape(M), jnp.zeros(()), v_th, v_reset,
                            "atan", 2.0, False, False, True)
    return s2.reshape(x4.shape), vT.reshape(v0.shape)


def chain(fire, x_in, w1, w2):
    """conv -> T-step fire -> conv: lets XLA choose the custom call's
    boundary layouts the way the composed model would (x4 as a bare
    parameter gets the DEFAULT layout, so the isolated numbers charge the
    kernel a transpose copy the composed program may not pay)."""
    from stereospike_tpu.nn.layers import conv2d
    y = conv2d(x_in, w1, stride=1, padding=1)
    B_ = y.shape[0] // T
    v0 = jnp.zeros((B_,) + y.shape[1:], y.dtype)
    s, _ = fire(y, v0)
    return conv2d(s, w2, stride=1, padding=1)


def timeit(fn, *args):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    report = {"B": B, "T": T, "iters": ITERS, "rows_per_block": ROWS,
              "device_kind": jax.devices()[0].device_kind, "sites": {}}
    # (name, h, w, c) — padded where hw % ROWS or c % 128 != 0 would fail;
    # the production integration pads the same way
    # lane-dim c must be a multiple of 128 for the kernel tiles; c=64/256
    # sites would pad or split lanes in a production integration — the
    # three c>=128 shapes below carry most of the measured serialization
    shapes = [("L0_s2d", 130, 173, 128),
              ("L2", 65, 87, 128),
              ("L3", 33, 44, 256)]
    for name, h, w, c in shapes:
        hw = h * w
        h_pad, w_pad = h, w
        if hw % ROWS:
            # pad w so h*w divides ROWS (production would fold the pad into
            # the existing conv padding)
            while (h_pad * w_pad) % ROWS:
                w_pad += 1
        x = jax.random.normal(key, (T * B, h_pad, w_pad, c), jnp.bfloat16)
        v0 = jnp.zeros((B, h_pad, w_pad, c), jnp.bfloat16)

        def red(fn):
            return lambda x, v: jnp.sum(
                jnp.square(fn(x, v)[0].astype(jnp.float32)))

        t_unroll = timeit(jax.jit(red(fire_unrolled)), x, v0)
        t_native = timeit(jax.jit(red(fire_native)), x, v0)
        t_r2 = timeit(jax.jit(red(fire_r2_kernel)), x, v0)
        # kernel alone, operands already [hw, TB, c]
        hw_p = h_pad * w_pad
        x3 = jnp.transpose(x, (1, 2, 0, 3)).reshape(hw_p, T * B, c)
        x3 = jax.block_until_ready(x3)
        v3 = jnp.zeros((hw_p, B, c), jnp.bfloat16)
        t_pre = timeit(jax.jit(lambda a, b: jnp.sum(jnp.square(
            fire_native_pre(a, b, None)[0].astype(jnp.float32)))), x3, v3)
        # exactness vs the unrolled chain (both IF, hard reset)
        s_a, v_a = jax.jit(fire_unrolled)(x, v0)
        s_b, v_b = jax.jit(fire_native)(x, v0)
        # unrolled accumulates v in bf16, the kernel in f32: near-threshold
        # rounding can flip isolated spikes — compare as a match fraction
        match = float(jnp.mean((s_a == s_b).astype(jnp.float32)))
        exact = match > 0.999
        # composed-boundary comparison at this site's shape
        cin = c
        w1 = jax.random.normal(key, (3, 3, cin, c), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
        xin = jax.random.normal(key, (T * B, h_pad, w_pad, cin), jnp.bfloat16)
        def chain_red(fire):
            return lambda a, u1, u2: jnp.sum(jnp.square(
                chain(fire, a, u1, u2).astype(jnp.float32)))
        t_chain_unroll = timeit(jax.jit(chain_red(fire_unrolled)), xin, w1, w2)
        t_chain_native = timeit(jax.jit(chain_red(fire_native)), xin, w1, w2)
        report["sites"][name] = {
            "shape": [h_pad, w_pad, c],
            "unrolled_fwd_ms": round(t_unroll, 3),
            "native_kernel_fwd_ms": round(t_native, 3),
            "r2_kernel_fwd_ms": round(t_r2, 3),
            "native_vs_unrolled": round(t_unroll / t_native, 3),
            "kernel_only_fwd_ms": round(t_pre, 3),
            "chain_unrolled_fwd_ms": round(t_chain_unroll, 3),
            "chain_native_fwd_ms": round(t_chain_native, 3),
            "spike_match_fraction": match,
            "exact": exact,
        }
        print(name, report["sites"][name], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pallas_recurrence_attempt.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "sites"}))


if __name__ == "__main__":
    main()
