"""Pallas TPU kernels: fused multi-timestep neuron dynamics.

The TPU-native counterpart of SpikingJelly's CUDA "cext" multi-step neuron
ops (the reference's only native acceleration, disabled there —
``SNN_models.py:260``; advertised in its README as the big speedup). For a
feedforward SNN, running layer-major (each layer processes all T steps
before the next layer) is semantically identical to step-major, and lets:

- convolutions batch over B·T (bigger MXU matmuls), and
- the per-layer temporal recurrence run in ONE kernel: membrane potential
  lives in VMEM across all T steps instead of round-tripping HBM per step
  (what a ``lax.scan`` of elementwise ops compiles to).

The kernel computes, over t = 0..T-1 (hard reset, detach_reset semantics,
matching ``snn/neurons.py``):

    h_t   = charge(v_{t-1}, x_t)        IF: v+x;  LIF/PLIF: v + (x-v)·k
    s_t   = H(h_t - v_th)
    v_t   = (1-s_t)·h_t + s_t·v_reset

with a custom VJP whose backward kernel recomputes h_t (forward replay in
VMEM) then walks t = T-1..0:

    dh_t    = gs_t·σ'(h_t - v_th) + gv_t·(1-s_t)
    dx_t    = dh_t·∂h/∂x;   gv_{t-1} = dh_t·∂h/∂v
    (PLIF)  dk += dh_t·(x_t - v_{t-1})

σ' is the ATan or Sigmoid surrogate derivative. Data layout: x [T, M] with
M = flattened B·H·W·C padded to the 128-lane tile; grid over M tiles, T
unrolled in-kernel. The pure-jnp scan in ``snn/neurons.py`` remains the
correctness oracle and the interpret-mode fallback for CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_HALF_PI = math.pi / 2.0
LANE = 128
TILE_ROWS = 64  # rows of 128 lanes per grid step (64*128 = 8192 elements)


def _surrogate_grad(u: Array, surrogate: str, alpha: float) -> Array:
    if surrogate == "atan":
        s = _HALF_PI * alpha * u
        return alpha / (2.0 * (1.0 + s * s))
    s = jax.nn.sigmoid(alpha * u)
    return alpha * s * (1.0 - s)


def _charge(v, x, leak, is_if: bool):
    # static IF/LIF dispatch: Mosaic dislikes scalar-predicate selects, and
    # the neuron mode is compile-time anyway
    if is_if:
        return v + x
    return v + (x - v) * leak


# ------------------------------------------------------------------ forward
def _fwd_kernel(x_ref, v0_ref, leak_ref, spikes_ref, vT_ref, *, T, v_th,
                v_reset, is_if):
    # all operands are 2-D [TILE_ROWS, 128] tiles (Mosaic-native layout);
    # recurrence computed in fp32 regardless of the I/O dtype (the VPU has
    # no bf16 compare, and fp32 keeps membrane accumulation exact)
    leak = leak_ref[0, 0]
    v = v0_ref[0].astype(jnp.float32)
    for t in range(T):
        h = _charge(v, x_ref[t].astype(jnp.float32), leak, is_if)
        s = (h - v_th >= 0).astype(jnp.float32)
        v = (1.0 - s) * h + s * v_reset
        spikes_ref[t] = s.astype(spikes_ref.dtype)
    vT_ref[0] = v.astype(vT_ref.dtype)


def _bwd_kernel(x_ref, v0_ref, leak_ref, gs_ref, gvT_ref,
                gx_ref, gv0_ref, gleak_ref, h_scratch, *scratch,
                **meta):
    T, v_th, v_reset = meta["T"], meta["v_th"], meta["v_reset"]
    surrogate, alpha = meta["surrogate"], meta["alpha"]
    plif, is_if = meta["plif"], meta["is_if"]
    # PLIF needs v_{t-1} in the backward walk; replaying it forward into a
    # second scratch avoids the algebraic inversion (h - leak·x)/(1 - leak),
    # which divides by zero as leak = sigmoid(w) → 1 (tau → 1, reachable
    # since w is trained)
    v_scratch = scratch[0] if plif else None
    leak = leak_ref[0, 0]
    # forward replay: store h_t (and v_{t-1} for PLIF) in fp32 scratch
    v = v0_ref[0].astype(jnp.float32)
    for t in range(T):
        if plif:
            v_scratch[t] = v
        h = _charge(v, x_ref[t].astype(jnp.float32), leak, is_if)
        h_scratch[t] = h
        s = (h - v_th >= 0).astype(jnp.float32)
        v = (1.0 - s) * h + s * v_reset
    # backward walk
    gv = gvT_ref[0].astype(jnp.float32)
    gleak = jnp.zeros_like(gv)
    for t in range(T - 1, -1, -1):
        h = h_scratch[t]
        s = (h - v_th >= 0).astype(jnp.float32)
        dh = gs_ref[t].astype(jnp.float32) \
            * _surrogate_grad(h - v_th, surrogate, alpha) \
            + gv * (1.0 - s)
        # ∂h/∂x = 1 (IF) or leak; ∂h/∂v_prev = 1 (IF) or (1-leak)
        if is_if:
            dx = dh
            gv = dh
        else:
            dx = dh * leak
            gv = dh * (1.0 - leak)
        gx_ref[t] = dx.astype(gx_ref.dtype)
        if plif:
            # ∂h/∂leak = x_t - v_{t-1}, with v_{t-1} from the replay scratch
            gleak = gleak + dh * (x_ref[t].astype(jnp.float32) - v_scratch[t])
    gv0_ref[0] = gv.astype(gv0_ref.dtype)
    gleak_ref[0] = gleak.astype(gleak_ref.dtype)


def _pad_to(x: Array, m: int, axis: int) -> Array:
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def multistep_fire(
    x: Array,
    v0: Array,
    leak: Array,
    v_threshold: float = 1.0,
    v_reset: float = 0.0,
    surrogate: str = "atan",
    alpha: float = 2.0,
    plif: bool = False,
    interpret: bool = False,
    is_if: bool = False,
) -> Tuple[Array, Array]:
    """Fused T-step fire: ``x`` [T, M] charges → (spikes [T, M], v_T [M]).

    ``leak`` is a scalar array: 0.0 → IF; otherwise the LIF/PLIF decay
    factor 1/tau (sigmoid(w) for PLIF — pass ``plif=True`` so its gradient
    is produced). Gradients w.r.t. x, v0 and leak flow through the custom
    VJP; reset is detached (SpikingJelly ``detach_reset=True``).
    """
    spikes, vT = _ms_forward(x, v0, leak, v_threshold, v_reset, interpret,
                             is_if)
    return spikes, vT


def _to_tiles(x2d: Array):
    """[T, M] → [T, R, 128] with R padded to TILE_ROWS."""
    T, M = x2d.shape
    xp = _pad_to(x2d, LANE, 1)
    R = xp.shape[1] // LANE
    x3 = xp.reshape(T, R, LANE)
    x3 = _pad_to(x3, TILE_ROWS, 1)
    return x3, x3.shape[1]


def _ms_forward(x, v0, leak, v_th, v_reset, interpret, is_if):
    T, M = x.shape
    x3, R = _to_tiles(x)
    v03, _ = _to_tiles(v0.reshape(1, M))
    grid = (R // TILE_ROWS,)
    leak2 = leak.reshape(1, 1).astype(jnp.float32)
    spikes, vT = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, v_th=v_th, v_reset=v_reset,
                          is_if=is_if),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, TILE_ROWS, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_ROWS, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, TILE_ROWS, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_ROWS, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANE), x.dtype),
            jax.ShapeDtypeStruct((1, R, LANE), x.dtype),
        ],
        interpret=interpret,
    )(x3, v03, leak2)
    return (spikes.reshape(T, R * LANE)[:, :M],
            vT.reshape(R * LANE)[:M])


def _ms_fwd(x, v0, leak, v_th, v_reset, surrogate, alpha, plif, interpret,
            is_if):
    out = _ms_forward(x, v0, leak, v_th, v_reset, interpret, is_if)
    return out, (x, v0, leak)


def _ms_bwd(v_th, v_reset, surrogate, alpha, plif, interpret, is_if, res,
            grads):
    x, v0, leak = res
    gs, gvT = grads
    T, M = x.shape
    x3, R = _to_tiles(x)
    v03, _ = _to_tiles(v0.reshape(1, M))
    gs3, _ = _to_tiles(gs)
    gvT3, _ = _to_tiles(gvT.reshape(1, M))
    grid = (R // TILE_ROWS,)
    leak2 = leak.reshape(1, 1).astype(jnp.float32)
    block = lambda t: pl.BlockSpec((t, TILE_ROWS, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    gx, gv0, gleak = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, v_th=v_th, v_reset=v_reset,
                          surrogate=surrogate, alpha=alpha, plif=plif,
                          is_if=is_if),
        grid=grid,
        in_specs=[
            block(T), block(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block(T), block(1),
        ],
        out_specs=[block(T), block(1), block(1)],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANE), x.dtype),
            jax.ShapeDtypeStruct((1, R, LANE), x.dtype),
            jax.ShapeDtypeStruct((1, R, LANE), x.dtype),
        ],
        scratch_shapes=(
            [pltpu.VMEM((T, TILE_ROWS, LANE), jnp.float32)] * (2 if plif else 1)),
        interpret=interpret,
    )(x3, v03, leak2, gs3, gvT3)
    gx = gx.reshape(T, R * LANE)[:, :M]
    gv0 = gv0.reshape(R * LANE)[:M]
    # leak is a scalar: reduce its per-element grads (zero unless PLIF)
    gleak_val = (jnp.sum(gleak.reshape(R * LANE)[:M]) if plif
                 else jnp.zeros((), x.dtype))
    return gx, gv0, gleak_val.reshape(leak.shape).astype(leak.dtype)


multistep_fire.defvjp(_ms_fwd, _ms_bwd)


# ------------------------------------------------------- jnp reference path
def multistep_fire_reference(
    x: Array, v0: Array, leak: Array,
    v_threshold: float = 1.0, v_reset: float = 0.0,
    surrogate: str = "atan", alpha: float = 2.0, plif: bool = False,
) -> Tuple[Array, Array]:
    """Pure-jnp oracle: lax.scan of the cell step (same custom-grad
    semantics via snn.surrogate)."""
    from stereospike_tpu.snn.surrogate import make_spike_fn

    spike_fn = make_spike_fn(surrogate, alpha)

    def step(v, xt):
        h = jnp.where(leak == 0.0, v + xt, v + (xt - v) * leak)
        s = spike_fn(h - v_threshold)
        s_d = jax.lax.stop_gradient(s)
        v2 = (1.0 - s_d) * h + s_d * v_reset
        return v2, s

    vT, spikes = jax.lax.scan(step, v0, x)
    return spikes, vT
