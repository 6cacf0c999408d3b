"""MEASURED NEGATIVE RESULT: Pallas nearest-upsample kernels lose 2-4x to
the selection-matmul path at every decoder shape (v5e, B=128 bf16):

    site (n_h,n_w,C)      selection fwd/f+b   pallas fwd/f+b   (ms)
    130x173x64 -> 264x350      6.1 / 20.6       23.1 / 45.4
    65x87x128  -> 134x177      3.0 /  9.8        9.1 / 17.3
    33x44x256  -> 69x91        3.4 /  5.6        5.3 /  9.3
    17x22x512  -> 37x48        1.9 /  3.4        3.3 /  5.3

The kernels are exact (fwd bit-exact, bwd reassociated fp32 sums) and
compile on Mosaic — run this file to reproduce — but the per-tile thin
dots (16-row mixing GEMMs, LANE_TILE-looped W selections) stream the
tensor through VMEM at far below the rate the MXU eats the equivalent
0/1 selection matmuls, and raising the scoped-VMEM limit for the
flattened-minor-dim slabs costs double-buffering headroom. Conclusion:
on TPU, "pure data movement" upsampling IS a matmul problem — the
production path stays ``nn/layers.py::nearest_upsample``. Kept here as
the attack record (ROADMAP §2e); not imported by the package.

Original design notes below.

The decoder's nearest-upsample (torch semantics, src = floor(dst·in/out))
is pure data movement, but every XLA-level formulation measured on a v5e
pays real compute or pathological lowering (benchmarks/deconv_attack.py,
ROADMAP §2):

- constant 0/1 selection matmuls (the previous production form): small-K
  GEMMs at ~50 TFLOP/s → 5.8 ms fwd / 20.7 ms fwd+bwd at the deconv1
  shape (B=128, [130,173,64] → [264,350,64], bf16)
- gather forward: 32 ms (6× the matmul); its transpose is a serialized
  scatter
- repeat + static-concat: 15 ms fwd; reshape-sum backward: 34 ms fwd+bwd

Here the movement happens in VMEM through two small kernels whose compute
is strictly 2-D dots (Mosaic cannot lower dots with multiple remaining
rhs dims — they need in-kernel shape casts):

- ``row-mix``: grid (B, row-tiles). Each tile element-indexes a thin slab
  of source rows (``pl.Element`` BlockSpec, scalar-prefetched start) over
  the FLATTENED minor dims [N, n_w·C], and produces its output rows as
  ``M_t @ slab`` with a tiny per-tile host-precomputed mixing matrix
  (one-hot rows for duplication; 2–3-one rows for the transpose's
  window sums).
- ``lane-batch mix``: grid (B, row-tiles). Each row i of the tile is
  ``SelW @ x[i]`` — a proper [U_w × N_w] × [N_w × C] MXU GEMM (the
  constant selection one-hot rides VMEM once).

Forward: row-mix (H duplication) on the narrow layout, then lane-mix (W
duplication). Backward: the same two kernels with transposed tables, in
the opposite order. The XLA reshapes between stages merge/split minor
dims only (layout no-ops). Forward is exact (0/1 matmuls); the backward
reassociates fp32 sums (tolerance-tested). The selection-matmul path
remains the fallback (CPU backend, or mappings the tables reject).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROW_TILE = 16   # output rows per row-mix grid step
LANE_TILE = 8   # rows per lane-mix grid step


@functools.lru_cache(maxsize=None)
def _src_indices(n: int, u: int) -> np.ndarray:
    return (np.arange(u) * n) // u  # torch: src = floor(dst*in/out)


ALIGN = 16  # slab starts must be sublane-tile aligned (bf16 tile = 16)


def _window_tables(n_in: int, n_out: int, win_start, win_end):
    """Generic row-mix tables: output row o mixes input rows
    [win_start[o], win_end[o]). Slab starts are ALIGN-aligned (Mosaic
    requires provably tile-aligned element offsets on the sublane dim);
    the slab grows until every tile's window fits, or gives up (None)."""
    n_tiles = -(-n_out // ROW_TILE)
    spread = max(
        int(win_end[min((t + 1) * ROW_TILE, n_out) - 1]
            - win_start[t * ROW_TILE])
        for t in range(n_tiles))
    slab = -(-(spread + ALIGN) // ALIGN) * ALIGN
    while True:
        if slab >= n_in:
            slab, full = n_in, True
        else:
            full = False
        base = np.zeros(n_tiles, np.int32)
        mix = np.zeros((n_tiles, ROW_TILE, slab), np.float32)
        ok = True
        for t in range(n_tiles):
            b = 0 if full else (min(int(win_start[t * ROW_TILE]),
                                    n_in - slab) // ALIGN) * ALIGN
            base[t] = b
            for r in range(ROW_TILE):
                o = t * ROW_TILE + r
                if o >= n_out:
                    continue
                s, e = int(win_start[o]) - b, int(win_end[o]) - b
                if not (0 <= s and e <= slab):
                    ok = False
                    break
                mix[t, r, s:e] = 1.0
            if not ok:
                break
        if ok:
            return slab, base, mix
        if full:
            return None
        slab += ALIGN


@functools.lru_cache(maxsize=None)
def _dup_tables(n: int, u: int):
    """Row-mix tables for DUPLICATION n → u (one-hot rows)."""
    src = _src_indices(n, u)
    return _window_tables(n, u, src, src + 1)


@functools.lru_cache(maxsize=None)
def _sum_tables(n: int, u: int):
    """Row-mix tables for the TRANSPOSE u → n: out row = sum of its 1–3
    duplicated input rows (the torch floor mapping gives counts ∈
    {q, q+1})."""
    src = _src_indices(n, u)
    starts = np.searchsorted(src, np.arange(n), side="left")
    ends = np.searchsorted(src, np.arange(n), side="right")
    if (ends - starts).min() < 1:
        return None
    return _window_tables(u, n, starts, ends)


def _row_mix_kernel(base_ref, x_ref, mix_ref, out_ref):
    out_ref[0] = jnp.dot(mix_ref[0], x_ref[0].astype(jnp.float32),
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _row_mix_call(x2d: Array, out_rows: int, slab, base, mix,
                  interpret: bool) -> Array:
    """x2d [B, N, F] → [B, out_rows, F] via per-tile M_t @ element-indexed
    slab."""
    b, n, f = x2d.shape
    n_tiles = -(-out_rows // ROW_TILE)
    # the slab start must be PROVABLY sublane-tile aligned: prefetch the
    # start in ALIGN-units and multiply inside the index map (a runtime
    # value times 16 is divisible by the tile; the raw value is not
    # provable even when its contents happen to be aligned)
    base_blocks = np.asarray(base, np.int32) // ALIGN
    assert (base_blocks * ALIGN == np.asarray(base)).all()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(slab), pl.Element(f)),
                lambda bi, t, base: (bi, base[t] * ALIGN, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE, slab), lambda bi, t, base: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, f), lambda bi, t, base: (bi, t, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _row_mix_kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_rows, f), x2d.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(base_blocks), x2d, jnp.asarray(mix, jnp.float32))


def _lane_mix_kernel(x_ref, sel_ref, out_ref):
    for i in range(LANE_TILE):
        out_ref[0, i] = jnp.dot(sel_ref[...],
                                x_ref[0, i].astype(jnp.float32),
                                preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)


def _lane_mix_call(x: Array, sel: np.ndarray, interpret: bool) -> Array:
    """x [B, H, W_in, C] → [B, H, W_out, C] with out[..., o, :] =
    Σ_w sel[o, w]·x[..., w, :]."""
    b, h, w_in, c = x.shape
    w_out = sel.shape[0]
    n_tiles = -(-h // LANE_TILE)
    grid_spec = pl.GridSpec(
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, LANE_TILE, w_in, c),
                         lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_out, w_in), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANE_TILE, w_out, c),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _lane_mix_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w_out, c), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, jnp.asarray(sel, jnp.float32))


@functools.lru_cache(maxsize=None)
def _selection(u: int, n: int) -> np.ndarray:
    p = np.zeros((u, n), np.float32)
    p[np.arange(u), _src_indices(n, u)] = 1.0
    return p


def upsample_plan_supported(n_h: int, n_w: int, size: Tuple[int, int]) -> bool:
    """True when both axes are genuine upsamplings the tables cover."""
    u_h, u_w = size
    if u_h <= n_h or u_w <= n_w:
        return False
    return (_dup_tables(n_h, u_h) is not None
            and _sum_tables(n_h, u_h) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def nearest_upsample_pallas(x: Array, size: Tuple[int, int],
                            interpret: bool = False) -> Array:
    """Nearest-neighbour NHWC resize to ``size`` (torch semantics) as a
    Pallas kernel pair; see module docstring."""
    return _fwd(x, size, interpret)


def _fwd(x, size, interpret):
    b, n_h, n_w, c = x.shape
    u_h, u_w = size
    slab, base, mix = _dup_tables(n_h, u_h)
    y = _row_mix_call(x.reshape(b, n_h, n_w * c), u_h, slab, base, mix,
                      interpret)
    return _lane_mix_call(y.reshape(b, u_h, n_w, c), _selection(u_w, n_w),
                          interpret)


def _vjp_fwd(x, size, interpret):
    return _fwd(x, size, interpret), (x.shape[1], x.shape[2])


def _vjp_bwd(size, interpret, res, g):
    n_h, n_w = res
    b, u_h, u_w, c = g.shape
    gw = _lane_mix_call(g, _selection(u_w, n_w).T, interpret)
    slab, base, mix = _sum_tables(n_h, u_h)
    dx = _row_mix_call(gw.reshape(b, u_h, n_w * c), n_h, slab, base, mix,
                       interpret)
    return (dx.reshape(b, n_h, n_w, c),)


nearest_upsample_pallas.defvjp(_vjp_fwd, _vjp_bwd)


if __name__ == "__main__":
    import os
    import time

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stereospike_tpu_xla"))
    from stereospike_tpu.nn.layers import nearest_upsample

    def timeit(fn, *args, iters=20):
        for _ in range(3):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    def rec(name, fn, *args):
        f = jax.jit(lambda *a: jnp.sum(jnp.square(fn(*a).astype(jnp.float32))))
        g = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))))
        print(f"{name:22s} fwd {timeit(f, *args):7.2f} ms   "
              f"f+b {timeit(g, *args):7.2f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (2, 130, 173, 64), jnp.float32)
    ref = nearest_upsample(xs, (264, 350))
    got = nearest_upsample_pallas(xs, (264, 350))
    print("fwd err:", float(jnp.abs(ref - got).max()))
    g1 = jax.grad(lambda x: jnp.sum(jnp.square(
        nearest_upsample(x, (264, 350)))))(xs)
    g2 = jax.grad(lambda x: jnp.sum(jnp.square(
        nearest_upsample_pallas(x, (264, 350)))))(xs)
    print("bwd err:", float(jnp.abs(g1 - g2).max()), flush=True)

    for (nh, nw, c), (uh, uw) in [((130, 173, 64), (264, 350)),
                                  ((65, 87, 128), (134, 177)),
                                  ((33, 44, 256), (69, 91)),
                                  ((17, 22, 512), (37, 48))]:
        x = jax.random.normal(key, (128, nh, nw, c), jnp.bfloat16)
        rec(f"sel_{nh}x{nw}x{c}", lambda x, u=(uh, uw): nearest_upsample(x, u), x)
        rec(f"pal_{nh}x{nw}x{c}",
            lambda x, u=(uh, uw): nearest_upsample_pallas(x, u), x)
