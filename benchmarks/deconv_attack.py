#!/usr/bin/env python
"""Candidate implementations for the decoder bottleneck, measured on-chip.

deconv1 (130x173 -> 260x346, 64->32ch, k5) burns 52 ms fwd+bwd of the
188 ms train step at 35 TFLOP/s forward (benchmarks/per_site_timing.json)
— the composite nearest-upsample+conv hits an XLA layout interaction the
bare conv does not (ROADMAP §2). This script measures, at the bench shape
(B=128, bf16), fwd and fwd+bwd of:

  plain        the current production path (upsample_conv)
  phase_d2s    phase-stacked strided conv + depth-to-space (the measured
               forward win that loses under BPTT to the d2s relayout)
  phase_nod2s  the SAME phase conv with the output left in phase layout
               [B,130,173,4co] and the cotangent supplied in phase layout:
               the CEILING for a space-to-depth-canonical level 0, where
               no relayout exists because every full-res tensor lives as
               [B,H/2,W/2,4C]
  d2s_alone    the depth-to-space relayout in isolation (what phase_d2s
               pays over phase_nod2s)
  selgemm      fully-factorized selection GEMMs (the C_out>1 analog of the
               heads' reassociation): ~3x the matmul FLOPs of the naive
               conv but all dense GEMMs, no up-res intermediate
  poly*        polyphase decomposition (nn/layers.polyphase_upsample_conv):
               2.8x fewer MACs (four (k//2+1)^2 phase kernels on the
               low-res grid + exact slip fix-ups), bit-exact — measured
               SLOWER under XLA (the segment assembly and its backward
               dominate), kept as the seed for a future Pallas kernel
  bottom_s2d   bottom conv (k5 s1, 4->32) recast on the s2d grid as a 3x3
               conv 16->128 with a structurally-zero expanded kernel
  conv1_s2d    conv1 (k5 s2, 32->64) consuming the s2d layout likewise

Writes benchmarks/deconv_attack.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

from typing import Optional, Tuple

from stereospike_tpu.nn.layers import (
    _nearest_indices,
    _shifted_selection,
    conv2d,
)

Array = jax.Array

B = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
DTYPE = jnp.bfloat16

H_IN, W_IN, CI, CO, K = 130, 173, 64, 32, 5
TGT = (260, 346)
UP = (TGT[0] + K - 1, TGT[1] + K - 1)


def timeit(fn, *args):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


results = {}


def record(name, fwd_fn, *args, grad_argnums=(0, 1)):
    f = jax.jit(lambda *a: jnp.sum(jnp.square(fwd_fn(*a).astype(jnp.float32))))
    t_f = timeit(f, *args)
    g = jax.jit(jax.grad(
        lambda *a: jnp.sum(jnp.square(fwd_fn(*a).astype(jnp.float32))),
        argnums=grad_argnums))
    t_fb = timeit(g, *args)
    results[name] = {"fwd_ms": round(t_f * 1e3, 3),
                     "fwd_bwd_ms": round(t_fb * 1e3, 3)}
    print(name, results[name], flush=True)



# --------------------------------------------------------------
# Polyphase decomposition (measured and REJECTED for production —
# lived briefly in nn/layers.py; preserved here with its exactness
# check so the measurement stays reproducible):
import functools

@functools.lru_cache(maxsize=None)
def _polyphase_axis_plan(n: int, t: int, k: int):
    """Per-axis plan for the polyphase decomposition of
    upsample-to-(t+k-1)-then-valid-conv-k (≈2× nearest upsampling).

    src(u) = floor(u·n/u_size) duplicates every source ~twice, so away from
    the duplication "slips" the k-tap window over the upsampled axis
    collapses to a (k//2+1)-tap window over the SOURCE axis following one
    of TWO parity patterns: src(o+dy) = src(o) + (p+dy)//2 with a LOCAL
    parity p (it flips at every slip — it is not o%2). Returns
    ``(phase, base, good, bad)``: per-output-position pattern parity p,
    source base index src(o), a goodness mask (the window matches a pure
    pattern — exact polyphase), and the bad positions whose window
    straddles a slip (exact thin fix-up). None if the axis is not ~2×
    (q != 2) or k is even.
    """
    u_size = t + k - 1
    if u_size // n != 2 or k % 2 == 0:
        return None
    src = _nearest_indices(n, u_size)
    phase = np.zeros(t, np.int64)
    good = np.zeros(t, bool)
    for o in range(t):
        for p in range(2):
            if all(src[o + dy] - src[o] == (p + dy) // 2 for dy in range(k)):
                phase[o], good[o] = p, True
                break
    bad = tuple(int(o) for o in np.where(~good)[0])
    return phase, src[:t].copy(), good, bad




# ------------------------------------------------------- polyphase decoder
@functools.lru_cache(maxsize=None)
def _poly_segments(n: int, t: int, k: int, parity: int):
    """Contiguous runs of the parity-``parity`` output grid where the
    polyphase form holds with a constant (pattern p, source shift): list of
    ``(i0, i1, p, shift)`` with src(2i+parity) = i + shift on [i0, i1)."""
    phase, base, good, _ = _polyphase_axis_plan(n, t, k)
    rows = (t - parity + 1) // 2
    segs = []
    for i in range(rows):
        o = 2 * i + parity
        if not good[o]:
            continue
        p, sh = int(phase[o]), int(base[o]) - i
        if segs and segs[-1][1] == i and segs[-1][2] == p and segs[-1][3] == sh:
            segs[-1][1] = i + 1
        else:
            segs.append([i, i + 1, p, sh])
    return tuple(tuple(s) for s in segs)


@functools.lru_cache(maxsize=None)
def _poly_bad_sel(n: int, t: int, k: int) -> np.ndarray:
    """RowSel [n_bad, k, n]: source index per tap for each bad position."""
    _, _, _, bad = _polyphase_axis_plan(n, t, k)
    src = _nearest_indices(n, t + k - 1)
    m = np.zeros((len(bad), k, n), np.float32)
    for r, o in enumerate(bad):
        for dy in range(k):
            m[r, dy, src[o + dy]] = 1.0
    return m


def polyphase_upsample_conv(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    target_hw: Tuple[int, int],
    s2d_out: bool = False,
) -> Optional[Array]:
    """conv_k(nearest_upsample(x, target+k-1)) via polyphase decomposition.

    Nearest ~2× upsampling duplicates every source pixel, so the k-tap
    window over the upsampled grid collapses to a (k//2+1)-tap window over
    the SOURCE grid whose taps depend only on output parity: the whole
    composite becomes ONE low-res conv with four phase kernels built from
    pairwise tap sums of ``w`` — (k//2+1)²/k² ≈ 36% of the naive MACs and
    no up-res intermediate at all. The irregular upsample ratio (e.g.
    130→264 has four rows duplicated thrice) is handled exactly: between
    "slips" the phase result is shifted by a constant drift (a banded
    one-hot selection), and the few output rows/cols whose window straddles
    a slip are recomputed exactly from thin source slices and placed by
    one-hot matmuls. Bit-equal to ``upsample_conv`` up to float
    reassociation (pinned by tests at float64).

    ``s2d_out=True`` returns the s2d layout [B, t_h/2, t_w/2, 4·co]
    (channel block (a·2+b)·co+c = output phase) — the native form for the
    s2d-canonical level 0. Returns None when either axis is not ~2×
    (caller falls back).
    """
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n_h, n_w = x.shape[1], x.shape[2]
    t_h, t_w = target_hw
    if (_polyphase_axis_plan(n_h, t_h, k) is None
            or _polyphase_axis_plan(n_w, t_w, k) is None):
        return None
    if s2d_out and (t_h % 2 or t_w % 2):
        return None
    kt = k // 2 + 1
    dt = x.dtype

    # one conv, four PATTERN kernels (pairwise tap sums of w; indexed by
    # the local (p, q) parity patterns, not the output parity)
    kern = jnp.zeros((kt, kt, ci, 4 * co), w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(k):
                for dx in range(k):
                    kern = kern.at[(p + dy) // 2, (q + dx) // 2, :,
                                   (p * 2 + q) * co:(p * 2 + q + 1) * co
                                   ].add(w[dy, dx])
    xp = jnp.pad(x, ((0, 0), (0, kt - 1), (0, kt - 1), (0, 0)))
    c_all = conv2d(xp, kern, stride=1, padding=0)      # [B, n_h, n_w, 4co]
    c_all = c_all.reshape(c_all.shape[:3] + (2, 2, co))  # [..., p, q, co]

    _, _, _, bad_h = _polyphase_axis_plan(n_h, t_h, k)
    _, _, _, bad_w = _polyphase_axis_plan(n_w, t_w, k)

    # exact full-width values for bad rows: [B, n_bad_h, t_w, co]
    rows_exact = None
    if bad_h:
        row_sel = jnp.asarray(_poly_bad_sel(n_h, t_h, k), dt)
        xr = jnp.einsum("rem,zmnc->zrenc", row_sel, x)
        pw5 = jnp.asarray(np.stack(
            [_shifted_selection(n_w, t_w + k - 1, dx, t_w)
             for dx in range(k)]), dt)                  # [k, t_w, n_w]
        rows_exact = jnp.einsum("dpn,zrenc,edco->zrpo", pw5, xr, w)

    # exact strips for bad cols, in phase-conv row space: Cstrip[p][m, r, co]
    # shares the conv's row indexing, so the H segment assembly applies
    strips = None
    if bad_w:
        col_sel = jnp.asarray(_poly_bad_sel(n_w, t_w, k), dt)
        xc = jnp.einsum("ren,zmnc->zmrec", col_sel, x)  # [B,n_h,n_bc,k,ci]
        xc = jnp.pad(xc, ((0, 0), (0, kt - 1), (0, 0), (0, 0), (0, 0)))
        strips = []
        for p in range(2):
            acc = 0.0
            for u in range(kt):
                taps = [w[dy] for dy in range(k) if (p + dy) // 2 == u]
                if not taps:
                    continue
                gk = taps[0] if len(taps) == 1 else taps[0] + taps[1]
                acc = acc + jnp.einsum("zmrec,eco->zmro",
                                       xc[:, u:u + n_h], gk)
            strips.append(acc)
        strips = jnp.stack(strips, axis=3)  # [B, m, r, p, co]

    def assemble_rows(src_tensor, rows_out, segs, p_axis):
        """Σ_seg zero-pad(shifted slice): rows i∈[i0,i1) take source rows
        i+shift of pattern p — pure slice+pad adds (VPU, fusable)."""
        acc = None
        for i0, i1, p, sh in segs:
            piece = jax.lax.slice_in_dim(
                jnp.take(src_tensor, p, axis=p_axis), i0 + sh, i1 + sh,
                axis=1)
            pad = [(0, 0)] * piece.ndim
            pad[1] = (i0, rows_out - i1)
            acc = piece if acc is None and (i0, i1) == (0, rows_out) \
                else (jnp.pad(piece, pad) if acc is None
                      else acc + jnp.pad(piece, pad))
        if acc is None:
            acc = jnp.zeros((src_tensor.shape[0], rows_out)
                            + src_tensor.shape[2:p_axis]
                            + src_tensor.shape[p_axis + 1:], dt)
        return acc

    grids = {}
    for a in range(2):
        i_rows = (t_h - a + 1) // 2
        segs_h = _poly_segments(n_h, t_h, k, a)
        # ra: [B, I_a, n_w, q, co]
        ra = assemble_rows(c_all, i_rows, segs_h, p_axis=3)
        strip_rows = (assemble_rows(strips, i_rows, segs_h, p_axis=3)
                      if bad_w else None)               # [B, I_a, r, co]
        for bb in range(2):
            j_cols = (t_w - bb + 1) // 2
            segs_w = _poly_segments(n_w, t_w, k, bb)
            ra_sw = jnp.swapaxes(ra, 1, 2)              # [B, n_w, I_a, q, co]
            g = assemble_rows(ra_sw, j_cols, segs_w, p_axis=3)
            g = jnp.swapaxes(g, 1, 2)                   # [B, I_a, J_b, co]
            if bad_w:
                for r, c in enumerate(bad_w):
                    if c % 2 == bb:
                        g = g.at[:, :, c // 2].add(strip_rows[:, :, r])
            if bad_h:
                for r, o in enumerate(bad_h):
                    if o % 2 == a:
                        g = g.at[:, o // 2].add(rows_exact[:, r, bb::2])
            grids[(a, bb)] = g

    if s2d_out:
        out = jnp.concatenate([grids[(0, 0)], grids[(0, 1)],
                               grids[(1, 0)], grids[(1, 1)]], axis=-1)
    else:
        ih, iw = (t_h + 1) // 2, (t_w + 1) // 2
        rows = []
        for a in range(2):
            g0, g1 = grids[(a, 0)], grids[(a, 1)]
            if g1.shape[2] < iw:
                g1 = jnp.pad(g1, ((0, 0), (0, 0), (0, iw - g1.shape[2]),
                                 (0, 0)))
            r = jnp.stack([g0, g1], axis=3)
            r = r.reshape(r.shape[0], r.shape[1], 2 * iw, co)[:, :, :t_w]
            if r.shape[1] < ih:
                r = jnp.pad(r, ((0, 0), (0, ih - r.shape[1]), (0, 0), (0, 0)))
            rows.append(r)
        out = jnp.stack(rows, axis=2)
        out = out.reshape(out.shape[0], 2 * ih, t_w, co)[:, :t_h]
    if b is not None:
        out = out + (jnp.tile(b, 4) if s2d_out else b)
    return out




# ---------------- polyphase with SELECTION-GEMM assembly (round 3):
# the slice/pad segment assembly above replaced by two 0/1 selection
# GEMMs per axis (pattern routing + slip fix-ups as extra GEMM rows).
# MEASURED AND REJECTED TOO: selection GEMMs run ~30 TFLOP/s at these
# shapes regardless of form, while XLA's composite convs run 100-190
# TFLOP/s eating the 2.8x redundant MACs — fwd+bwd loses at every site
# (see 'poly_gemm*' rows in deconv_attack.json).
@functools.lru_cache(maxsize=None)
def _poly_axis_plan(n: int, t: int, k: int):
    """Per-axis plan for the polyphase decomposition of
    upsample-to-(t+k-1)-then-valid-conv-k (≈2× nearest upsampling).

    src(u) = floor(u·n/u_size) duplicates every source ~twice, so away from
    the duplication "slips" the k-tap window over the upsampled axis
    collapses to a (k//2+1)-tap window over the SOURCE axis following one
    of TWO parity patterns: src(o+dy) = src(o) + (p+dy)//2 with a LOCAL
    parity p (it flips at every slip — it is not o%2). Returns
    ``(phase, base, good, bad)`` per output position; None if the axis is
    not ~2× or k is even (caller falls back to the composite form).
    """
    u_size = t + k - 1
    if u_size // n != 2 or k % 2 == 0:
        return None
    src = _nearest_indices(n, u_size)
    phase = np.zeros(t, np.int64)
    good = np.zeros(t, bool)
    for o in range(t):
        for p in range(2):
            if all(src[o + dy] - src[o] == (p + dy) // 2 for dy in range(k)):
                phase[o], good[o] = p, True
                break
    bad = tuple(int(o) for o in np.where(~good)[0])
    return phase, src[:t].copy(), good, bad


@functools.lru_cache(maxsize=None)
def _poly_bad_taps(n: int, t: int, k: int) -> np.ndarray:
    """One-hot [n_bad, k, n]: source index per tap for each output
    position whose k-tap window straddles a duplication slip."""
    _, _, _, bad = _poly_axis_plan(n, t, k)
    src = _nearest_indices(n, t + k - 1)
    m = np.zeros((len(bad), k, n), np.float32)
    for r, o in enumerate(bad):
        for dy in range(k):
            m[r, dy, src[o + dy]] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _poly_sel_tables(n: int, t: int, k: int, parity: int):
    """Selection tables routing the polyphase conv's pattern grids to the
    output axis: ``(sel [2, T, n], bad [T, n_bad] | None)`` with
    ``out[o] = Σ_p Σ_i sel[p, o', i]·pattern_p[i] + Σ_r bad[o', r]·fix[r]``.
    ``parity`` −1 covers all t positions; 0/1 the even/odd subgrid (the
    s2d-canonical output form)."""
    phase, base, good, bad = _poly_axis_plan(n, t, k)
    rows = range(t) if parity < 0 else range(parity, t, 2)
    rows = list(rows)
    sel = np.zeros((2, len(rows), n), np.float32)
    hb = np.zeros((len(rows), max(len(bad), 1)), np.float32)
    for r_i, o in enumerate(rows):
        if good[o]:
            sel[int(phase[o]), r_i, int(base[o])] = 1.0
        else:
            hb[r_i, bad.index(o)] = 1.0
    return sel, (hb if bad else None)


def _poly_pattern_kernel(w: Array, kt: int) -> Array:
    """[kt, kt, ci, 4·co] pattern kernel: channel block (p·2+q) holds the
    pairwise tap sums of ``w`` for H pattern p / W pattern q (accumulated
    in fp32)."""
    k, _, ci, co = w.shape
    w32 = w.astype(jnp.float32)
    kern = jnp.zeros((kt, kt, ci, 4 * co), jnp.float32)
    for p in range(2):
        for q in range(2):
            for dy in range(k):
                for dx in range(k):
                    kern = kern.at[(p + dy) // 2, (q + dx) // 2, :,
                                   (p * 2 + q) * co:(p * 2 + q + 1) * co
                                   ].add(w32[dy, dx])
    return kern


def _poly_axis_collapse(w: Array, kt: int, axis: int) -> Array:
    """[2, kt, k, ci, co]: ``w`` with ONE axis collapsed to its kt-tap
    pattern sums (axis=0: H patterns, full W taps; axis=1: vice versa),
    fp32-accumulated."""
    k = w.shape[0]
    w32 = w.astype(jnp.float32)
    out = jnp.zeros((2, kt, k) + w.shape[2:], jnp.float32)
    for p in range(2):
        for d in range(k):
            tap = w32[d] if axis == 0 else w32[:, d]  # [k, ci, co] either way
            out = out.at[p, (p + d) // 2, :].add(tap)
    return out


def _upsample_conv_poly(x: Array, w: Array, b: Optional[Array],
                        target_hw: Tuple[int, int], *,
                        s2d_out: bool = False) -> Optional[Array]:
    """conv_k(nearest_upsample(x, target+k-1)) via the polyphase
    decomposition with SELECTION-GEMM assembly.

    Reference semantics ``network/blocks.py:110-132`` (NNConvUpsampling).
    Nearest ~2× upsampling duplicates every source pixel, so the composite
    collapses to ONE low-res conv with four (k//2+1)² pattern kernels —
    (k//2+1)²·4/k² ≈ 1.44× the kernel taps on ¼ the pixels ≈ 2.8× fewer
    MACs and no up-res intermediate. Round 2 measured this form SLOWER
    because the per-segment slice/pad/add assembly (and its backward)
    dominated (ROADMAP §2a); here the assembly is two 0/1 selection GEMMs
    per axis (pattern routing + slip fix-ups as extra GEMM rows), the same
    machinery ``nearest_upsample`` already rides the MXU with. Bit-equal
    to ``upsample_conv`` up to float reassociation (the pattern kernels
    pre-sum w taps in fp32).

    ``s2d_out=True`` emits [B, t_h/2, t_w/2, 4·co] with channel block
    (a·2+b)·co — the s2d-canonical level-0 form. Returns None when either
    axis is not ~2× (caller falls back to the composite path).
    """
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n_h, n_w = x.shape[1], x.shape[2]
    t_h, t_w = target_hw
    if (_poly_axis_plan(n_h, t_h, k) is None
            or _poly_axis_plan(n_w, t_w, k) is None):
        return None
    if s2d_out and (t_h % 2 or t_w % 2):
        return None
    kt = k // 2 + 1
    dt = x.dtype
    _, _, _, bad_h = _poly_axis_plan(n_h, t_h, k)
    _, _, _, bad_w = _poly_axis_plan(n_w, t_w, k)

    # the polyphase conv: [B, n_h, n_w, 2, 2, co] pattern grids
    kern = _poly_pattern_kernel(w, kt).astype(dt)
    xp = jnp.pad(x, ((0, 0), (0, kt - 1), (0, kt - 1), (0, 0)))
    c_all = conv2d(xp, kern, stride=1, padding=0)
    c_all = c_all.reshape(c_all.shape[:3] + (2, 2, co))

    # thin exact fix-ups for slip-straddling positions
    zq = s_strip = zc = None
    if bad_h:
        row_sel = jnp.asarray(_poly_bad_taps(n_h, t_h, k), dt)
        xr = jnp.einsum("rem,bmna->brena", row_sel, x)  # [B,r,k,n_w,ci]
        xr_p = jnp.pad(xr, ((0, 0), (0, 0), (0, 0), (0, kt - 1), (0, 0)))
        wq = _poly_axis_collapse(w, kt, axis=1).astype(dt)  # [q,v,e,ci,co]
        zq = sum(
            jnp.einsum("brena,qeaz->brnqz",
                       jax.lax.slice_in_dim(xr_p, v, v + n_w, axis=3),
                       wq[:, v])
            for v in range(kt))                         # [B,r,n_w,2,co]
    if bad_w:
        col_sel = jnp.asarray(_poly_bad_taps(n_w, t_w, k), dt)
        xc = jnp.einsum("sfn,bmna->bmsfa", col_sel, x)  # [B,n_h,s,k,ci]
        xc_p = jnp.pad(xc, ((0, 0), (0, kt - 1), (0, 0), (0, 0), (0, 0)))
        hp = _poly_axis_collapse(w, kt, axis=0).astype(dt)  # [p,u,f,ci,co]
        s_strip = sum(
            jnp.einsum("bmsfa,pfaz->bmspz",
                       jax.lax.slice_in_dim(xc_p, u, u + n_h, axis=1),
                       hp[:, u])
            for u in range(kt))                         # [B,n_h,s,2,co]
    if bad_h and bad_w:
        xrc = jnp.einsum("sfn,brena->bresfa", col_sel, xr)
        zc = jnp.einsum("bresfa,efaz->brsz", xrc, w.astype(dt))

    def grid(par_h: int, par_w: int) -> Array:
        h_sel, h_bad = _poly_sel_tables(n_h, t_h, k, par_h)
        w_sel, w_bad = _poly_sel_tables(n_w, t_w, k, par_w)
        h_sel = jnp.asarray(h_sel, dt)
        w_sel = jnp.asarray(w_sel, dt)
        y1 = (jnp.einsum("oi,bijqz->bojqz", h_sel[0], c_all[:, :, :, 0])
              + jnp.einsum("oi,bijqz->bojqz", h_sel[1], c_all[:, :, :, 1]))
        if bad_h:
            y1 = y1 + jnp.einsum("or,brnqz->bonqz", jnp.asarray(h_bad, dt),
                                 zq)
        out = (jnp.einsum("uj,bojz->bouz", w_sel[0], y1[..., 0, :])
               + jnp.einsum("uj,bojz->bouz", w_sel[1], y1[..., 1, :]))
        if bad_w:
            y1s = (jnp.einsum("oi,bisz->bosz", h_sel[0], s_strip[..., 0, :])
                   + jnp.einsum("oi,bisz->bosz", h_sel[1],
                                s_strip[..., 1, :]))
            if bad_h:
                y1s = y1s + jnp.einsum("or,brsz->bosz",
                                       jnp.asarray(h_bad, dt), zc)
            out = out + jnp.einsum("us,bosz->bouz", jnp.asarray(w_bad, dt),
                                   y1s)
        return out

    if s2d_out:
        out = jnp.concatenate([grid(0, 0), grid(0, 1), grid(1, 0),
                               grid(1, 1)], axis=-1)
    else:
        out = grid(-1, -1)
    if b is not None:
        out = out + (jnp.tile(b, 4) if s2d_out else b)
    return out




def main():
    from stereospike_tpu.nn.layers import (
        _phase_conv_valid,
        _phase_kernel,
        _selection_matrix,
        _shifted_selection,
        conv2d,
        nearest_upsample,
        upsample_conv,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H_IN, W_IN, CI), DTYPE)
    w = jax.random.normal(key, (K, K, CI, CO), DTYPE)

    record("plain", lambda x, w: upsample_conv(x, w, target_hw=TGT), x, w)
    record("phase_d2s",
           lambda x, w: upsample_conv(x, w, target_hw=TGT, phase=True), x, w)

    def phase_nod2s(x, w):
        up = nearest_upsample(x, UP)
        wp = _phase_kernel(w, 2, 2).astype(up.dtype)
        return jax.lax.conv_general_dilated(
            up, wp, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    record("phase_nod2s", phase_nod2s, x, w)

    def d2s(y):
        n, h2, w2, c = y.shape
        y = y.reshape(n, h2, w2, 2, 2, c // 4)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * 2, w2 * 2, c // 4)
    y_phase = jax.random.normal(key, (B, 130, 173, 4 * CO), DTYPE)
    record("d2s_alone", d2s, y_phase, grad_argnums=(0,))

    record("poly_canonical",
           lambda x, w: polyphase_upsample_conv(x, w, target_hw=TGT), x, w)
    record("poly_s2d",
           lambda x, w: polyphase_upsample_conv(x, w, target_hw=TGT,
                                                s2d_out=True), x, w)

    record("poly_gemm",
           lambda x, w: _upsample_conv_poly(x, w, None, TGT), x, w)
    record("poly_gemm_s2d",
           lambda x, w: _upsample_conv_poly(x, w, None, TGT, s2d_out=True),
           x, w)
    from stereospike_tpu.nn.layers import upsample_conv_s2d_out
    record("prod_s2d",
           lambda x, w: upsample_conv_s2d_out(x, w, target_hw=TGT), x, w)

    def selgemm(x, w):
        z = jnp.einsum("bhwc,ijcd->bhwijd", x, w)        # [B,h,w,dy,dx,co]
        pw = jnp.asarray(np.stack(
            [_shifted_selection(W_IN, UP[1], dx, TGT[1]) for dx in range(K)]),
            x.dtype)                                       # [k, w_t, w_in]
        ph = jnp.asarray(np.stack(
            [_shifted_selection(H_IN, UP[0], dy, TGT[0]) for dy in range(K)]),
            x.dtype)                                       # [k, h_t, h_in]
        a = jnp.einsum("jpw,bhwijd->bhpid", pw, z)         # contract (dx, w)
        return jnp.einsum("ioh,bhpid->bopd", ph, a)        # contract (dy, h)
    record("selgemm", selgemm, x, w)

    # ---- space-to-depth recasts of the level-0 encoder convs.
    # A k5 s1 p2 conv on [2H,2W,C] equals a 3x3 conv on the s2d grid
    # [H,W,4C] with an expanded (structurally zero-padded) kernel: output
    # phase (a,b) at (i,j) reads original rows 2i+a-2..2i+a+2 = s2d rows
    # i-1..i+1 at per-phase tap patterns. Channel layout: (p*2+q)*C + c.
    def expand_s2d_kernel(w5):
        ci, co = w5.shape[2], w5.shape[3]
        E = jnp.zeros((3, 3, 4 * ci, 4 * co), w5.dtype)
        for a in range(2):
            for b in range(2):
                for dy in range(5):
                    for dx in range(5):
                        m, n = a + dy - 2, b + dx - 2
                        u, p = m // 2, m % 2
                        v, q = n // 2, n % 2
                        E = E.at[u + 1, v + 1,
                                 (p * 2 + q) * ci:(p * 2 + q + 1) * ci,
                                 (a * 2 + b) * co:(a * 2 + b + 1) * co
                                 ].add(w5[dy, dx])
        return E

    def expand_s2d_kernel_s2(w5):
        # stride-2 consumer: only phase (0,0) outputs survive
        ci, co = w5.shape[2], w5.shape[3]
        E = jnp.zeros((3, 3, 4 * ci, co), w5.dtype)
        for dy in range(5):
            for dx in range(5):
                m, n = dy - 2, dx - 2
                u, p = m // 2, m % 2
                v, q = n // 2, n % 2
                E = E.at[u + 1, v + 1,
                         (p * 2 + q) * ci:(p * 2 + q + 1) * ci, :
                         ].add(w5[dy, dx])
        return E

    x0 = jax.random.normal(key, (B, 130, 173, 16), DTYPE)   # s2d frame
    w_bottom = jax.random.normal(key, (5, 5, 4, 32), DTYPE)
    x0_full = jax.random.normal(key, (B, 260, 346, 4), DTYPE)
    record("bottom_plain", lambda x, w: conv2d(x, w, stride=1, padding=2),
           x0_full, w_bottom)
    record("bottom_s2d",
           lambda x2, w: conv2d(x2, expand_s2d_kernel(w), stride=1, padding=1),
           x0, w_bottom)

    xb = jax.random.normal(key, (B, 130, 173, 128), DTYPE)  # s2d out_bottom
    w_c1 = jax.random.normal(key, (5, 5, 32, 64), DTYPE)
    xb_full = jax.random.normal(key, (B, 260, 346, 32), DTYPE)
    record("conv1_plain", lambda x, w: conv2d(x, w, stride=2, padding=2),
           xb_full, w_c1)
    record("conv1_s2d",
           lambda x2, w: conv2d(x2, expand_s2d_kernel_s2(w), stride=1,
                                padding=1),
           xb, w_c1)

    report = {"batch": B, "dtype": "bfloat16", "iters": ITERS,
              "device_kind": jax.devices()[0].device_kind,
              "backend": jax.default_backend(),
              "shape": {"deconv1": [H_IN, W_IN, CI, CO, K]},
              "sites": results}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "deconv_attack.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "sites"}))


if __name__ == "__main__":
    main()
