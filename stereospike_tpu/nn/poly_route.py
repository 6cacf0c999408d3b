"""Polyphase upsample-conv with copy-speed routing (the deconv1 win).

The decoder's dominant site is ``nearest-upsample → k5 VALID conv``
(reference ``NNConvUpsampling``, ``network/blocks.py:110-132``). Nearest ~2×
upsampling duplicates every source pixel, so the k-tap window over the
upsampled grid collapses to a (k//2+1)-tap window over the SOURCE grid:
ONE low-res conv with four pattern kernels (pairwise tap sums of ``w``)
computes every output value at 2.8× fewer MACs — *if* the per-position
pattern routing is free. Round 3 measured every XLA-level re-expression of
that routing it tried (slice/pad-ADD assembly, selection GEMMs, gathers)
and each one ate the MAC win (``benchmarks/deconv_attack.json``, ROADMAP
§2). Round 4 found the two missing pieces:

  * the routing IS free when written as a zero-init + chain of static
    ``dynamic_update_slice`` — XLA updates in place, so the whole forward
    routing costs one HBM copy pass (~2 ms at the production deconv1
    shape, vs ~40 ms for the round-3 pad-ADD/selection-GEMM forms);
  * what remained expensive was XLA's AUTODIFF of that chain (~17 ms of
    zero-mask propagation through 100+ updates); the routing is a
    bijective relabelling of cells, so its true VJP is just the reversed
    copy chain — the custom VJP below.

(A Pallas HBM→HBM DMA kernel was attempted first: Mosaic rejects it —
memref slices along the minor dim must be 128-lane aligned and the
pattern blocks are 32 wide. The DUS chain needs no kernel at all and
hits copy speed, so the kernel was dropped rather than kept.)

Plan structure per output parity (a, b): the good output positions form
≤ ~5 contiguous segments per axis with constant (pattern, source shift)
(``_axis_plan``) — one rectangle copy each; the ~10 per-axis positions
whose window straddles a duplication slip are computed exactly from thin
source slices (``rows_exact`` / ``strips``) and placed the same way.
Coverage is exact: every output cell is written exactly once and every
``c_all`` cell is read at most once (asserted by the plan builder).

Output layout: the routed buffer is phase-major ([B, ⌈t_h/2⌉, ⌈t_w/2⌉,
4·co], channel block (a·2+b) = output phase). For the level-0 deconv1
(even target) that IS the s2d-canonical layout the production model keeps
every full-res tensor in (``s2d_level0``) — zero epilogue. For the inner
decoder sites (deconv2/3/4, odd target axes) a depth-to-space interleave +
crop lands the plain NHWC layout their consumers expect
(:func:`upsample_conv_poly`) — measured, that epilogue plus the fix-ups
eat the MAC win there (fwd+bwd 0.94×/0.96×/1.02× vs the composite), so
the inner sites ship composite and polyphase stays a knob.

Measured at the production deconv1 site (B=128 bf16, 130×173×64 → s2d,
v5e): composite 16.5/42.5 ms fwd/f+b → polyphase 10.1/32.1 ms
(1.63×/1.32×) — ``benchmarks/pallas_poly_deconv.json``.

BATCH-SENSITIVE: the copy chain's per-copy overhead only amortizes at
large leading dims — whole-step train ratios poly/composite are 1.049×
at leading 128 but 0.712× at 80 and 0.465× at 16 under scan+remat
(``pallas_poly_deconv.json`` batch_sweep). The model therefore routes
polyphase only when the site's traced leading dim reaches
``StereoSpikeConfig.poly_min_batch`` (default 128).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ------------------------------------------------------------ axis plans
def _nearest_indices(n: int, m: int) -> np.ndarray:
    """torch UpsamplingNearest2d semantics: src = floor(dst·n/m)."""
    return (np.arange(m) * n // m).astype(np.int64)


@functools.lru_cache(maxsize=None)
def _axis_plan(n: int, t: int, k: int):
    """Per-output-position polyphase plan for one axis of
    upsample-to-(t+k-1)-then-valid-conv-k.

    Away from duplication slips, src(o+d) = src(o) + (p+d)//2 for a LOCAL
    parity p (it flips at every slip). Returns ``(phase, base, good, bad)``
    or None if the axis is not ~2× or k is even.
    """
    u_size = t + k - 1
    if u_size // n != 2 or k % 2 == 0:
        return None
    src = _nearest_indices(n, u_size)
    phase = np.zeros(t, np.int64)
    good = np.zeros(t, bool)
    for o in range(t):
        for p in range(2):
            if all(src[o + d] - src[o] == (p + d) // 2 for d in range(k)):
                phase[o], good[o] = p, True
                break
    bad = tuple(int(o) for o in np.where(~good)[0])
    return phase, src[:t].copy(), good, bad


@functools.lru_cache(maxsize=None)
def _segments(n: int, t: int, k: int, parity: int) -> Tuple[Tuple[int, ...], ...]:
    """Contiguous good runs of the parity subgrid: (i0, i1, pattern, shift)
    with src(2i+parity) = i + shift on [i0, i1)."""
    phase, base, good, _ = _axis_plan(n, t, k)
    segs: List[List[int]] = []
    for i in range((t - parity + 1) // 2):
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
def _route_copies(n_h: int, t_h: int, n_w: int, t_w: int, k: int):
    """The full static copy set routing (c_all, rows_exact, strips) → out.

    Returns ``(core, badrow, badcol)`` where
      core:   (a, b, i0, i1, sh, p, j0, j1, sw, q)
      badrow: (a, b, i, r)          — out row i, phase (a,b) ← rows_ex[r, b]
      badcol: (a, b, j, r, i0, i1, sh, p) — out col j ← strips[r, p] rows
    and asserts exact single coverage of the output grid.
    """
    segs_h = {a: _segments(n_h, t_h, k, a) for a in (0, 1)}
    segs_w = {b: _segments(n_w, t_w, k, b) for b in (0, 1)}
    _, _, _, bad_h = _axis_plan(n_h, t_h, k)
    _, _, _, bad_w = _axis_plan(n_w, t_w, k)
    core, badrow, badcol = [], [], []
    for a in (0, 1):
        for (i0, i1, p, sh) in segs_h[a]:
            for b in (0, 1):
                for (j0, j1, q, sw) in segs_w[b]:
                    core.append((a, b, i0, i1, sh, p, j0, j1, sw, q))
    for r, o in enumerate(bad_h):
        for b in (0, 1):
            badrow.append((o % 2, b, o // 2, r))
    for r, c in enumerate(bad_w):
        b = c % 2
        for a in (0, 1):
            for (i0, i1, p, sh) in segs_h[a]:
                badcol.append((a, b, c // 2, r, i0, i1, sh, p))

    # buffer grid is ⌈t/2⌉ per axis; for odd axes the off-parity tail cell
    # is PAD — never produced by the plan (cropped by the d2s epilogue),
    # except that bad-row fix-ups write their (zero) pad column
    I0, J0 = (t_h + 1) // 2, (t_w + 1) // 2
    cover = np.zeros((2, 2, I0, J0), np.int32)
    real = np.zeros((2, 2, I0, J0), bool)
    for a in (0, 1):
        for b in (0, 1):
            real[a, b, :(t_h - a + 1) // 2, :(t_w - b + 1) // 2] = True
    for (a, b, i0, i1, _, _, j0, j1, _, _) in core:
        cover[a, b, i0:i1, j0:j1] += 1
    for (a, b, i, _) in badrow:
        cover[a, b, i, :] += 1
    for (a, b, j, _, i0, i1, _, _) in badcol:
        cover[a, b, i0:i1, j] += 1
    assert (cover[real] == 1).all() and (cover[~real] <= 1).all(), \
        "routing must cover every real output cell exactly once"

    # reverse-read multiplicity must be ≤ 1 for the set-only DMA transpose
    reads = np.zeros((2, 2, n_h, n_w), np.int32)
    for (a, b, i0, i1, sh, p, j0, j1, sw, q) in core:
        reads[p, q, i0 + sh:i1 + sh, j0 + sw:j1 + sw] += 1
    assert reads.max() <= 1, "transposed routing would need accumulation"
    s_reads = np.zeros((2, n_h, max(len(bad_w), 1)), np.int32)
    for (a, b, j, r, i0, i1, sh, p) in badcol:
        s_reads[p, i0 + sh:i1 + sh, r] += 1
    assert s_reads.max() <= 1, "strip transpose would need accumulation"
    return tuple(core), tuple(badrow), tuple(badcol)


def _operand_shapes(dims, batch: int):
    """(c_all, rows_ex, strips) shapes from the static plan + batch."""
    n_h, t_h, n_w, t_w, k, co = dims
    _, _, _, bad_h = _axis_plan(n_h, t_h, k)
    _, _, _, bad_w = _axis_plan(n_w, t_w, k)
    return ((batch, n_h, n_w, 4 * co),
            (batch, max(len(bad_h), 1), 2, (t_w + 1) // 2, co),
            (batch, n_h, max(len(bad_w), 1), 2, co))


# ------------------------------------------------------- DUS-chain routing
def _route_impl(c_all: Array, rows_ex: Array, strips: Array, dims) -> Array:
    """The routing as a zero-init + static slice/dynamic-update-slice chain.

    XLA performs the chained DUS in place (measured: the whole forward
    routing costs ~2 ms over the pattern conv at the production shape —
    HBM copy speed). The naive autodiff of this chain is what loses (~17 ms
    of zero-mask propagation through 100+ updates), hence the custom VJP
    below with the hand-written transposed chain.
    """
    n_h, t_h, n_w, t_w, k, co = dims
    core, badrow, badcol = _route_copies(n_h, t_h, n_w, t_w, k)
    B = c_all.shape[0]
    I, J = (t_h + 1) // 2, (t_w + 1) // 2
    dus = jax.lax.dynamic_update_slice
    out = jnp.zeros((B, I, J, 4 * co), c_all.dtype)
    for (a, b, i0, i1, sh, p, j0, j1, sw, q) in core:
        piece = jax.lax.slice(
            c_all, (0, i0 + sh, j0 + sw, (p * 2 + q) * co),
            (B, i1 + sh, j1 + sw, (p * 2 + q + 1) * co))
        out = dus(out, piece, (0, i0, j0, (a * 2 + b) * co))
    for (a, b, i, r) in badrow:
        piece = rows_ex[:, r, b][:, None, :, :]            # [B, 1, J, co]
        out = dus(out, piece, (0, i, 0, (a * 2 + b) * co))
    for (a, b, j, r, i0, i1, sh, p) in badcol:
        piece = strips[:, i0 + sh:i1 + sh, r, p][:, :, None, :]
        out = dus(out, piece, (0, i0, j, (a * 2 + b) * co))
    return out


def _route_transpose(g: Array, dims):
    """Transpose of :func:`_route_impl` (it is a bijective relabelling of
    cells, so the cotangent routing is the reversed copy set; cells the
    forward never reads — ~6% of c_all's pattern blocks, strip rows outside
    every segment — stay zero)."""
    n_h, t_h, n_w, t_w, k, co = dims
    core, badrow, badcol = _route_copies(n_h, t_h, n_w, t_w, k)
    c_shape, re_shape, st_shape = _operand_shapes(dims, g.shape[0])
    B = g.shape[0]
    dus = jax.lax.dynamic_update_slice
    dc = jnp.zeros(c_shape, g.dtype)
    for (a, b, i0, i1, sh, p, j0, j1, sw, q) in core:
        piece = jax.lax.slice(
            g, (0, i0, j0, (a * 2 + b) * co),
            (B, i1, j1, (a * 2 + b + 1) * co))
        dc = dus(dc, piece, (0, i0 + sh, j0 + sw, (p * 2 + q) * co))
    dre = jnp.zeros(re_shape, g.dtype)
    for (a, b, i, r) in badrow:
        piece = g[:, i, :, (a * 2 + b) * co:(a * 2 + b + 1) * co]
        dre = dus(dre, piece[:, None, None, :, :], (0, r, b, 0, 0))
    dst = jnp.zeros(st_shape, g.dtype)
    for (a, b, j, r, i0, i1, sh, p) in badcol:
        piece = g[:, i0:i1, j, (a * 2 + b) * co:(a * 2 + b + 1) * co]
        dst = dus(dst, piece[:, :, None, None, :], (0, i0 + sh, r, p, 0))
    return dc, dre, dst


# ------------------------------------------------------ the routed op
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _route(c_all: Array, rows_ex: Array, strips: Array, dims) -> Array:
    return _route_impl(c_all, rows_ex, strips, dims)


def _route_fwd(c_all, rows_ex, strips, dims):
    return _route_impl(c_all, rows_ex, strips, dims), None


def _route_bwd(dims, _res, g):
    return _route_transpose(g, dims)


_route.defvjp(_route_fwd, _route_bwd)


# ------------------------------------------------ thin-slice extraction
# The fix-up operands read ~50 static rows/columns of x. Forward as a
# stack of slices is ~free (thin copies), but the AUTODIFF transpose of
# each slice is a full-tensor pad-and-add — ~50 passes over x's cotangent
# (measured: the entire poly backward gain vanished, fwd 1.67× but f+b
# only 1.18× at the production deconv1 site). The true VJP is one
# selection contraction: dx[n] = Σ_{s: idx[s]=n} g[s] — a single
# [S × n]-one-hot MXU matmul over a THIN tensor (~0.2 ms).
def _take_rows_impl(x: Array, idx: Tuple[int, ...]) -> Array:
    return jnp.stack([x[:, i] for i in idx], axis=1)  # [B, S, n_w, ci]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _take_rows(x: Array, idx: Tuple[int, ...]) -> Array:
    return _take_rows_impl(x, idx)


def _take_rows_fwd(x, idx):
    return _take_rows_impl(x, idx), x.shape


def _take_rows_bwd(idx, shape, g):
    p = np.zeros((len(idx), shape[1]), np.float32)
    p[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return (jnp.einsum("zswc,sn->znwc", g, jnp.asarray(p, g.dtype)),)


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def _take_cols_impl(x: Array, idx: Tuple[int, ...]) -> Array:
    return jnp.stack([x[:, :, i] for i in idx], axis=2)  # [B, n_h, S, ci]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _take_cols(x: Array, idx: Tuple[int, ...]) -> Array:
    return _take_cols_impl(x, idx)


def _take_cols_fwd(x, idx):
    return _take_cols_impl(x, idx), x.shape


def _take_cols_bwd(idx, shape, g):
    p = np.zeros((len(idx), shape[2]), np.float32)
    p[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return (jnp.einsum("zhsc,sn->zhnc", g, jnp.asarray(p, g.dtype)),)


_take_cols.defvjp(_take_cols_fwd, _take_cols_bwd)


# ----------------------------------------------------- the composed site
def poly_supported_any(n_hw: Tuple[int, int], target_hw: Tuple[int, int],
                       k: int) -> bool:
    """Both axes ~2× with odd k (any target parity — the general entry
    :func:`upsample_conv_poly` crops the phase buffer's pad)."""
    return (_axis_plan(n_hw[0], target_hw[0], k) is not None
            and _axis_plan(n_hw[1], target_hw[1], k) is not None)


def poly_supported(n_hw: Tuple[int, int], target_hw: Tuple[int, int],
                   k: int) -> bool:
    """Both axes ~2× (odd k) and an even target (s2d output)."""
    return (target_hw[0] % 2 == 0 and target_hw[1] % 2 == 0
            and poly_supported_any(n_hw, target_hw, k))


def _poly_buffer(x: Array, w: Array, b: Optional[Array],
                 target_hw: Tuple[int, int]) -> Array:
    """The polyphase site computed into the routed phase buffer
    [B, ⌈t_h/2⌉, ⌈t_w/2⌉, 4·co] (channel block (a·2+b) = output phase;
    odd-axis tail cells of off parities are zero pad)."""
    from stereospike_tpu.nn.layers import conv2d

    k, _, ci, co = w.shape
    n_h, n_w = int(x.shape[1]), int(x.shape[2])
    t_h, t_w = target_hw
    if not poly_supported_any((n_h, n_w), target_hw, k):
        raise ValueError(f"polyphase unsupported for {n_h}x{n_w} -> {target_hw}")
    kt = k // 2 + 1
    dt = x.dtype
    acc_dt = jnp.promote_types(dt, jnp.float32)

    # pattern kernel [kt, kt, ci, 4co]: block (p·2+q) = pairwise tap sums
    w_acc = w.astype(acc_dt)
    kern = jnp.zeros((kt, kt, ci, 4 * co), acc_dt)
    for p in range(2):
        for q in range(2):
            for dy in range(k):
                for dx in range(k):
                    kern = kern.at[(p + dy) // 2, (q + dx) // 2, :,
                                   (p * 2 + q) * co:(p * 2 + q + 1) * co
                                   ].add(w_acc[dy, dx])
    kern = kern.astype(dt)
    b4 = None if b is None else jnp.tile(b, 4)
    xp = jnp.pad(x, ((0, 0), (0, kt - 1), (0, kt - 1), (0, 0)))
    c_all = conv2d(xp, kern, b4, stride=1, padding=0)  # [B, n_h, n_w, 4co]

    # exact thin fix-ups (slip-straddling outputs), computed from x with the
    # ORIGINAL 5-tap kernel — bias folded in to match the routed core
    _, _, _, bad_h = _axis_plan(n_h, t_h, k)
    _, _, _, bad_w = _axis_plan(n_w, t_w, k)
    B = x.shape[0]
    J = (t_w + 1) // 2
    bias = 0 if b is None else b.astype(acc_dt)

    # fix-up operands are built from SLICES of x (one per bad position per
    # tap — ~50 thin copies per axis, wrapped in the custom-VJP extractors
    # above), never one-hot contractions over the full image: a selection
    # GEMM here costs as much as the pattern conv itself (measured: +20 ms
    # fwd+bwd at the production shape)
    src_h = _nearest_indices(n_h, t_h + k - 1)
    src_w = _nearest_indices(n_w, t_w + k - 1)
    if bad_h:
        idx_h = tuple(int(src_h[o + e]) for o in bad_h for e in range(k))
        xr = _take_rows(x, idx_h).reshape(  # [B, r, k, n_w, ci]
            B, len(bad_h), k, n_w, x.shape[-1])
        # contract (row tap, ci) with w first — MXU-shaped on a THIN tensor
        tmp = jnp.einsum("zrenc,edco->zrdno", xr.astype(acc_dt), w_acc)
        pw5 = np.zeros((k, t_w, n_w), np.float32)
        for dx in range(k):
            for o in range(t_w):
                pw5[dx, o, src_w[o + dx]] = 1.0
        rows_exact = jnp.einsum("dpn,zrdno->zrpo",
                                jnp.asarray(pw5, acc_dt), tmp) + bias
        # [B, r, t_w, co] -> [B, r, b, J, co] (b = output column parity;
        # odd t_w pads one zero column so the parity split is rectangular)
        if t_w % 2:
            rows_exact = jnp.pad(
                rows_exact, ((0, 0), (0, 0), (0, 1), (0, 0)))
        rows_ex = rows_exact.reshape(B, len(bad_h), J, 2, co) \
            .transpose(0, 1, 3, 2, 4).astype(dt)
    else:
        rows_ex = jnp.zeros((B, 1, 2, J, co), dt)

    if bad_w:
        idx_w = tuple(int(src_w[c + e]) for c in bad_w for e in range(k))
        xc = _take_cols(x, idx_w).reshape(  # [B, n_h, r, k, ci]
            B, n_h, len(bad_w), k, x.shape[-1])
    else:
        xc = jnp.zeros((B, n_h, 1, k, x.shape[-1]), dt)
    xc = jnp.pad(xc, ((0, 0), (0, kt - 1), (0, 0), (0, 0), (0, 0)))
    strips_l = []
    for p in range(2):
        acc = jnp.zeros((B, n_h, len(bad_w) or 1, co), acc_dt)
        for u in range(kt):
            taps = [w_acc[dy] for dy in range(k) if (p + dy) // 2 == u]
            if not taps:
                continue
            gk = taps[0] if len(taps) == 1 else taps[0] + taps[1]
            acc = acc + jnp.einsum("zmrec,eco->zmro",
                                   xc[:, u:u + n_h].astype(acc_dt), gk)
        strips_l.append(acc + bias)
    strips = jnp.stack(strips_l, axis=3).astype(dt)  # [B, n_h, r, p, co]

    dims = (n_h, t_h, n_w, t_w, k, co)
    return _route(c_all, rows_ex, strips, dims)


def upsample_conv_s2d_poly(x: Array, w: Array, b: Optional[Array] = None, *,
                           target_hw: Tuple[int, int]) -> Array:
    """``upsample_conv(..., target_hw)`` with the output in s2d layout,
    computed polyphase: one low-res 3×3 pattern conv (2.8× fewer MACs than
    the composite) + copy-speed DUS routing + exact thin slip fix-ups.

    Equal to ``upsample_conv_s2d_out`` up to float reassociation (the
    pattern kernels pre-sum pairs of taps of ``w``); pinned exactly at
    float64 by tests. Raises if the shape is unsupported — callers gate on
    :func:`poly_supported` (the even target makes the phase buffer exactly
    the s2d layout, no pad, no epilogue).
    """
    t_h, t_w = target_hw
    if t_h % 2 or t_w % 2:
        raise ValueError(f"s2d output needs an even target, got {target_hw}")
    return _poly_buffer(x, w, b, target_hw)


def upsample_conv_poly(x: Array, w: Array, b: Optional[Array] = None, *,
                       target_hw: Tuple[int, int]) -> Array:
    """``upsample_conv(..., target_hw)`` in plain NHWC layout, computed
    polyphase (the inner decoder sites deconv2/3/4, whose targets have odd
    axes): the routed phase buffer + a depth-to-space interleave + crop.

    The interleaved re-measurement (``benchmarks/poly_inner_site.json``,
    3 repeats, B=128 bf16) decided the per-site defaults: deconv3 WINS
    (isolated 1.245× fwd+bwd, whole step 1.0235×) and ships polyphase
    (``poly_deconv=(3,)``); deconv2/4's d2s epilogue + slip fix-ups cancel
    the 2.8× MAC saving (whole step all-inner 0.9645×) so they stay
    composite. Equal to ``upsample_conv`` up to float reassociation;
    float64-pinned by tests.
    """
    k, _, _, co = w.shape
    t_h, t_w = target_hw
    buf = _poly_buffer(x, w, b, target_hw)
    B, I, J, _ = buf.shape
    out = buf.reshape(B, I, J, 2, 2, co).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(B, 2 * I, 2 * J, co)
    return out[:, :t_h, :t_w]
