"""Low-level functional layers: conv, upsampling, resizing, init.

Layouts are TPU-native: activations NHWC (channels on the 128-lane minor
dimension), weights HWIO. The reference's torch modules (NCHW/OIHW) map onto
these by transposition only; semantics below are chosen to match torch
operators bit-for-tolerance so that capability parity is testable:

- ``conv2d``: torch ``nn.Conv2d`` with integer zero-padding
  (reference ``network/SNN_models.py:76`` etc.)
- ``nearest_upsample``: torch ``nn.UpsamplingNearest2d(size=...)``:
  ``src = floor(dst * in / out)`` (reference ``network/blocks.py:125``)
- ``bilinear_resize``: torch ``F.interpolate(mode='bilinear')`` with either
  align_corners convention (loss GT resize uses False, ``loss.py:38``;
  the ANN's BilinConvUpsampling uses True, ``blocks.py:30``)
- ``conv_init``: torch Conv2d default init — kaiming-uniform(a=√5), i.e.
  U(-1/√fan_in, 1/√fan_in) for both weight and bias.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> Array:
    """2-D convolution, activations NHWC, weights HWIO.

    Precision policy: fp32 inputs use HIGHEST (true fp32 math — XLA's default
    would silently round operands to bf16); bf16 inputs take the fast MXU
    path, whose hardware accumulator is fp32 regardless. The output dtype
    follows the inputs (no ``preferred_element_type``: a widened output would
    make the conv transpose pair an fp32 cotangent with bf16 weights and fail
    under ``grad``).
    """
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMNUMS,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def conv_init(
    key: Array,
    kernel_size: int,
    c_in: int,
    c_out: int,
    *,
    bias: bool = False,
    dtype=jnp.float32,
) -> dict:
    """Torch-default conv init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Returns ``{'w': [k,k,c_in,c_out]}`` (+ ``'b': [c_out]`` when bias).
    """
    fan_in = c_in * kernel_size * kernel_size
    bound = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    params = {
        "w": jax.random.uniform(
            kw, (kernel_size, kernel_size, c_in, c_out), dtype, -bound, bound
        )
    }
    if bias:
        params["b"] = jax.random.uniform(kb, (c_out,), dtype, -bound, bound)
    return params


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch UpsamplingNearest2d: src = floor(dst * in / out)
    return (np.arange(out_size) * in_size) // out_size


@functools.lru_cache(maxsize=None)
def _selection_matrix(in_size: int, out_size: int) -> np.ndarray:
    """0/1 matrix P with P[o, i] = 1 iff source(o) == i."""
    p = np.zeros((out_size, in_size), np.float32)
    p[np.arange(out_size), _nearest_indices(in_size, out_size)] = 1.0
    return p


def nearest_upsample(x: Array, size: Tuple[int, int]) -> Array:
    """Nearest-neighbour resize of NHWC ``x`` to spatial ``size`` (torch
    semantics: src = floor(dst·in/out)).

    Implemented as matmuls against constant 0/1 selection matrices. Measured
    on TPU this beats a gather (slow forward, and its transpose is a
    serialized scatter that made the backward ~30× the forward), a
    cumsum-based custom transpose (~3× slower still), AND a repeat+static-
    concat decomposition (15 vs 4.9 ms fwd at the deconv1 shape — XLA's
    concat lowering loses to the MXU eating selection FLOPs). W-axis first —
    it's the larger dimension, so contracting it at the lower resolution is
    cheaper. (A polyphase decomposition of the composite upsample-then-conv
    — 2.8× fewer MACs — was also measured and REJECTED: XLA's segment
    assembly overheads made it slower end-to-end; see
    benchmarks/deconv_attack.py and ROADMAP §2.)
    """
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    if w_in != w_out:
        pw = jnp.asarray(_selection_matrix(w_in, w_out), x.dtype)
        x = jnp.einsum("ow,bhwc->bhoc", pw, x)
    if h_in != h_out:
        ph = jnp.asarray(_selection_matrix(h_in, h_out), x.dtype)
        x = jnp.einsum("oh,bhwc->bowc", ph, x)
    return x


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def bilinear_resize(x: Array, size: Tuple[int, int], *, align_corners: bool = False) -> Array:
    """Bilinear resize of NHWC ``x`` to spatial ``size`` (torch F.interpolate)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    lo_h, hi_h, wh = _linear_weights(h_in, h_out, align_corners)
    lo_w, hi_w, ww = _linear_weights(w_in, w_out, align_corners)
    wh = jnp.asarray(wh, x.dtype)[None, :, None, None]
    ww = jnp.asarray(ww, x.dtype)[None, None, :, None]
    x = x[:, jnp.asarray(lo_h)] * (1 - wh) + x[:, jnp.asarray(hi_h)] * wh
    x = x[:, :, jnp.asarray(lo_w)] * (1 - ww) + x[:, :, jnp.asarray(hi_w)] * ww
    return x


@functools.lru_cache(maxsize=None)
def _shifted_selection(in_size: int, up_size: int, shift: int,
                       out_size: int) -> np.ndarray:
    """P[o, i] = 1 iff nearest-source(o + shift) == i on the up_size grid,
    for o in the VALID-conv output range [0, out_size)."""
    src = _nearest_indices(in_size, up_size)
    p = np.zeros((out_size, in_size), np.float32)
    p[np.arange(out_size), src[shift:shift + out_size]] = 1.0
    return p


def _upsample_conv_1out(x: Array, w: Array, b: Optional[Array],
                        target_hw: Tuple[int, int]) -> Array:
    """conv_k(nearest_upsample(x)) for C_out = 1, reassociated.

    The naive order materializes a [B, target+k-1, C] tensor (for the
    full-resolution prediction heads that is GBs of HBM traffic just to
    collapse to one channel). Because nearest upsampling is a selection
    matmul per axis, the composite factorizes exactly:

        out = Σ_{dy,dx} Ph^{dy} · (x ⋅ w[dy,dx,:]) · (Pw^{dx})ᵀ

    i.e. a 1×1 contraction to k² channels at LOW resolution, then shifted
    selection upsamples — ~5× fewer FLOPs and no giant intermediate.

    The shift sums are evaluated as TWO joint-contraction matmuls (stack
    the k shifted selections per axis and contract (shift, spatial)
    together) instead of k² single-channel matmul pairs: measured on a v5e
    the single-channel form ran at ~1 TFLOP/s (1 of 128 MXU lanes), the
    joint form is one dense [h_t × k·h_in] and one [w_t × k·w_in] GEMM.
    Bit-identical up to float reassociation.
    """
    k = w.shape[0]
    h_in, w_in = x.shape[1], x.shape[2]
    h_t, w_t = target_hw
    up_h, up_w = h_t + k - 1, w_t + k - 1
    z = jnp.einsum("bhwc,ijc->bhwij", x, w[..., 0])  # [B,h,w,dy,dx]
    ph = jnp.asarray(
        np.stack([_shifted_selection(h_in, up_h, dy, h_t) for dy in range(k)]),
        x.dtype)  # [k, h_t, h_in]
    pw = jnp.asarray(
        np.stack([_shifted_selection(w_in, up_w, dx, w_t) for dx in range(k)]),
        x.dtype)  # [k, w_t, w_in]
    a = jnp.einsum("ioh,bhwij->bowj", ph, z)   # Σ_{dy,h}: [B,h_t,w_in,dx]
    out = jnp.einsum("jpw,bowj->bop", pw, a)   # Σ_{dx,w}: [B,h_t,w_t]
    out = out[..., None]
    if b is not None:
        out = out + b
    return out


def space_to_depth(x: Array) -> Array:
    """[B, 2H, 2W, C] → [B, H, W, 4C]; channel block (p·2+q)·C+c holds the
    (row-parity p, col-parity q) phase. This is the CANONICAL layout of
    full-resolution tensors on the fast level-0 execution path: a 2×2
    pixel block rides the 128-lane channel dimension, so small-C full-res
    convs become lane-dense convs on the half-res grid and the decoder's
    phase-stacked upsample-conv needs no depth-to-space relayout at all
    (measured: the relayout cost made phase-stacking a net loss under BPTT
    — ROADMAP §2)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: Array) -> Array:
    """Inverse of :func:`space_to_depth`."""
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h2, w2, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * 2, w2 * 2, c)


def _expand_s2d_kernel(w: Array, stride: int) -> Array:
    """Recast a k5 conv kernel for s2d-layout input.

    stride=1 (pad 2 on the original grid): output stays s2d — a 3×3 conv
    [4ci → 4co] whose (p,q)→(a,b) channel blocks hold w's taps at the
    right parities (output phase (a,b) at s2d (i,j) reads original rows
    2i+a-2..2i+a+2 = s2d rows i-1..i+1).
    stride=2: only phase (0,0) outputs survive → 3×3 conv [4ci → co] on
    the s2d grid with stride 1 (the s2d grid IS the stride-2 grid).
    Structural zeros cost MXU FLOPs (9·16/4 vs 25·4 per original pixel for
    stride 1) but the lane-dense layout more than pays for them at small
    C (measured: bottom fwd+bwd 8.5 → 5.6 ms at B=128 bf16).
    """
    k, _, ci, co = w.shape
    assert k == 5, "s2d expansion is specialized to the k=5 encoder convs"
    out_phases = ((0, 0),) if stride == 2 else ((0, 0), (0, 1), (1, 0), (1, 1))
    e = jnp.zeros((3, 3, 4 * ci, len(out_phases) * co), w.dtype)
    for o_idx, (a, b) in enumerate(out_phases):
        for dy in range(k):
            for dx in range(k):
                m, n = a + dy - 2, b + dx - 2
                u, p = m // 2, m % 2
                v, q = n // 2, n % 2
                e = e.at[u + 1, v + 1,
                         (p * 2 + q) * ci:(p * 2 + q + 1) * ci,
                         o_idx * co:(o_idx + 1) * co].add(w[dy, dx])
    return e


def conv2d_s2d(x_s2d: Array, w: Array, b: Optional[Array] = None, *,
               stride: int = 1) -> Array:
    """k5/p2 conv with input (and, for stride 1, output) in s2d layout.

    Exactly ``s2d(conv2d(d2s(x), w, stride, padding=2))`` for stride 1 and
    ``conv2d(d2s(x), w, 2, padding=2)`` for stride 2, with no layout ops —
    the expansion happens in the (tiny) kernel instead of the activations.
    """
    out = conv2d(x_s2d, _expand_s2d_kernel(w, stride), stride=1, padding=1)
    if b is not None:
        reps = 4 if stride == 1 else 1
        out = out + jnp.tile(b, reps)
    return out


def upsample_conv_s2d_out(x: Array, w: Array, *,
                          target_hw: Tuple[int, int]) -> Array:
    """nearest-upsample → k5 VALID conv with the output in s2d layout:
    the 2×2-phase-stacked strided conv WITHOUT the depth-to-space epilogue
    (output channel block (a·2+b)·co+c = phase (a,b) — s2d's convention).
    Requires an even target. Measured fwd+bwd 42.4 ms vs 52.0 plain at the
    deconv1 shape (B=128 bf16), and no relayout for downstream consumers
    that live in s2d."""
    k = w.shape[0]
    assert target_hw[0] % 2 == 0 and target_hw[1] % 2 == 0
    up = nearest_upsample(x, (target_hw[0] + k - 1, target_hw[1] + k - 1))
    return _phase_conv_valid_stacked(up, w, 2, 2)


def _phase_conv_valid_stacked(up: Array, w: Array, py: int, px: int) -> Array:
    """The strided phase conv of :func:`_phase_conv_valid`, minus its
    depth-to-space: output [B, H/py, W/px, py·px·co], phase-major."""
    precision = (jax.lax.Precision.HIGHEST if up.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    wp = _phase_kernel(w, py, px).astype(up.dtype)
    return jax.lax.conv_general_dilated(
        up, wp, window_strides=(py, px), padding="VALID",
        dimension_numbers=_DIMNUMS, precision=precision)


@functools.lru_cache(maxsize=None)
def _shifted_selection_s2d(in_size: int, up_size: int, shift: int,
                           out_size: int) -> np.ndarray:
    """Shifted-selection table addressing an s2d-layout source axis:
    P[o, p, i2] = 1 iff nearest-source(o + shift) == 2·i2 + p."""
    src = _nearest_indices(in_size, up_size)[shift:shift + out_size]
    p = np.zeros((out_size, 2, in_size // 2), np.float32)
    p[np.arange(out_size), src % 2, src // 2] = 1.0
    return p


def _upsample_conv_1out_s2d(x_s2d: Array, w: Array, b: Optional[Array],
                            target_hw: Tuple[int, int]) -> Array:
    """:func:`_upsample_conv_1out` with the input in s2d layout (the
    prediction heads reading the s2d-canonical level 0). Identical math:
    the 1×1 contraction is pointwise in space (so it runs directly on the
    s2d tensor) and the shifted selections address (parity, half-index)
    pairs instead of rows — same contraction sizes, zero relayout."""
    k = w.shape[0]
    h2, w2 = x_s2d.shape[1], x_s2d.shape[2]
    h_in, w_in = 2 * h2, 2 * w2
    h_t, w_t = target_hw
    up_h, up_w = h_t + k - 1, w_t + k - 1
    c = w.shape[2]
    xp = x_s2d.reshape(x_s2d.shape[:3] + (2, 2, c))      # [B,h2,w2,p,q,c]
    z = jnp.einsum("bhwpqc,ijc->bhwpqij", xp, w[..., 0])
    ph = jnp.asarray(np.stack(
        [_shifted_selection_s2d(h_in, up_h, dy, h_t) for dy in range(k)]),
        x_s2d.dtype)                                     # [k, h_t, 2, h2]
    pw = jnp.asarray(np.stack(
        [_shifted_selection_s2d(w_in, up_w, dx, w_t) for dx in range(k)]),
        x_s2d.dtype)                                     # [k, w_t, 2, w2]
    a = jnp.einsum("ioph,bhwpqij->bowqj", ph, z)         # Σ_{dy,p,h2}
    out = jnp.einsum("jsqw,bowqj->bos", pw, a)           # Σ_{dx,q,w2}
    out = out[..., None]
    if b is not None:
        out = out + b
    return out


@functools.lru_cache(maxsize=None)
def _near_identity_segments(in_logical: int, up_logical: int):
    """Segment plan for assembling the s2d half-rows of
    ``nearest_upsample(x, up_logical)`` along one axis when the ratio is
    near 1 (the prediction heads: up = target + k − 1 ≈ target, so the
    nearest map is the identity with a handful of duplicated rows).

    Each up half-row holds logical rows ``(src[2i2], src[2i2+1])``; with a
    monotone src of step ∈ {0, 1} every half-row is one of: ``al`` (aligned
    copy of an x half-row), ``an`` (anti-aligned: phase-1 of half-row j ++
    phase-0 of half-row j+1), or ``d0``/``d1`` (both phases duplicate one
    source row of parity 0/1). Returns run-length-merged segments
    ``(cls, j0, length)`` — O(#duplications) slices, so the assembly is a
    plain concat XLA fuses — or None when the ratio is not near-identity
    (callers fall back to the selection form).
    """
    if up_logical % 2:
        return None
    src = _nearest_indices(in_logical, up_logical)
    half = []
    for i2 in range(up_logical // 2):
        r0, r1 = int(src[2 * i2]), int(src[2 * i2 + 1])
        if r1 == r0 + 1:
            half.append(("al" if r0 % 2 == 0 else "an", r0 // 2))
        elif r1 == r0:
            half.append((f"d{r0 % 2}", r0 // 2))
        else:
            return None
    segs = []
    for cls, j in half:
        if (segs and segs[-1][0] == cls and cls in ("al", "an")
                and j == segs[-1][1] + segs[-1][2]):
            segs[-1] = (cls, segs[-1][1], segs[-1][2] + 1)
        else:
            segs.append((cls, j, 1))
    return tuple(segs)


def _assemble_near_identity(x6: Array, segs, axis: int, paxis: int) -> Array:
    """Concat-of-slices assembly of one axis of the near-identity nearest
    upsample, on the [B, h2, w2, p, q, c] view (``axis`` spatial,
    ``paxis`` its phase axis). Pure slices/concats: the transpose under
    autodiff is slice-adds, no scatter."""
    parts = []
    for cls, j, length in segs:
        if cls == "al":
            sl = [slice(None)] * x6.ndim
            sl[axis] = slice(j, j + length)
            parts.append(x6[tuple(sl)])
        elif cls == "an":
            a = [slice(None)] * x6.ndim
            b = [slice(None)] * x6.ndim
            a[axis] = slice(j, j + length)
            a[paxis] = slice(1, 2)
            b[axis] = slice(j + 1, j + length + 1)
            b[paxis] = slice(0, 1)
            parts.append(jnp.concatenate([x6[tuple(a)], x6[tuple(b)]],
                                         axis=paxis))
        else:
            p = int(cls[1])
            sl = [slice(None)] * x6.ndim
            sl[axis] = slice(j, j + length)
            sl[paxis] = slice(p, p + 1)
            seg = x6[tuple(sl)]
            parts.append(jnp.concatenate([seg, seg], axis=paxis))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]


def _expand_head_kernel(w: Array) -> Array:
    """Recast the odd-k C_out=1 head kernel for the s2d-grid VALID conv:
    output s2d half-pixel i reads up half-rows i..i+k//2, so tap (m2, n2)
    of the (k//2+1)² s2d kernel maps input phase (p, q) to output phase
    (a, b) through w[2·m2+p−a, 2·n2+q−b] (zero outside the k×k support) —
    2×2 for the production k=3 prediction heads, 3×3 for k=5."""
    k, _, ci, co = w.shape
    ksz = k // 2 + 1
    z = jnp.zeros_like(w[0, 0])
    rows = []
    for m2 in range(ksz):
        cols = []
        for n2 in range(ksz):
            outs = []
            for a in range(2):
                for bq in range(2):
                    ins = []
                    for p in range(2):
                        for q in range(2):
                            dy, dx = 2 * m2 + p - a, 2 * n2 + q - bq
                            ins.append(w[dy, dx]
                                       if 0 <= dy < k and 0 <= dx < k else z)
                    outs.append(jnp.concatenate(ins, axis=0))   # [4ci, co]
            cols.append(jnp.concatenate(outs, axis=1))          # [4ci, 4co]
        rows.append(jnp.stack(cols))                            # [ksz,4ci,4co]
    return jnp.stack(rows)                                      # [ksz,ksz,...]


def pred_head_s2d_conv_supported(h2: int, w2: int,
                                 target_hw: Tuple[int, int], k: int) -> bool:
    """The conv-form head needs an odd kernel (phase parity bookkeeping of
    ``_expand_head_kernel``) and the near-identity plan on both axes."""
    return (k % 2 == 1
            and _near_identity_segments(2 * h2, target_hw[0] + k - 1)
            is not None
            and _near_identity_segments(2 * w2, target_hw[1] + k - 1)
            is not None)


def _upsample_conv_1out_s2d_conv(x_s2d: Array, w: Array, b: Optional[Array],
                                 target_hw: Tuple[int, int]) -> Array:
    """:func:`_upsample_conv_1out_s2d` as ONE MXU conv: the head's nearest
    upsample is near-identity (262/260 on the flagship's k=3 head), i.e. a
    concat of slices in s2d layout (``_near_identity_segments``), and the
    k×k VALID conv collapses to a (k//2+1)² s2d conv [4C → 4]
    (``_expand_head_kernel``) whose depth-to-space is the [B, target, 1]
    charge. Same math as the selection form up to reassociation
    (float64-pinned by tests); replaces the selection form's two
    joint-contraction GEMMs (~190 GFLOP of 0/1 arithmetic at the flagship
    pred1 site) with a ~12 GFLOP lane-dense conv."""
    k = w.shape[0]
    B, h2, w2, c4 = x_s2d.shape
    c = c4 // 4
    h_t, w_t = target_hw
    uh, uw = h_t + k - 1, w_t + k - 1
    rsegs = _near_identity_segments(2 * h2, uh)
    csegs = _near_identity_segments(2 * w2, uw)
    if rsegs is None or csegs is None:
        raise ValueError(
            f"no near-identity assembly plan for {2 * h2}x{2 * w2} -> "
            f"{uh}x{uw}; use _upsample_conv_1out_s2d "
            "(pred_head_s2d_conv_supported gates the model path)")
    x6 = x_s2d.reshape(B, h2, w2, 2, 2, c)
    up = _assemble_near_identity(x6, rsegs, 1, 3)
    up = _assemble_near_identity(up, csegs, 2, 4)
    up = up.reshape(B, uh // 2, uw // 2, 4 * c)
    e = _expand_head_kernel(w).astype(up.dtype)
    precision = (jax.lax.Precision.HIGHEST if up.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out = jax.lax.conv_general_dilated(
        up, e, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_DIMNUMS, precision=precision)
    out = depth_to_space(out)
    if b is not None:
        out = out + b
    return out


def _phase_kernel(w: Array, py: int, px: int) -> Array:
    """Stack a [k,k,ci,co] kernel into the py×px output-phase kernel
    [k+py-1, k+px-1, ci, py·px·co]: channel block (a·px+b) holds w shifted
    by (a, b), so a VALID conv with strides (py, px) computes output pixel
    (py·i+a, px·j+b) in channel block (a·px+b) at position (i, j)."""
    parts = []
    for a in range(py):
        for b in range(px):
            parts.append(jnp.pad(w, ((a, py - 1 - a), (b, px - 1 - b),
                                     (0, 0), (0, 0))))
    return jnp.concatenate(parts, axis=-1)


def _phase_conv_valid(up: Array, w: Array, py: int, px: int) -> Array:
    """VALID k×k stride-1 conv computed as a phase-stacked strided conv +
    depth-to-space — same math, py·px·co output channels on the MXU lanes."""
    precision = (jax.lax.Precision.HIGHEST if up.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    co = w.shape[3]
    wp = _phase_kernel(w, py, px).astype(up.dtype)
    out = jax.lax.conv_general_dilated(
        up, wp, window_strides=(py, px), padding="VALID",
        dimension_numbers=_DIMNUMS, precision=precision)
    n, h2, w2, _ = out.shape
    out = out.reshape(n, h2, w2, py, px, co)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * py, w2 * px, co)
    return out


def _upsample_conv_phased(x: Array, w: Array, target_hw: Tuple[int, int],
                          py: int, px: int) -> Array:
    """nearest-upsample → VALID conv with a phase-stacked conv.

    Small-C_out decoder convs at full resolution (deconv1: C_out=32) fill
    only C_out of the MXU's 128 lanes; phase-stacking computes the py×px
    even/odd output pixels as py·px·C_out channels of a strided conv with a
    (k+py-1)×(k+px-1) kernel, then depth-to-space. Measured on a v5e at
    batch 128 bf16 this cuts the deconv1 forward 35 → 17 ms and fwd+bwd
    53 → 43 ms. (A custom VJP replaying the plain form's backward was
    measured SLOWER than autodiff of this form — 52 ms — so plain autodiff
    it is.)
    """
    k = w.shape[0]
    up = nearest_upsample(x, (target_hw[0] + k - 1, target_hw[1] + k - 1))
    return _phase_conv_valid(up, w, py, px)


def _phase_factors(target_hw: Tuple[int, int], co: int) -> Tuple[int, int]:
    """Pick the (py, px) output-phase factors for an upsample-conv site:
    2 per even target axis, only while the stacked channels py·px·co still
    fit one 128-lane register (beyond that the plain conv is already
    MXU-efficient)."""
    py = 2 if target_hw[0] % 2 == 0 else 1
    px = 2 if target_hw[1] % 2 == 0 else 1
    while py * px * co > 128 and (py, px) != (1, 1):
        if px == 2:
            px = 1
        else:
            py = 1
    return py, px


def upsample_conv(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    target_hw: Tuple[int, int],
    mode: str = "nearest",
    phase: bool = False,
    poly: bool = False,
) -> Array:
    """NN-upsample-then-valid-conv anti-checkerboard upsampling.

    Reference ``NNConvUpsampling`` (``network/blocks.py:110-132``): resize to
    ``target + (k-1)`` then k×k VALID conv, landing exactly on ``target``.
    ``mode='bilinear'`` gives the ANN's ``BilinConvUpsampling``
    (align_corners=True, ``blocks.py:30``). Single-output-channel heads take
    the factorized path (:func:`_upsample_conv_1out`).

    ``poly=True`` takes the polyphase route (``nn/poly_route.py``: one
    low-res pattern conv at 2.8× fewer MACs + copy-speed routing) whenever
    the shape supports it (both axes ~2×) — math-identical up to float
    reassociation. Falls through silently otherwise, mirroring the
    ``s2d_level0`` auto-disable convention.

    ``phase=True`` lets small-C_out sites with even target dims take the
    phase-stacked form (:func:`_upsample_conv_phased`). Measured on a v5e
    (batch 128 bf16): 2× forward-only (35→17 ms for deconv1) and +11% on
    the whole no-grad eval step — but −7% on the full TRAIN step, where the
    depth-to-space relayout breaks XLA's conv↔elementwise fusion in the
    backward. Inference paths enable it; training leaves it off.
    """
    if mode == "nearest" and w.shape[-1] == 1:
        return _upsample_conv_1out(x, w, b, target_hw)
    if mode == "nearest" and poly:
        from stereospike_tpu.nn.poly_route import (
            poly_supported_any,
            upsample_conv_poly,
        )

        if poly_supported_any((x.shape[1], x.shape[2]), target_hw, w.shape[0]):
            return upsample_conv_poly(x, w, b, target_hw=target_hw)
    if mode == "nearest" and phase:
        py, px = _phase_factors(target_hw, w.shape[-1])
        if (py, px) != (1, 1):
            out = _upsample_conv_phased(x, w, target_hw, py, px)
            if b is not None:
                out = out + b
            return out
    k = w.shape[0]
    up_size = (target_hw[0] + k - 1, target_hw[1] + k - 1)
    if mode == "nearest":
        up = nearest_upsample(x, up_size)
    elif mode == "bilinear":
        up = bilinear_resize(x, up_size, align_corners=True)
    else:
        raise ValueError(f"unknown upsample mode '{mode}'")
    return conv2d(up, w, b, stride=1, padding=0)
