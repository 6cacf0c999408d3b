#!/usr/bin/env python
"""conv1 attack + backward decomposition (VERDICT r4 #8, second target).

``per_site_timing.json``: the first strided encoder conv runs fwd+bwd at
83.9 useful-TFLOP/s in the production s2d form (``conv2d_s2d(stride=2)``)
and 88.2 in the plain k5/s2 form — the slowest efficient-GEMM sites after
the closed decoder frontier. The s2d form's expanded 3×3 [4ci→co] kernel
carries structural zeros: 36 executed tap-positions for 25 useful ones
(1.44×), so its EXECUTED rate is ~121 TFLOP/s — the overhead is zeros,
not scheduling.

This probe (a) separates the three legs (forward, dL/dx, dL/dw) for the
plain and s2d forms, and (b) measures the one untried zero-free
decomposition: parity-grouped sub-convs (``conv1_s2d_poly4`` below — the
stride-2 k5 conv splits exactly into four phase convs of kernel
3×3/3×2/2×3/2×2 over the four s2d input-phase blocks, 25 executed taps
total, verified exact vs conv2d_s2d here before timing). If the zero-free
form does not beat conv2d_s2d fwd+bwd, the conv1 frontier is closed: the
44% structural-zero overhead is cheaper than splitting the contraction
into four thin (ci=32) convs.

Writes ``benchmarks/conv1_bwd_probe.json``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

B = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def timeit(fn, *args, iters=ITERS):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def conv1_s2d_poly4(x_s2d, w):
    """Zero-free stride-2 k5 conv on s2d input: four parity sub-convs.

    Output phase (0,0) at s2d cell (i,j) reads original rows 2i-2..2i+2 =
    even rows {i-1,i,i+1} of phase p=0 (3 taps w[0],w[2],w[4]) and odd
    rows {i-1,i} of phase p=1 (2 taps w[1],w[3]); same per column parity.
    Exactly conv2d_s2d(x, w, stride=2) with 25 executed taps instead of
    the expanded kernel's 36.
    """
    from stereospike_tpu.nn.layers import conv2d

    ci, co = w.shape[2], w.shape[3]
    acc = None
    for p in (0, 1):
        for q in (0, 1):
            xs = x_s2d[..., (p * 2 + q) * ci:(p * 2 + q + 1) * ci]
            dys = [0, 2, 4] if p == 0 else [1, 3]
            dxs = [0, 2, 4] if q == 0 else [1, 3]
            sub = w[jnp.asarray(dys)][:, jnp.asarray(dxs)]
            pad_y = (1, 1) if p == 0 else (1, 0)
            pad_x = (1, 1) if q == 0 else (1, 0)
            precision = (jax.lax.Precision.HIGHEST
                         if xs.dtype == jnp.float32
                         else jax.lax.Precision.DEFAULT)
            out = jax.lax.conv_general_dilated(
                xs, sub, window_strides=(1, 1), padding=[pad_y, pad_x],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision)
            acc = out if acc is None else acc + out
    return acc


def main():
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 128))))
    print(f"probe ok in {time.perf_counter() - t0:.1f}s", flush=True)

    from stereospike_tpu.nn.layers import conv2d, conv2d_s2d, space_to_depth

    med = lambda v: sorted(v)[len(v) // 2]
    key = jax.random.PRNGKey(0)
    report = {"batch": B, "iters": ITERS, "repeats": REPEATS,
              "device_kind": jax.devices()[0].device_kind}

    # exactness: poly4 == conv2d_s2d == plain conv, float32, small shape
    xs_small = jax.random.normal(key, (2, 16, 20, 32), jnp.float32)
    wf = jax.random.normal(jax.random.PRNGKey(1), (5, 5, 32, 64),
                           jnp.float32)
    ref = conv2d(xs_small, wf, None, stride=2, padding=2)
    s2d_in = space_to_depth(xs_small)
    got_s2d = conv2d_s2d(s2d_in, wf, stride=2)
    got_poly = conv1_s2d_poly4(s2d_in, wf)
    np.testing.assert_allclose(np.asarray(got_s2d), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_poly), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    report["poly4_exact_vs_plain"] = True
    print("exactness ok", flush=True)

    # production conv1 site shapes (260x346 flagship, B=128 bf16)
    ci, co = 32, 64
    x_plain = jax.random.normal(key, (B, 260, 346, ci), jnp.bfloat16)
    x_s2d = jax.random.normal(key, (B, 130, 173, 4 * ci), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 5, ci, co),
                          jnp.bfloat16) * 0.1
    useful = 2 * B * 130 * 173 * 25 * ci * co

    forms = {
        "conv1_plain": (lambda x, w: conv2d(x, w, None, stride=2,
                                            padding=2), x_plain),
        "conv1_s2d": (lambda x, w: conv2d_s2d(x, w, stride=2), x_s2d),
        "conv1_s2d_poly4": (conv1_s2d_poly4, x_s2d),
    }
    for name, (f, x) in forms.items():
        loss = lambda x, w, f=f: jnp.sum(
            jnp.square(f(x, w).astype(jnp.float32)))
        legs = {
            "fwd": (jax.jit(loss), 1),
            "dx": (jax.jit(jax.grad(loss, argnums=0)), 2),
            "dw": (jax.jit(jax.grad(loss, argnums=1)), 2),
            "dx_dw": (jax.jit(jax.grad(loss, argnums=(0, 1))), 3),
        }
        res = {}
        for leg, (fn, passes) in legs.items():
            ms = [round(timeit(fn, x, w) * 1e3, 3) for _ in range(REPEATS)]
            res[leg] = {"ms": ms, "useful_tflops": round(
                passes * useful / (med(ms) / 1e3) / 1e12, 1)}
        report[name] = res
        print(name, json.dumps(res), flush=True)

    report["poly4_over_s2d_fwd_bwd"] = round(
        med(report["conv1_s2d"]["dx_dw"]["ms"])
        / med(report["conv1_s2d_poly4"]["dx_dw"]["ms"]), 3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "conv1_bwd_probe.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
