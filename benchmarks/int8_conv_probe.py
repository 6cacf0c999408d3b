#!/usr/bin/env python
"""Probe: does this TPU toolchain lower s8×s8→s32 GEMMs/convs to the
int8 MXU path, and is it faster than bf16 at StereoSpike's shapes?

Motivation (ROADMAP "int8 serving"): spiking activations are exactly
{0, 1} and the input count frames are small integers, so an int8 serving
path would quantize ONLY the weights (per-channel PTQ) while activations
stay exact — the v5e datasheet int8 MXU peak is 2× bf16. Whether XLA on
this axon toolchain actually emits the int8 systolic path (vs upcasting
to bf16/f32) is unverifiable from docs; this measures it.

Cases:
  * square GEMMs at MXU-saturating sizes — the cleanest int8-path signal;
  * the flagship model's conv sites (inference shapes, NHWC/HWIO, the
    same dimension numbers as ``nn/layers.py::conv2d``) with binary
    spike inputs.

Timing per CLAUDE.md: sync by fetching a scalar value.

Writes ``benchmarks/int8_conv_probe.json``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

B = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def timeit(fn, *args):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def _conv(x, w, stride, padding, out_dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn, preferred_element_type=out_dtype)


def main():
    key = jax.random.PRNGKey(0)
    results = {"batch": B, "iters": ITERS,
               "device": str(jax.devices()[0].device_kind)}

    # --- GEMM signal: s8 vs bf16 at square MXU-saturating sizes ---------
    for n in (4096, 8192):
        k1, k2 = jax.random.split(jax.random.fold_in(key, n))
        a8 = jax.random.randint(k1, (n, n), -127, 128, jnp.int8)
        b8 = jax.random.randint(k2, (n, n), -127, 128, jnp.int8)
        abf = a8.astype(jnp.bfloat16)
        bbf = b8.astype(jnp.bfloat16)
        f_bf = jax.jit(lambda a, b: jnp.sum(
            jax.lax.dot(a, b, preferred_element_type=jnp.float32)))
        f_s8 = jax.jit(lambda a, b: jnp.sum(
            jax.lax.dot(a, b, preferred_element_type=jnp.int32)))
        entry = {}
        t_bf = timeit(f_bf, abf, bbf)
        entry["bf16_ms"] = round(t_bf * 1e3, 3)
        entry["bf16_tflops"] = round(2 * n**3 / t_bf / 1e12, 1)
        try:
            t_s8 = timeit(f_s8, a8, b8)
            entry["int8_ms"] = round(t_s8 * 1e3, 3)
            entry["int8_tops"] = round(2 * n**3 / t_s8 / 1e12, 1)
            entry["int8_speedup"] = round(t_bf / t_s8, 3)
        except Exception as e:  # unsupported lowering is a result too
            entry["int8_error"] = repr(e)[:300]
        results[f"gemm_{n}"] = entry
        print(f"gemm_{n}", entry, flush=True)

    # --- model conv sites (inference fwd, spike {0,1} inputs) ----------
    from stereospike_tpu.models import stereospike

    cfg = stereospike()
    sizes, c = cfg.sizes, cfg.channels  # sizes[0]=(260,346) ... sizes[5]
    sites = [
        # (name, in_hw, cin, cout, k, stride)
        ("bottom", sizes[0], 4, c[0], 5, 1),
        ("conv1", sizes[0], c[0], c[1], 5, 2),
        ("conv2", sizes[1], c[1], c[2], 5, 2),
        ("conv3", sizes[2], c[2], c[3], 5, 2),
        ("conv4", sizes[3], c[3], c[4], 5, 2),
        ("bottleneck", sizes[4], c[4], c[4], 3, 1),
    ]
    for name, (h, w), cin, cout, k, stride in sites:
        kk = jax.random.fold_in(key, hash(name) % 2**31)
        k1, k2 = jax.random.split(kk)
        spikes8 = jax.random.bernoulli(k1, 0.2, (B, h, w, cin)).astype(jnp.int8)
        w8 = jax.random.randint(k2, (k, k, cin, cout), -127, 128, jnp.int8)
        spikes_bf = spikes8.astype(jnp.bfloat16)
        w_bf = w8.astype(jnp.bfloat16)
        pad = k // 2
        f_bf = jax.jit(lambda x, w_: jnp.sum(
            _conv(x, w_, stride, pad, jnp.float32)))
        f_s8 = jax.jit(lambda x, w_: jnp.sum(
            _conv(x, w_, stride, pad, jnp.int32)))
        macs = (B * ((h + 2 * pad - k) // stride + 1)
                * ((w + 2 * pad - k) // stride + 1) * k * k * cin * cout)
        entry = {"macs_g": round(macs / 1e9, 2)}
        t_bf = timeit(f_bf, spikes_bf, w_bf)
        entry["bf16_ms"] = round(t_bf * 1e3, 3)
        entry["bf16_tflops"] = round(2 * macs / t_bf / 1e12, 1)
        try:
            t_s8 = timeit(f_s8, spikes8, w8)
            entry["int8_ms"] = round(t_s8 * 1e3, 3)
            entry["int8_tops"] = round(2 * macs / t_s8 / 1e12, 1)
            entry["int8_speedup"] = round(t_bf / t_s8, 3)
        except Exception as e:
            entry["int8_error"] = repr(e)[:300]
        results[name] = entry
        print(name, entry, flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "int8_conv_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
