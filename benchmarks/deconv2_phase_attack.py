#!/usr/bin/env python
"""deconv2 epilogue-free polyphase attack (VERDICT r4 #8).

deconv2 is the biggest single production site (34.7 ms fwd+bwd at
107.5 TFLOP/s, ``benchmarks/per_site_timing.json``). Its polyphase form
LOSES whole-step (``poly_inner_site.json``: the depth-to-space epilogue +
slip fix-ups eat the 2.8× MAC win at the odd target 130×173). The one
untried lever: keep the OUTPUT in the phase buffer ([B, 65, 87, 4·64] —
an s2d-canonical level 1, analogous to the shipped s2d level 0), so the
epilogue never runs. This script measures whether that world would pay
before committing to the (large) refactor it implies: conv1 emitting
s2d-L1 natively, IF/skip-add/pred2 head/deconv1-input all phase-resident,
plus odd-W pad-column masking.

Measurements (B=128 bf16, interleaved repeats):
  1. isolated deconv2 forms — composite (``upsample_conv``), polyphase
     with d2s epilogue (``upsample_conv_poly``), phases-only
     (``_poly_buffer`` — no epilogue);
  2. the consumer chain each form feeds — deconv2 → IF fire → +skip →
     reduce — with the skip ALREADY in the matching layout (the ideal
     s2d-L1 world: no relayout charged to either side).

Decision rule: if the phases-only CHAIN gain is under ~1.10×, the
refactor cannot pay (it moves, not removes, layout work at the L1
boundary) and the deconv2 frontier is closed with the composite.

Writes ``benchmarks/deconv2_phase_attack.json``.
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


def main():
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 128))))
    print(f"probe ok in {time.perf_counter() - t0:.1f}s", flush=True)

    from stereospike_tpu.nn.layers import upsample_conv
    from stereospike_tpu.nn.poly_route import _poly_buffer, upsample_conv_poly
    from stereospike_tpu.snn.neurons import if_step

    # deconv2: L2 (65,87,128) -> L1 target (130,173), k5, co=64
    n_h, n_w, ci, co, k = 65, 87, 128, 64, 5
    tgt = (130, 173)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, n_h, n_w, ci), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, ci, co),
                          jnp.bfloat16) * 0.1
    bias = jnp.zeros((co,), jnp.bfloat16)
    # matching-layout skips (ideal world: produced natively, free)
    skip_std = jax.random.normal(jax.random.PRNGKey(2),
                                 (B, tgt[0], tgt[1], co), jnp.bfloat16)
    J = (tgt[1] + 1) // 2
    skip_ph = jax.random.normal(jax.random.PRNGKey(2),
                                (B, (tgt[0] + 1) // 2, J, 4 * co),
                                jnp.bfloat16)

    forms = {
        "composite": lambda x, w: upsample_conv(x, w, bias, target_hw=tgt),
        "poly_d2s": lambda x, w: upsample_conv_poly(x, w, bias,
                                                    target_hw=tgt),
        "poly_phases_only": lambda x, w: _poly_buffer(x, w, bias, tgt),
    }

    def chain(form):
        # skip travels as an ARGUMENT: a closed-over array would be baked
        # into the HLO as a 368 MB constant (this environment's remote
        # compile helper rejects the request body)
        def f(x, w, skip):
            out = form(x, w)
            _, s = if_step(jnp.zeros_like(out), out)
            return s + skip
        return f

    med = lambda v: sorted(v)[len(v) // 2]
    report = {"batch": B, "iters": ITERS, "repeats": REPEATS,
              "device_kind": jax.devices()[0].device_kind,
              "site": "deconv2 65x87x128 -> (130,173) k5 co64"}

    jits = {}
    args = {}
    for name, form in forms.items():
        sk = skip_ph if name == "poly_phases_only" else skip_std
        site = lambda x, w, skip, form=form: form(x, w)
        for tag, f in (("site", site), ("chain", chain(form))):
            jits[f"{name}/{tag}"] = {
                "fwd": jax.jit(lambda x, w, skip, f=f: jnp.sum(
                    jnp.square(f(x, w, skip).astype(jnp.float32)))),
                "fwd_bwd": jax.jit(jax.grad(
                    lambda x, w, skip, f=f: jnp.sum(
                        jnp.square(f(x, w, skip).astype(jnp.float32))),
                    argnums=(0, 1))),
            }
            args[f"{name}/{tag}"] = sk

    res = {n: {"fwd_ms": [], "fwd_bwd_ms": []} for n in jits}
    for _ in range(REPEATS):
        for n, fns in jits.items():
            res[n]["fwd_ms"].append(
                round(timeit(fns["fwd"], x, w, args[n]) * 1e3, 3))
            res[n]["fwd_bwd_ms"].append(
                round(timeit(fns["fwd_bwd"], x, w, args[n]) * 1e3, 3))
    report["timings"] = res
    for tag in ("site", "chain"):
        base = med(res[f"composite/{tag}"]["fwd_bwd_ms"])
        report[f"{tag}_speedup_fwd_bwd"] = {
            n.split("/")[0]: round(base / med(res[f"{n.split('/')[0]}/{tag}"]
                                              ["fwd_bwd_ms"]), 3)
            for n in res if n.endswith(tag)}
    print(json.dumps({k: v for k, v in report.items() if k != "timings"},
                     indent=2), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "deconv2_phase_attack.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
