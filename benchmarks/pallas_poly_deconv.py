#!/usr/bin/env python
"""Round-4 attack on the last decoder frontier (VERDICT r3 #8): the
polyphase deconv1 with copy-speed routing, on the real chip.

Round 3 closed every XLA-level re-expression of deconv1 it tried (six
families, ``deconv_attack.json``): those routing forms lower to ~30
TFLOP/s movement while the composite conv eats its 2.8× redundant MACs at
85.7 TFLOP/s fwd+bwd. The remaining idea was routing at memory speed.
Two attempts this round:

  * a Pallas kernel of pure HBM→HBM DMAs — REJECTED BY MOSAIC: memref
    slices along the minor dim must be 128-lane aligned, and the pattern
    blocks are 32 wide (kernel dropped, not kept);
  * a zero-init + static dynamic-update-slice CHAIN in plain XLA — XLA
    performs the chained updates in place, so the forward routing costs
    ~2 ms (one HBM copy pass). Its naive autodiff wastes ~17 ms on
    zero-mask propagation; ``nn/poly_route.py`` gives the chain its true
    VJP (the reversed copy chain) and the waste disappears.

This script, at the production deconv1 site (B=128, bf16, 130×173×64 →
s2d 130×173×128):
  1. checks the polyphase path against the composite on-chip (f32,
     tolerance for tap pre-summation reassociation), forward and grads,
  2. times fwd and fwd+bwd for composite vs polyphase,
  3. writes ``benchmarks/pallas_poly_deconv.json`` with the verdict.
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
IN_HW, TARGET, CI, CO = (130, 173), (260, 346), 64, 32


def timeit(fn, *args):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    from stereospike_tpu.nn.layers import upsample_conv_s2d_out
    from stereospike_tpu.nn.poly_route import upsample_conv_s2d_poly

    key = jax.random.PRNGKey(0)
    report = {"batch": B, "site": "deconv1_s2d", "in_hw": IN_HW,
              "target": TARGET, "ci": CI, "co": CO,
              "device_kind": jax.devices()[0].device_kind}

    # ---- correctness on-chip, f32 at HIGHEST matmul precision (TPU's
    # default f32 conv rounds operands to bf16, which rounds the poly
    # form's pre-summed pattern taps differently — ~1e-3 of bf16 noise,
    # not an equivalence signal; exactness is float64-pinned in tests)
    xs = jax.random.normal(key, (2,) + IN_HW + (CI,), jnp.float32)
    ws = jax.random.normal(jax.random.PRNGKey(1), (5, 5, CI, CO),
                           jnp.float32) * 0.1
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(
            lambda x, w: upsample_conv_s2d_out(x, w, target_hw=TARGET))(xs, ws))
        got = np.asarray(jax.jit(
            lambda x, w: upsample_conv_s2d_poly(x, w, target_hw=TARGET))(xs, ws))
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    report["f32_rel_l2_vs_composite"] = rel
    print(f"on-chip f32 rel l2 vs composite: {rel:.3e}", flush=True)
    assert rel < 1e-5, "polyphase is wrong on-chip"

    # grad check on-chip (input + weight cotangents through the routed VJP)
    def loss_ref(x, w):
        return jnp.sum(jnp.square(upsample_conv_s2d_out(
            x, w, target_hw=TARGET)))

    def loss_poly(x, w):
        return jnp.sum(jnp.square(upsample_conv_s2d_poly(
            x, w, target_hw=TARGET)))

    with jax.default_matmul_precision("highest"):
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(xs, ws)
        g_pol = jax.jit(jax.grad(loss_poly, argnums=(0, 1)))(xs, ws)
    for name, a, r in zip("xw", g_pol, g_ref):
        g_rel = float(np.linalg.norm(np.asarray(a) - np.asarray(r))
                      / np.linalg.norm(np.asarray(r)))
        report[f"f32_grad_{name}_rel_l2"] = g_rel
        print(f"grad {name} rel l2: {g_rel:.3e}", flush=True)
        assert g_rel < 1e-4

    # ---- timing at the production configuration (bf16, B=128)
    x = jax.random.normal(key, (B,) + IN_HW + (CI,), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 5, CI, CO), jnp.bfloat16)

    for name, fn in (("composite", upsample_conv_s2d_out),
                     ("polyphase", upsample_conv_s2d_poly)):
        f = jax.jit(lambda x, w, fn=fn: jnp.sum(
            jnp.square(fn(x, w, target_hw=TARGET).astype(jnp.float32))))
        t_f = timeit(f, x, w)
        g = jax.jit(jax.grad(lambda x, w, fn=fn: jnp.sum(
            jnp.square(fn(x, w, target_hw=TARGET).astype(jnp.float32))),
            argnums=(0, 1)))
        t_fb = timeit(g, x, w)
        report[name] = {"fwd_ms": round(t_f * 1e3, 3),
                        "fwd_bwd_ms": round(t_fb * 1e3, 3)}
        print(name, report[name], flush=True)

    report["fwd_speedup"] = round(
        report["composite"]["fwd_ms"] / report["polyphase"]["fwd_ms"], 3)
    report["fwd_bwd_speedup"] = round(
        report["composite"]["fwd_bwd_ms"] / report["polyphase"]["fwd_bwd_ms"], 3)

    # ---- the INNER decoder sites (odd target axes → phase buffer + d2s
    # crop, nn/poly_route.upsample_conv_poly) vs the shipped composite
    from stereospike_tpu.nn.layers import upsample_conv
    from stereospike_tpu.nn.poly_route import upsample_conv_poly

    inner = {"deconv2": ((65, 87), (130, 173), 128, 64),
             "deconv3": ((33, 44), (65, 87), 256, 128),
             "deconv4": ((17, 22), (33, 44), 512, 256)}
    report["inner_sites"] = {}
    for site, (hw_in, tgt, ci, co) in inner.items():
        xi = jax.random.normal(key, (B,) + hw_in + (ci,), jnp.bfloat16)
        wi = jax.random.normal(jax.random.PRNGKey(2), (5, 5, ci, co),
                               jnp.bfloat16)
        row = {}
        for name, fn in (("composite", upsample_conv),
                         ("polyphase", upsample_conv_poly)):
            g = jax.jit(jax.grad(lambda x, w, fn=fn: jnp.sum(
                jnp.square(fn(x, w, target_hw=tgt).astype(jnp.float32))),
                argnums=(0, 1)))
            row[name + "_fwd_bwd_ms"] = round(timeit(g, xi, wi) * 1e3, 3)
        row["fwd_bwd_speedup"] = round(
            row["composite_fwd_bwd_ms"] / row["polyphase_fwd_bwd_ms"], 3)
        report["inner_sites"][site] = row
        print(site, row, flush=True)
    # ---- whole-step batch sweep: the polyphase DUS routing is batch-
    # sensitive (its copy chain amortizes per-copy overhead only at large
    # leading dims). Full production train step (fwd+bwd+adam, bf16),
    # poly forced on (poly_min_batch=0) vs off, at the configs that ship:
    # B=128 T=1 (headline), B=80 T=1 (matched-frames baseline), B=16 T=5
    # scan+remat, B=16 T=5 layer-major multistep (leading dim T·B=80).
    # These ratios set the model's poly_min_batch=128 routing gate
    # (models/stereospike.py).
    import dataclasses

    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    def step_fps(batch, T, poly, multistep=False, remat=False, iters=12):
        cfg = stereospike(poly_deconv1=poly, poly_min_batch=0)
        params = init_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(2e-4)
        state = create_train_state(params, tx, jax.random.PRNGKey(1))
        data = synthetic_batch(jax.random.PRNGKey(2), batch=batch,
                               in_hw=cfg.in_hw, T=T)
        step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                       compute_dtype=jnp.bfloat16,
                                       multistep=multistep, remat=remat),
                       donate_argnums=(0,))
        for _ in range(3):
            state, m = step(state, data)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, data)
        float(m["loss"])
        return batch * T * iters / (time.perf_counter() - t0)

    report["batch_sweep"] = {}
    for name, kw in (("B128_T1_leading128", dict(batch=128, T=1)),
                     ("B80_T1_leading80", dict(batch=80, T=1)),
                     ("B16_T5_scan_remat_leading16",
                      dict(batch=16, T=5, remat=True)),
                     ("B16_T5_multistep_leading80",
                      dict(batch=16, T=5, multistep=True))):
        on = step_fps(poly=True, **kw)
        off = step_fps(poly=False, **kw)
        row = {"poly_fps": round(on, 1), "composite_fps": round(off, 1),
               "poly_over_composite": round(on / off, 3)}
        report["batch_sweep"][name] = row
        print(name, row, flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pallas_poly_deconv.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
