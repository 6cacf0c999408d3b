#!/usr/bin/env python
"""Measured per-site timing on the real chip (not analytic estimates).

For every conv/deconv/head site of the flagship StereoSpike (plus the
neuron elementwise chain, the nearest-upsample selection matmuls, the
loss and the Adam update) this jits the site in isolation at the bench
batch size and bf16 compute, measures steady-state wall time for forward
and forward+backward, and reports achieved TFLOP/s per site against the
site's analytic MAC count. The committed JSON is the profile-driven
optimization worklist VERDICT r1 asked for: sites whose achieved TFLOP/s
sit far below the chip peak are the targets.

Timing rule for this backend (CLAUDE.md): sync by fetching a scalar, so
every measured fn returns a jnp.sum() of its output.

Writes ``benchmarks/per_site_timing.json``.
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
DTYPE = jnp.bfloat16


def timeit(fn, *args):
    # warmup + sync (value fetch = true device sync on this backend)
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    from stereospike_tpu.models import stereospike
    from stereospike_tpu.nn.layers import conv2d, nearest_upsample, upsample_conv
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.objectives.losses import total_loss
    from stereospike_tpu.snn.neurons import if_step
    from stereospike_tpu.snn.surrogate import make_spike_fn

    cfg = stereospike()
    sizes, c = cfg.sizes, cfg.channels
    key = jax.random.PRNGKey(0)
    spike_fn = make_spike_fn("atan", None)
    results = {}

    def record(name, macs, fwd_fn, make_args, *, grad_argnums=(0, 1),
               production=True):
        # the reduction must be NONLINEAR: with a plain sum the cotangent is
        # constant and XLA dead-code-eliminates the primal forward from the
        # grad program, so "fwd+bwd" would silently measure backward-only
        args = make_args()
        f = jax.jit(lambda *a: jnp.sum(jnp.square(fwd_fn(*a).astype(jnp.float32))))
        t_f = timeit(f, *args)
        g = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.square(fwd_fn(*a).astype(jnp.float32))),
            argnums=grad_argnums))
        t_fb = timeit(g, *args)
        results[name] = {
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_tflops": round(2 * macs / t_f / 1e12, 1),
            "fwd_bwd_ms": round(t_fb * 1e3, 3),
            "fwd_bwd_tflops": round(3 * 2 * macs / t_fb / 1e12, 1),
            # True = the form the shipped default config (s2d_level0=True)
            # actually executes; False = a superseded/alternative execution
            # form kept for comparison. Sum production rows to approximate
            # the production step (isolated-jit sums overestimate: XLA fuses
            # across sites in the whole-step program).
            "production": production,
        }
        print(name, results[name], flush=True)

    def rnd(shape):
        return jax.random.normal(key, shape, DTYPE)

    # encoder convs: conv(k5, pad 2), stride 1 for bottom else 2
    enc = [("bottom", sizes[0], cfg.in_channels, c[0], 1),
           ("conv1", sizes[0], c[0], c[1], 2),
           ("conv2", sizes[1], c[1], c[2], 2),
           ("conv3", sizes[2], c[2], c[3], 2),
           ("conv4", sizes[3], c[3], c[4], 2)]
    for name, hw, ci, co, s in enc:
        out_hw = sizes[0] if s == 1 else None
        oh = -(-hw[0] // s)
        ow = -(-hw[1] // s)
        macs = B * oh * ow * 25 * ci * co
        record(name, macs,
               lambda x, w, s=s: conv2d(x, w, stride=s, padding=2),
               lambda hw=hw, ci=ci, co=co: (rnd((B,) + hw + (ci,)),
                                            rnd((5, 5, ci, co))),
               # bottom/conv1 run in the s2d forms under the shipped default
               production=name not in ("bottom", "conv1"))

    # SEW conv (k3, pad 1) at bottleneck
    macs = B * sizes[4][0] * sizes[4][1] * 9 * c[4] * c[4]
    record("sew_conv", macs,
           lambda x, w: conv2d(x, w, stride=1, padding=1),
           lambda: (rnd((B,) + sizes[4] + (c[4],)), rnd((3, 3, c[4], c[4]))))

    # decoder upsample-convs: nearest to target+4 then valid k5
    for sc in (4, 3, 2, 1):
        hw_in, tgt = sizes[sc], sizes[sc - 1]
        ci, co = c[sc], c[sc - 1]
        up = (tgt[0] + 4, tgt[1] + 4)
        macs = B * up[0] * up[1] * 25 * ci * co
        record(f"deconv{sc}", macs,
               lambda x, w, tgt=tgt: upsample_conv(x, w, target_hw=tgt),
               lambda hw_in=hw_in, ci=ci, co=co: (rnd((B,) + hw_in + (ci,)),
                                                  rnd((5, 5, ci, co))),
               production=sc != 1)  # deconv1 ships as the s2d form

    # the s2d-canonical level-0 production forms (models/stereospike.py
    # default): expanded-kernel bottom/conv1 + relayout-free phase deconv1
    from stereospike_tpu.nn.layers import conv2d_s2d, upsample_conv_s2d_out

    s2 = (sizes[0][0] // 2, sizes[0][1] // 2)
    macs = B * sizes[0][0] * sizes[0][1] * 25 * cfg.in_channels * c[0]
    record("bottom_s2d", macs,
           lambda x, w: conv2d_s2d(x, w, stride=1),
           lambda: (rnd((B,) + s2 + (4 * cfg.in_channels,)),
                    rnd((5, 5, cfg.in_channels, c[0]))))
    macs = B * sizes[1][0] * sizes[1][1] * 25 * c[0] * c[1]
    record("conv1_s2d", macs,
           lambda x, w: conv2d_s2d(x, w, stride=2),
           lambda: (rnd((B,) + s2 + (4 * c[0],)), rnd((5, 5, c[0], c[1]))))
    up1f = (sizes[0][0] + 4, sizes[0][1] + 4)
    macs = B * up1f[0] * up1f[1] * 25 * c[1] * c[0]
    record("deconv1_s2d", macs,
           lambda x, w: upsample_conv_s2d_out(x, w, target_hw=sizes[0]),
           lambda: (rnd((B,) + sizes[1] + (c[1],)), rnd((5, 5, c[1], c[0]))),
           production=False)  # superseded by the polyphase default below

    # deconv1 as the shipped default executes it: polyphase into s2d layout
    # (poly_deconv1=True; MAC count is the composite's for comparability —
    # the poly form does ~2.8x fewer, so its "achieved TFLOP/s" overstates)
    from stereospike_tpu.nn.poly_route import upsample_conv_s2d_poly

    record("deconv1_poly", macs,
           lambda x, w: upsample_conv_s2d_poly(x, w, target_hw=sizes[0]),
           lambda: (rnd((B,) + sizes[1] + (c[1],)), rnd((5, 5, c[1], c[0]))))

    # the bare selection-matmul upsample for the largest decoder level
    up1 = (sizes[0][0] + 4, sizes[0][1] + 4)
    macs = B * c[0] * (up1[0] * sizes[1][0] * sizes[1][1]
                       + up1[1] * sizes[1][1] * up1[0])
    record("nn_upsample_L1", macs,
           lambda x: nearest_upsample(x, up1),
           lambda: (rnd((B,) + sizes[1] + (c[0],)),), grad_argnums=(0,))

    # prediction heads (factorized C_out=1 path)
    for sc in (1, 4):
        hw_in, ci = sizes[sc - 1], c[sc - 1]
        macs = B * hw_in[0] * hw_in[1] * 9 * ci  # low-res contraction part
        record(f"pred{sc}", macs,
               lambda x, w: upsample_conv(x, w, target_hw=sizes[0]),
               lambda hw_in=hw_in, ci=ci: (rnd((B,) + hw_in + (ci,)),
                                           rnd((3, 3, ci, 1))),
               production=sc != 1)  # pred1 ships as the s2d-input form

    # pred1 as the shipped default executes it: s2d-layout input
    from stereospike_tpu.nn.layers import _upsample_conv_1out_s2d

    macs = B * sizes[0][0] * sizes[0][1] * 9 * c[0]
    record("pred1_s2d", macs,
           lambda x, w: _upsample_conv_1out_s2d(x, w, None, sizes[0]),
           lambda: (rnd((B,) + s2 + (4 * c[0],)), rnd((3, 3, c[0], 1))))

    # neuron elementwise chain at the two largest sites (HBM-bound)
    for name, hw, ch in (("if_fire_L0", sizes[0], c[0]),
                         ("if_fire_L1", sizes[1], c[1])):
        def fire(x, v):
            v2, s = if_step(v, x, v_threshold=1.0, v_reset=0.0,
                            spike_fn=spike_fn, detach_reset=True)
            return s + v2
        record(name, 0,
               fire, lambda hw=hw, ch=ch: (rnd((B,) + hw + (ch,)),
                                           rnd((B,) + hw + (ch,))))
        results[name].pop("fwd_tflops"), results[name].pop("fwd_bwd_tflops")

    # loss on 4 full-res depths
    lcfg = TotalLossConfig()
    def loss_fn(d, gt, mask, spk):
        return total_loss([d] * 4, gt, mask, [spk] * 5, lcfg)
    d = jax.random.normal(key, (B,) + sizes[0] + (1,), jnp.float32)
    gt = d + 0.1
    mask = jnp.ones_like(d, bool)
    spk = rnd((B,) + sizes[1] + (c[1],)).astype(jnp.float32)
    f = jax.jit(loss_fn)
    t = timeit(f, d, gt, mask, spk)
    g = jax.jit(jax.grad(loss_fn, argnums=(0,)))
    results["total_loss"] = {"fwd_ms": round(t * 1e3, 3),
                             "fwd_bwd_ms": round(timeit(g, d, gt, mask, spk) * 1e3, 3)}
    print("total_loss", results["total_loss"], flush=True)

    # Adam update on the full param pytree
    import optax
    from stereospike_tpu.models import init_params
    from stereospike_tpu.train import create_train_state, make_optimizer
    params = init_params(key, cfg)
    tx = make_optimizer(2e-4)
    st = create_train_state(params, tx, key)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def adam(st, grads):
        upd, opt = tx.update(grads, st.opt_state, st.params)
        p = optax.apply_updates(st.params, upd)
        return jax.tree.leaves(p)[0]

    results["adam_update"] = {"fwd_ms": round(timeit(adam, st, grads) * 1e3, 3)}
    print("adam_update", results["adam_update"], flush=True)

    prod_sum = sum(v["fwd_bwd_ms"] for v in results.values()
                   if v.get("production") and "fwd_bwd_ms" in v)
    report = {"batch": B, "dtype": "bfloat16", "iters": ITERS,
              "device_kind": jax.devices()[0].device_kind,
              "backend": jax.default_backend(),
              # sum of production=True conv-site fwd+bwd rows: an UPPER
              # bound on the production step's conv time (isolated jits
              # forgo cross-site fusion; fire/loss/adam rows extra)
              "production_conv_fwd_bwd_ms_sum": round(prod_sum, 1),
              "sites": results}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "per_site_timing.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "sites"}))


if __name__ == "__main__":
    main()
