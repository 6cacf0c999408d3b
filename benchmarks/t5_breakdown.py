#!/usr/bin/env python
"""Where the T=5 multistep train step loses vs T=1 at matched frames-in-flight.

VERDICT r2 asked for a committed breakdown of the T>1 per-frame gap. The
honest baseline is T=1 at the SAME frames-in-flight (B=80 vs B=16·T=5):
batch-scaling effects (the chip's throughput falls off away from the B=128
sweet spot) are not a property of the temporal path. Against that baseline
this script decomposes the residual gap into:

  * forward vs backward+update (full train step minus no-grad forward,
    both measured on the composed model), and
  * the neuron-recurrence serialization floor: at every one of the 14
    neuron sites the T-step charge→fire→reset chain is T *dependent*
    elementwise passes over [B, h, w, c] slabs instead of one fused pass
    over [T·B, h, w, c] — measured directly per shape (fwd and fwd+bwd)
    as `fire_seq_T - fire_flat`, scaled by site multiplicity.

Timing rule for this backend (CLAUDE.md): sync by fetching a value.
Writes ``benchmarks/t5_breakdown.json``.
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

B_T = int(os.environ.get("BENCH_BATCH_T", "16"))
T = int(os.environ.get("BENCH_T", "5"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=ITERS):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def step_ms(batch, t, multistep):
    """Full train step (fwd+bwd+adam) wall ms at bf16, donated state."""
    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (create_train_state, make_optimizer,
                                       make_train_step)
    cfg = stereospike()
    state = create_train_state(init_params(jax.random.PRNGKey(0), cfg),
                               make_optimizer(2e-4), jax.random.PRNGKey(1))
    data = synthetic_batch(jax.random.PRNGKey(2), batch=batch,
                           in_hw=cfg.in_hw, T=t)
    step = jax.jit(make_train_step(cfg, TotalLossConfig(),
                                   make_optimizer(2e-4),
                                   compute_dtype=DTYPE, multistep=multistep),
                   donate_argnums=(0,))
    for _ in range(3):
        state, m = step(state, data)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, data)
    float(m["loss"])
    return (time.perf_counter() - t0) / ITERS * 1e3


def fwd_ms(batch, t, multistep):
    """No-grad composed forward (training execution profile, not the
    phase-stacked inference decoder, so it is diffable against step_ms)."""
    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import (forward_multistep, forward_sequence,
                                        init_params, stereospike)
    cfg = stereospike()
    params = init_params(jax.random.PRNGKey(0), cfg)
    data = synthetic_batch(jax.random.PRNGKey(2), batch=batch,
                           in_hw=cfg.in_hw, T=t)
    chunks = data["chunks"].astype(DTYPE)
    cast = jax.tree.map(lambda x: x.astype(DTYPE)
                        if x.dtype == jnp.float32 else x, params)

    # consume EVERY head's depth (the loss does): reducing only depths[-1]
    # (= depth4, the FIRST head in the integrator chain) lets XLA dead-code
    # the three shallower decoder levels at T=1 and skews the comparison
    fwd = forward_multistep if multistep else forward_sequence

    def f(p, x):
        depths, _, _ = fwd(p, x, cfg)
        return sum(jnp.sum(jnp.square(d.astype(jnp.float32)))
                   for d in depths)
    return timeit(jax.jit(f), cast, chunks)


def fire_gap(shape, key):
    """Per-site recurrence cost: T dependent slab passes vs one flat pass.

    Returns (seq_fwd, flat_fwd, seq_fwd_bwd, flat_fwd_bwd) ms at this
    activation shape ([T·B] leading)."""
    from stereospike_tpu.snn.neurons import if_step
    from stereospike_tpu.snn.surrogate import make_spike_fn
    spike_fn = make_spike_fn("atan", None)
    kw = dict(v_threshold=1.0, v_reset=0.0, spike_fn=spike_fn,
              detach_reset=True)
    x = jax.random.normal(key, (T * B_T,) + shape, DTYPE)
    v0 = jnp.zeros((B_T,) + shape, DTYPE)
    v0f = jnp.zeros((T * B_T,) + shape, DTYPE)

    def seq(x, v):
        outs = []
        for t in range(T):
            x_t = jax.lax.slice_in_dim(x, t * B_T, (t + 1) * B_T, axis=0)
            v, s = if_step(v, x_t, **kw)
            outs.append(s)
        return jnp.sum(jnp.square(
            jnp.concatenate(outs, axis=0).astype(jnp.float32)))

    def flat(x, v):
        _, s = if_step(v, x, **kw)
        return jnp.sum(jnp.square(s.astype(jnp.float32)))

    # the fire chains run 1-10 ms: 100 iters keeps the tunnel's fetch
    # jitter out of the per-site numbers (the composed steps at ~150 ms
    # amortize it at the default 20)
    it = ITERS * 5
    return (timeit(jax.jit(seq), x, v0, iters=it),
            timeit(jax.jit(flat), x, v0f, iters=it),
            timeit(jax.jit(jax.grad(seq)), x, v0, iters=it),
            timeit(jax.jit(jax.grad(flat)), x, v0f, iters=it))


def main():
    from stereospike_tpu.models import stereospike
    cfg = stereospike()
    sizes, c = cfg.sizes, cfg.channels
    key = jax.random.PRNGKey(0)
    report = {"batch_T": B_T, "T": T, "iters": ITERS, "dtype": "bfloat16",
              "device_kind": jax.devices()[0].device_kind}

    report["t1_matched_step_ms"] = round(step_ms(B_T * T, 1, False), 2)
    print("t1 matched step:", report["t1_matched_step_ms"], flush=True)
    report["t5_multistep_step_ms"] = round(step_ms(B_T, T, True), 2)
    print("t5 multistep step:", report["t5_multistep_step_ms"], flush=True)
    report["t1_matched_fwd_ms"] = round(fwd_ms(B_T * T, 1, False), 2)
    report["t5_multistep_fwd_ms"] = round(fwd_ms(B_T, T, True), 2)
    print("fwd:", report["t1_matched_fwd_ms"],
          report["t5_multistep_fwd_ms"], flush=True)

    # neuron-site shapes in the multistep/s2d execution profile, with
    # multiplicity (encoder fire + the decoder SEW/up sites at the same
    # shape; level 0 lives at H/2×W/2×4c thanks to s2d_level0)
    h2 = (sizes[0][0] // 2, sizes[0][1] // 2)
    site_shapes = [
        ("L0_s2d", h2 + (4 * c[0],), 2),     # bottom fire + deconv1 out
        ("L1", sizes[1] + (c[1],), 2),
        ("L2", sizes[2] + (c[2],), 2),
        ("L3", sizes[3] + (c[3],), 2),
        ("L4", sizes[4] + (c[4],), 4),       # conv4 + 2 SEW + deconv4 in
    ]
    sites = {}
    seq_sum = flat_sum = seq_g_sum = flat_g_sum = 0.0
    for name, shape, mult in site_shapes:
        sf, ff, sg, fg = fire_gap(shape, key)
        sites[name] = {"shape": list(shape), "multiplicity": mult,
                       "fire_seq_fwd_ms": round(sf, 3),
                       "fire_flat_fwd_ms": round(ff, 3),
                       "fire_seq_fwd_bwd_ms": round(sg, 3),
                       "fire_flat_fwd_bwd_ms": round(fg, 3)}
        seq_sum += mult * sf
        flat_sum += mult * ff
        seq_g_sum += mult * sg
        flat_g_sum += mult * fg
        print(name, sites[name], flush=True)
    report["sites"] = sites

    gap = report["t5_multistep_step_ms"] - report["t1_matched_step_ms"]
    fwd_gap = report["t5_multistep_fwd_ms"] - report["t1_matched_fwd_ms"]
    report["decomposition"] = {
        "step_gap_ms": round(gap, 2),
        "fwd_gap_ms": round(fwd_gap, 2),
        "bwd_update_gap_ms": round(gap - fwd_gap, 2),
        "recurrence_serialization_fwd_ms":
            round(seq_sum - flat_sum, 2),
        "recurrence_serialization_fwd_bwd_ms":
            round(seq_g_sum - flat_g_sum, 2),
    }
    print(json.dumps(report["decomposition"]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "t5_breakdown.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
