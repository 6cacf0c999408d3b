#!/usr/bin/env python
"""On-chip parity: compiled Mosaic multistep kernels vs the lax.scan oracle.

The CPU test suite proves the fused Pallas multistep path correct in
interpret mode (tests/test_multistep.py, tests/test_pallas_kernels.py); this
script proves the *compiled* kernels on the real TPU chip: forward depths,
loss value, and BPTT gradients of ``forward_multistep`` (use_pallas=True,
non-interpret) against the step-major ``forward_sequence``.

Spiking nets are not bitwise-stable across execution layouts (the B·T-merged
convs reassociate sums, so a borderline membrane potential can flip a spike
— see CLAUDE.md), so parity is judged with tolerances plus a spike-flip
census. Writes ``benchmarks/multistep_parity_tpu.json`` and exits non-zero
on failure.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))


def _grad_compare(g_ref, g_other):
    """Worst per-leaf cosine + relative L2 between two gradient pytrees."""
    leaves_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    leaves_o = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_other))
    worst_cos, worst_rel, worst_name = 1.0, 0.0, ""
    for path, a in leaves_ref:
        name = jax.tree_util.keystr(path)
        b = leaves_o[name]
        a64, b64 = np.asarray(a, np.float64).ravel(), np.asarray(
            b, np.float64).ravel()
        na, nb = np.linalg.norm(a64), np.linalg.norm(b64)
        cos = float(a64 @ b64 / (na * nb)) if na and nb else 1.0
        rel = float(np.linalg.norm(b64 - a64) / max(na, 1e-12))
        if cos < worst_cos:
            worst_cos, worst_name = cos, name
        worst_rel = max(worst_rel, rel)
    return worst_cos, worst_rel, worst_name


def main(T: int = 5, batch: int = 2, hw=(260, 346)) -> dict:
    from stereospike_tpu.models import (
        forward_multistep,
        forward_sequence,
        init_params,
        stereospike_tempo,
    )

    cfg = stereospike_tempo(in_hw=hw)
    params = init_params(jax.random.PRNGKey(0), cfg)
    frames = jax.random.poisson(
        jax.random.PRNGKey(1), 0.35,
        (batch, T) + cfg.in_hw + (cfg.in_channels,)).astype(jnp.float32)

    def objective(d, s):
        return (sum(jnp.mean(x ** 2) for x in d)
                + 0.01 * sum(jnp.mean(x) for x in s))

    def loss_scan(p):
        d, s, _ = forward_sequence(p, frames, cfg)
        return objective(d, s), d

    def loss_lm_jnp(p):  # layer-major, pure-jnp neuron scan (same convs as
        d, s, _ = forward_multistep(p, frames, cfg, use_pallas=False)
        return objective(d, s), d

    def loss_ms(p):      # layer-major, compiled Pallas kernels
        d, s, _ = forward_multistep(p, frames, cfg, use_pallas=True,
                                    interpret=False)
        return objective(d, s), d

    (l_ref, d_ref), g_ref = jax.jit(
        jax.value_and_grad(loss_scan, has_aux=True))(params)
    (l_lm, d_lm), g_lm = jax.jit(
        jax.value_and_grad(loss_lm_jnp, has_aux=True))(params)
    (l_ms, d_ms), g_ms = jax.jit(
        jax.value_and_grad(loss_ms, has_aux=True))(params)

    l_ref, l_lm, l_ms = float(l_ref), float(l_lm), float(l_ms)
    depth_scale = float(jnp.max(jnp.abs(d_ref[0])))

    # (a) KERNEL correctness: Pallas vs the SAME layer-major graph with jnp
    # neurons — identical conv layout, so this isolates the kernels.
    kernel_cos, kernel_rel, kernel_leaf = _grad_compare(g_lm, g_ms)
    kernel_loss_rel = abs(l_ms - l_lm) / max(abs(l_lm), 1e-12)
    kernel_depth_max = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(d_ms, d_lm))

    # (b) LAYOUT divergence: layer-major vs step-major scan. The B·T-merged
    # convs reassociate fp32 sums, borderline membrane potentials flip
    # spikes, and T steps of a binary nonlinearity amplify them — expected
    # behavior for spiking nets (CLAUDE.md), judged statistically.
    layout_cos, layout_rel, layout_leaf = _grad_compare(g_ref, g_ms)
    layout_loss_rel = abs(l_ms - l_ref) / max(abs(l_ref), 1e-12)
    layout_depth_rel_l2 = max(
        float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        for a, b in zip(d_ms, d_ref))

    report = {
        "T": T, "batch": batch, "hw": list(hw),
        "backend": jax.default_backend(),
        "loss_scan": l_ref, "loss_layermajor_jnp": l_lm,
        "loss_multistep_pallas": l_ms,
        "depth_scale": depth_scale,
        "kernel_check": {  # pallas vs layer-major jnp (tight)
            "loss_rel_diff": kernel_loss_rel,
            "depth_max_abs_diff": kernel_depth_max,
            "grad_worst_cosine": kernel_cos,
            "grad_worst_rel_l2": kernel_rel,
            "grad_worst_leaf": kernel_leaf,
        },
        "layout_check": {  # layer-major vs step-major (statistical)
            "loss_rel_diff": layout_loss_rel,
            "depth_rel_l2": layout_depth_rel_l2,
            "grad_worst_cosine": layout_cos,
            "grad_worst_rel_l2": layout_rel,
            "grad_worst_leaf": layout_leaf,
        },
        "pass": bool(
            kernel_loss_rel < 1e-4 and kernel_cos > 0.9999
            and kernel_depth_max < 1e-3 * max(depth_scale, 1.0)
            and layout_loss_rel < 2e-2 and layout_cos > 0.99),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multistep_parity_tpu.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    rep = main()
    raise SystemExit(0 if rep["pass"] else 1)
