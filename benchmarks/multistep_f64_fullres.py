#!/usr/bin/env python
"""Scan vs layer-major at the REAL shape (T=5, 260×346, B=1), float64.

Evidence artifact for the gated test
``tests/test_multistep.py::test_scan_equals_layermajor_float64_full_resolution``
(the run is ~35 min of single-core f64 CPU convs, too slow for the default
suite). Pins that the on-chip bf16 divergence between the two execution
layouts (depth_rel_l2 0.135 at T=5/260×346,
``benchmarks/multistep_parity_tpu.json``) is pure low-precision
reassociation/threshold noise: at float64 and the same realistic shape the
layouts agree to ~1e-9. Runs the shipped default config (s2d-canonical
level 0 + polyphase deconv1).

Writes ``benchmarks/multistep_f64_fullres.json``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def main():
    from stereospike_tpu.models import (
        forward_multistep,
        forward_sequence,
        init_params,
        stereospike_tempo,
    )

    cfg = stereospike_tempo(in_hw=(260, 346), multiply_factor=10.0)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                          init_params(jax.random.PRNGKey(0), cfg))
    frames = jax.random.poisson(
        jax.random.PRNGKey(5), 0.6,
        (1, 5) + cfg.in_hw + (cfg.in_channels,)).astype(jnp.float64)

    t0 = time.time()
    d_ref, s_ref, st_ref = forward_sequence(params, frames, cfg)
    t_scan = time.time() - t0
    t0 = time.time()
    d_ms, s_ms, st_ms = forward_multistep(params, frames, cfg,
                                          use_pallas=False)
    t_lm = time.time() - t0

    report = {
        "shape": {"B": 1, "T": 5, "in_hw": [260, 346]},
        "dtype": "float64",
        "config": "stereospike_tempo (s2d_level0 + poly_deconv1 defaults)",
        "scan_seconds": round(t_scan, 1),
        "layermajor_seconds": round(t_lm, 1),
        "depth_rel_l2": [rel(a, b) for a, b in zip(d_ms, d_ref)],
        "spikes_rel_l2_max": max(rel(a, b) for a, b in zip(s_ms, s_ref)),
        "state_Ineurons_rel_l2": rel(st_ms["Ineurons"], st_ref["Ineurons"]),
    }
    report["pass_1e9"] = bool(
        max(report["depth_rel_l2"]) < 1e-9
        and report["spikes_rel_l2_max"] < 1e-9
        and report["state_Ineurons_rel_l2"] < 1e-9)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multistep_f64_fullres.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
