#!/usr/bin/env python
"""Spike-penalization effect on the real chip (paper §4.4, the last
reference experiment not yet reproduced).

The paper reports that adding the spike-penalization term to the total
loss at weight 0.5 (``/root/reference/network/loss.py:96-107``; wired at
``loss.py:126-135``) produces a LARGE drop in network activity at < 3 cm
MDE cost — the accuracy/power dial of a spiking network. This script
trains the flagship twice on the learnable synthetic scene — identical
recipe, ``penalize_spikes`` off vs on (β = 0.5, the paper's weight) —
then runs the firing-rate profiler (reference
``calculate_firing_rates.py``) from each best-on-val checkpoint and
compares mean encoder/decoder densities and test MDE.

Directional expectation: penalized mean firing rate well below the
unpenalized one, test MDE within a small absolute cost.

Writes ``benchmarks/spike_penalization.json`` and ``.md``.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

EPOCHS = int(os.environ.get("SWEEP_EPOCHS", "45"))
BATCH = int(os.environ.get("SWEEP_BATCH", "32"))
HERE = os.path.dirname(os.path.abspath(__file__))

ENC = ("out_bottom", "out_conv1", "out_conv2", "out_conv3", "out_conv4")
DEC = ("out_rconv", "out_deconv4", "out_add4", "out_deconv3", "out_add3",
       "out_deconv2", "out_add2", "out_deconv1", "out_add1")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import dataclasses

    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import (
        _make_data,
        eval_loop,
        firing_rates_loop,
        train_loop,
    )

    t0 = time.time()
    float(jax.numpy.ones(()) + 1.0)
    log(f"device probe ok ({time.time() - t0:.1f}s)")

    root = tempfile.mkdtemp(prefix="spike_pen_")
    ms = (int(EPOCHS * 0.6), int(EPOCHS * 0.8), int(EPOCHS * 0.93))
    base = TrainConfig(
        batch_size=BATCH, epochs=EPOCHS, lr_milestones=ms,
        synth_frames=120, synth_events=2_400_000, synth_learnable=True,
        compute_dtype="float32", tensorboard=False, checkpoint_dir=root)
    data = _make_data(base, True, None)

    rows = {}
    try:
        for name, overrides in (
                ("baseline", {}),
                ("penalized", {"penalize_spikes": True, "loss_beta": 0.5})):
            cfg = dataclasses.replace(
                base, checkpoint_dir=os.path.join(root, name), **overrides)
            t1 = time.time()
            summary = train_loop(cfg, synthetic=True, data=data)
            res = eval_loop(cfg, synthetic=True, data=data)
            rates = firing_rates_loop(cfg, synthetic=True, data=data)
            enc = sum(rates[k] for k in ENC) / len(ENC)
            dec = sum(rates[k] for k in DEC) / len(DEC)
            rows[name] = {
                "val_MDE": summary.get("best_val_MDE"),
                "test_MDE": res.get("test_MDE"),
                "mean_encoder_rate": round(enc, 4),
                "mean_decoder_rate": round(dec, 4),
                "per_tap": {k: round(v, 4) for k, v in rates.items()},
                "wall_s": round(time.time() - t1, 1),
            }
            log(f"{name}: test MDE {rows[name]['test_MDE']:.4f}, "
                f"enc {enc:.3f} dec {dec:.3f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    b, p = rows["baseline"], rows["penalized"]
    overall = lambda r: (5 * r["mean_encoder_rate"]
                         + 9 * r["mean_decoder_rate"]) / 14
    out = {
        "epochs": EPOCHS, "batch": BATCH, "beta": 0.5,
        "rows": rows,
        "activity_ratio_penalized_over_baseline": round(
            overall(p) / overall(b), 4),
        "mde_cost_m": round(p["test_MDE"] - b["test_MDE"], 4),
        "paper_expectation": ("large activity drop at small MDE cost "
                              "(§4.4, weight 0.5)"),
    }
    with open(os.path.join(HERE, "spike_penalization.json"), "w") as f:
        json.dump(out, f, indent=2)
    md = ["# Spike penalization (paper §4.4) on the learnable scene\n\n",
          f"β = 0.5, {EPOCHS} epochs, batch {BATCH}.\n\n",
          "| run | test MDE (m) | mean enc rate | mean dec rate |\n",
          "|---|---|---|---|\n"]
    for name, r in rows.items():
        md.append(f"| {name} | {r['test_MDE']:.4f} | "
                  f"{r['mean_encoder_rate']:.4f} | "
                  f"{r['mean_decoder_rate']:.4f} |\n")
    md.append(f"\n- overall activity ratio (penalized/baseline): "
              f"**{out['activity_ratio_penalized_over_baseline']}**\n"
              f"- MDE cost: **{out['mde_cost_m']} m**\n")
    with open(os.path.join(HERE, "spike_penalization.md"), "w") as f:
        f.write("".join(md))
    log(json.dumps({k: out[k] for k in
                    ("activity_ratio_penalized_over_baseline", "mde_cost_m")}))


if __name__ == "__main__":
    main()
