#!/usr/bin/env python
"""Paper-table ablation sweeps (Tables 2/3/4) to convergence on the
learnable synthetic scene, on the real chip (VERDICT r4 #6).

The reference's ablation studies (paper Tables 2-4; models
``/root/reference/network/SNN_models.py:629-898``, ``ANN_models.py:28-152``)
were produced by hand-editing ``train.py`` per variant. Here ``cli sweep``'s
machinery (``stereospike_tpu/sweep.py``) runs each table end-to-end —
train with per-epoch validation + best-on-val checkpointing, then
test-split eval from the best checkpoint — on the learnable synthetic
scene that `benchmarks/synthetic_e2e/SUMMARY.md` proved the production
path can learn (val MDE 3.51 → 0.29 m; predict-the-mean floor ≈ 0.95 m).
The real-MVSEC sweep is staged in ``configs/MVSEC_RUNBOOK.md``; this run
validates the comparison machinery end-to-end and records the directional
deltas the scene supports.

Budget: the IF flagship's MDE "crack" needs ≳120 optimization steps at
batch 32 (SUMMARY.md learning curve); each variant gets EPOCHS×~7 steps
with the paper's MultiStepLR rescaled to the budget (the 70-epoch
[8,42,60] recipe → EPOCHS×[0.6,0.8,0.93], matching the e2e run's 30-epoch
rescale). One TPU job at a time by construction (sweep.py runs variants
sequentially).

Writes ``benchmarks/sweep_ablations.json`` (all rows + directional-delta
summary) and ``benchmarks/sweep_ablations.md``.
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from stereospike_tpu.sweep import TABLES, run_sweep, _markdown
    from stereospike_tpu.train.config import TrainConfig

    t0 = time.time()
    float(jax.numpy.ones(()) + 1.0)
    log(f"device probe ok ({time.time() - t0:.1f}s): "
        f"{jax.devices()[0].device_kind}")

    ckpt_root = tempfile.mkdtemp(prefix="sweep_ablations_")
    ms = (int(EPOCHS * 0.6), int(EPOCHS * 0.8), int(EPOCHS * 0.93))
    base = TrainConfig(
        batch_size=BATCH,
        epochs=EPOCHS,
        lr_milestones=ms,
        synth_frames=120,
        synth_events=2_400_000,
        synth_learnable=True,
        compute_dtype="float32",
        tensorboard=False,
        checkpoint_dir=ckpt_root,
    )
    log(f"recipe: {EPOCHS} epochs, batch {BATCH}, milestones {ms}, "
        f"learnable scene 120 frames / 2.4M events per eye per sequence")

    records = {}
    try:
        for table in ("table2", "table3", "table4"):
            t1 = time.time()
            rec = run_sweep(base, TABLES[table], name=table, synthetic=True)
            rec["wall_s"] = round(time.time() - t1, 1)
            records[table] = rec
            log(f"{table} done in {rec['wall_s']}s: " + json.dumps(
                [{r['name']: r.get('test_MDE')} for r in rec['rows']]))
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)

    def mde(table, name):
        for r in records[table]["rows"]:
            if r["name"] == name:
                return r.get("test_MDE")
        return None

    # Directional deltas the paper reports (reference Tables 2-4); recorded
    # honestly — the synthetic scene need not reproduce every ordering
    deltas = {
        # Table 2: more prediction heads → lower test MDE
        # (19.07 {1,2,3,4} < 25.43 {1})
        "table2_full_heads_beat_single": (
            (mde("table2", "heads_1234") or 1e9)
            < (mde("table2", "heads_1") or 0)),
        # Table 3: skip connections generalize better
        # (test 19.07 with < 22.41 without)
        "table3_skips_beat_noskips": (
            (mde("table3", "with_skips") or 1e9)
            < (mde("table3", "no_skips") or 0)),
        # Table 4: the SNN's test MDE beats every equivalent ANN
        # (18.5 vs 24.5/25.6/28.1)
        "table4_snn_beats_all_anns": all(
            (mde("table4", "snn") or 1e9) < (mde("table4", n) or 0)
            for n in ("ann_sigmoid", "ann_tanh", "ann_leaky_relu")),
    }
    out = {
        "epochs": EPOCHS, "batch": BATCH, "lr_milestones": list(ms),
        "scene": "learnable synthetic (fixtures.py, seed 2021)",
        "directional_deltas": deltas,
        "tables": records,
    }
    with open(os.path.join(HERE, "sweep_ablations.json"), "w") as f:
        json.dump(out, f, indent=2, default=str)
    md = ["# Ablation sweeps on the learnable synthetic scene\n",
          f"{EPOCHS} epochs, batch {BATCH}, milestones {ms}; "
          "test MDE from best-on-val checkpoints.\n"]
    for table, rec in records.items():
        md.append(f"\n## {table}\n\n" + _markdown(rec["rows"]))
    md.append("\n## directional deltas (paper orderings)\n\n" + "".join(
        f"- {k}: **{v}**\n" for k, v in deltas.items()))
    with open(os.path.join(HERE, "sweep_ablations.md"), "w") as f:
        f.write("".join(md))
    log(json.dumps(deltas))


if __name__ == "__main__":
    main()
