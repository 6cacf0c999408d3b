"""Paper-table sweeps: the reference's ablation studies as one command.

The paper's Tables 2-4 (prediction-head subsets, skip connections, SNN vs
equivalent ANN — ``/root/reference/sources`` paper; models
``SNN_models.py:629-898``, ``ANN_models.py:28``) each required editing
``train.py``'s constants and re-running by hand. ``cli sweep --table N``
runs the variants sequentially (one TPU job at a time by construction),
evaluates each on the test split, and writes a comparison table.

Variants reuse the full training recipe from the base config; each gets
its own checkpoint subdirectory. Results land in
``<checkpoint_dir>/sweep_<name>.json`` and ``.md``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

from stereospike_tpu.train.config import TrainConfig

# Table 2: prediction-head ablation on the paper recipe (tempo/PLIF) —
# reference classes SNN_models.py:767-898 hardcode the subsets; here they
# are one config knob. Table 3: skip-connection ablation (SNN_models.py:629).
# Table 4: SNN vs the equivalent ANNs (ANN_models.py:28, train.py:118-120).
TABLES: Dict[str, List[Dict]] = {
    "table2": [
        {"name": "heads_1234", "model": "stereospike_tempo"},
        {"name": "heads_123", "model": "stereospike_tempo",
         "heads": (1, 2, 3)},
        {"name": "heads_12", "model": "stereospike_tempo", "heads": (1, 2)},
        {"name": "heads_1", "model": "stereospike_tempo", "heads": (1,)},
    ],
    "table3": [
        {"name": "with_skips", "model": "stereospike_tempo"},
        {"name": "no_skips", "model": "stereospike_noskip"},
    ],
    "table4": [
        {"name": "snn", "model": "stereospike_tempo"},
        {"name": "ann_sigmoid", "model": "ann_sigmoid"},
        {"name": "ann_tanh", "model": "ann_tanh"},
        {"name": "ann_leaky_relu", "model": "ann_leaky_relu"},
    ],
}


def _markdown(rows: List[Dict]) -> str:
    cols = ["name", "model", "heads", "val_MDE", "test_MDE", "test_loss",
            "train_time_s", "preempted"]
    present = [c for c in cols if any(c in r for r in rows)]
    out = ["| " + " | ".join(present) + " |",
           "|" + "|".join("---" for _ in present) + "|"]
    for r in rows:
        cells = []
        for c in present:
            v = r.get(c, "")
            cells.append(f"{v:.4f}" if isinstance(v, float)
                         and c != "train_time_s" else str(v))
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out) + "\n"


def run_sweep(base: TrainConfig, variants: List[Dict], *,
              name: str = "sweep", synthetic: bool = False,
              max_steps: Optional[int] = None) -> Dict:
    """Train + test-evaluate each variant; returns the comparison record."""
    from stereospike_tpu.train.loop import _make_data, eval_loop, train_loop

    # variants share the data config (only model knobs differ): build the
    # (train, val, test) views ONCE — a real MVSEC build streams O(10^8)
    # events and would otherwise repeat per variant
    data = _make_data(base, synthetic, None)
    rows = []
    preempted = False
    for v in variants:
        overrides = {k: val for k, val in v.items() if k != "name"}
        cfg = dataclasses.replace(
            base, checkpoint_dir=os.path.join(base.checkpoint_dir,
                                              v["name"]),
            **overrides)
        t0 = time.time()
        summary = train_loop(cfg, synthetic=synthetic, max_steps=max_steps,
                             data=data)
        if summary.get("preempted"):
            # SIGTERM mid-variant: its resume point is checkpointed; do not
            # score half-trained weights or start the remaining variants in
            # a process the scheduler is about to kill
            rows.append({"name": v["name"], **overrides, "preempted": True,
                         "step": summary.get("step")})
            preempted = True
            break
        res = eval_loop(cfg, synthetic=synthetic, data=data)
        rows.append({
            "name": v["name"],
            **overrides,
            "val_MDE": summary.get("best_val_MDE"),
            "test_MDE": res.get("test_MDE"),
            "test_loss": res.get("test_loss"),
            "train_time_s": round(time.time() - t0, 1),
        })

    record = {"sweep": name, "n_variants": len(rows), "rows": rows,
              "preempted": preempted}
    from stereospike_tpu.utils.logging import is_lead_process

    if not is_lead_process():  # shared-FS writes are lead-only
        return record
    os.makedirs(base.checkpoint_dir, exist_ok=True)
    with open(os.path.join(base.checkpoint_dir,
                           f"sweep_{name}.json"), "w") as f:
        json.dump(record, f, indent=2, default=str)
    with open(os.path.join(base.checkpoint_dir, f"sweep_{name}.md"),
              "w") as f:
        f.write(f"# sweep: {name}\n\n" + _markdown(rows))
    return record
