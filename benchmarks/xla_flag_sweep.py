#!/usr/bin/env python
"""XLA flag sweep over the headline train step (B=128 T=1 bf16).

The decoder is measured-irreducible at the HLO level (ROADMAP §2); the
remaining lever this side of hand-written convs is XLA's own cost-model
knobs. Each candidate flag set runs `bench.measure` in a fresh subprocess
(XLA_FLAGS is read at backend init) and reports frames/s vs the no-flag
baseline. Writes ``benchmarks/xla_flag_sweep.json``.

FINDING (committed json): on this environment's tunneled backend every
TPU-specific flag is rejected at client startup ("Unknown flag in
XLA_FLAGS: --xla_tpu_...") — the local process is a thin client and the
TPU compiler runs in a remote helper that does not receive XLA_FLAGS.
Compiler-knob tuning is unreachable here; re-run this sweep on a
locally-attached chip.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANDIDATES = {
    "baseline": "",
    # larger scoped VMEM lets the fusion cost model keep bigger conv
    # operands resident (default 16 MB-ish on v5e)
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    # flash-style aggressive fusion of reduces into convs
    "fusion_aggressive": "--xla_tpu_rwb_fusion=false",
    # bigger windowed einsum / all-reduce latency hiding is multi-chip
    # only; the remaining single-chip knob is the scheduler
    "lhs_off": "--xla_latency_hiding_scheduler_rerun=0",
}

CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
import bench
fps = bench.measure(batch=128, iters=20)
print("FPS_RESULT", json.dumps(fps))
"""


def main():
    results = {}
    for name, flags in CANDIDATES.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=REPO)],
                env=env, capture_output=True, text=True, timeout=900)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("FPS_RESULT")]
            results[name] = {
                "flags": flags,
                "fps": round(float(json.loads(line[0].split(None, 1)[1])), 2)
                if line else None,
                "error": None if line else out.stderr.strip()[-400:],
            }
        except subprocess.TimeoutExpired:
            results[name] = {"flags": flags, "fps": None, "error": "timeout"}
        print(name, results[name], flush=True)

    base = results.get("baseline", {}).get("fps")
    for r in results.values():
        r["vs_baseline"] = (round(r["fps"] / base, 4)
                            if r["fps"] and base else None)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "xla_flag_sweep.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v.get("vs_baseline") for k, v in results.items()}))


if __name__ == "__main__":
    main()
