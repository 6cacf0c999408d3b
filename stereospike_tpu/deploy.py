"""Portable serving artifacts: the jitted serving step as one file.

The reference deploys by shipping the Python model code plus a ``.pth``
(``README.md`` quick-start). Here the whole serving computation — per-eye
rectification, voxelization, the stateful spiking forward, with the
WEIGHTS BAKED IN as constants — is exported once with :mod:`jax.export`
to a serialized StableHLO artifact. The artifact:

- needs only ``jax`` to load and run — none of this package's model,
  data, or training code (the loader below imports nothing from it);
- can target platforms the exporting host doesn't have (e.g. export on a
  CPU build box with ``platforms=("cpu", "tpu")``, serve on TPU);
- is shape/dtype-checked at call time by jax.export's calling convention,
  and versioned with its own forward-compatibility guarantees.

Container format (``.ssx``): a zip holding ``manifest.json`` (window
geometry + tree structure notes), ``step.bin`` (the serving step:
``(state, events, valids) -> (depth, new_state, rejected)``) and
``init.bin`` (zero membrane state, exported so a consumer never has to
reconstruct state shapes by hand).

CLI: ``python -m stereospike_tpu.cli export-serving --out model.ssx``.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import jax

MANIFEST = "manifest.json"
STEP_BIN = "step.bin"
INIT_BIN = "init.bin"
FORMAT_VERSION = 1


def export_serving_artifact(evaluator, path: str, *,
                            platforms: Optional[Sequence[str]] = None,
                            extra_meta: Optional[dict] = None) -> dict:
    """Export a :class:`~stereospike_tpu.streaming.StreamingEvaluator`'s
    serving step (weights baked in) to ``path``.

    ``platforms``: lowering targets, e.g. ``("cpu", "tpu")``; defaults to
    jax.export's default (the exporting backend). Returns the manifest.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    from stereospike_tpu.models import init_state

    s, block = evaluator.n_streams, evaluator.block
    eyes = list(evaluator.eyes)
    evs_spec = {e: jax.ShapeDtypeStruct((s, block, 4), jnp.float32)
                for e in eyes}
    val_spec = {e: jax.ShapeDtypeStruct((s, block), jnp.bool_) for e in eyes}
    state0 = init_state(evaluator.cfg, s, evaluator._state_dtype)
    state_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state0)

    params, inner = evaluator.params, evaluator._step
    step = jax.jit(lambda state, evs, valids: inner(params, state, evs,
                                                    valids))
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp_step = jexport.export(step, **kw)(state_spec, evs_spec, val_spec)
    exp_init = jexport.export(jax.jit(lambda: state0), **kw)()

    manifest = {
        "format_version": FORMAT_VERSION,
        "platforms": list(exp_step.platforms),
        "eyes": eyes,
        "n_streams": s,
        "block": block,
        "window_s": evaluator.window,
        "nfpdm": evaluator.nfpdm,
        "in_hw": list(evaluator.cfg.in_hw),
        "compute_dtype": str(evaluator._state_dtype.__name__
                             if hasattr(evaluator._state_dtype, "__name__")
                             else evaluator._state_dtype),
        "calling_convention": {
            "step": "(state, events, valids) -> (depth_f32, new_state, "
                    "rejected_events)",
            "events": f"{{eye: float32[{s}, {block}, 4] (x, y, t_rel, p), "
                      "zero-padded}",
            "valids": f"{{eye: bool[{s}, {block}]}}",
            "note": "event timestamps are window-relative seconds; "
                    "rectification (if maps were configured) is inside",
        },
        **(extra_meta or {}),
    }
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(MANIFEST, json.dumps(manifest, indent=2))
        z.writestr(STEP_BIN, exp_step.serialize())
        z.writestr(INIT_BIN, exp_init.serialize())
    return manifest


class ServingArtifact:
    """A loaded ``.ssx`` serving artifact. Only needs ``jax`` — no model
    code. ``step`` chains membrane state explicitly:

    >>> art = ServingArtifact.load("model.ssx")
    >>> state = art.init_state()
    >>> depth, state, rejected = art.step(state, events, valids)
    """

    def __init__(self, meta: dict, exp_step, exp_init):
        self.meta = meta
        self._step = exp_step
        self._init = exp_init

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read(MANIFEST))
            if meta.get("format_version") != FORMAT_VERSION:
                raise ValueError(
                    f"unsupported artifact version {meta.get('format_version')}"
                    f" (loader speaks {FORMAT_VERSION})")
            exp_step = jexport.deserialize(z.read(STEP_BIN))
            exp_init = jexport.deserialize(z.read(INIT_BIN))
        return cls(meta, exp_step, exp_init)

    def init_state(self):
        """Fresh zero membrane state (shapes/dtypes baked at export)."""
        return self._init.call()

    def step(self, state, events: Dict, valids: Dict) -> Tuple:
        """One serving step: ``(depth [S,H,W,1] f32, new_state, rejected)``.
        ``events``/``valids`` follow ``meta['calling_convention']``."""
        return self._step.call(state, events, valids)


def load_serving_artifact(path: str) -> ServingArtifact:
    return ServingArtifact.load(path)
