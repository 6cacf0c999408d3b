"""Environment diagnostics: ``python -m stereospike_tpu.cli doctor``.

Production serving/training sits on several moving parts — an accelerator
that may be reached through a remote tunnel, a persistent XLA compile
cache, the native C++ host ops, and enough host devices for the virtual
test mesh. This probes each one WITH TIMEOUTS (a wedged device tunnel must
produce a report saying so, not a hung diagnostic) and prints one JSON
object. Exit status: 0 if the accelerator answered, 2 otherwise.

The default device timeout (240 s) sits above the documented ~150 s
HEALTHY first-D2H-fetch stall of a fresh process on tunneled backends
(CLAUDE.md) — a shorter timeout would misdiagnose a cold-but-healthy
tunnel as wedged. Note a timed-out probe leaves its daemon thread
mid-dispatch; on an already-suspect tunnel that is acceptable, but do
not point the doctor at a healthy busy device with a tiny timeout.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Dict, Optional


def _run_with_timeout(fn, timeout_s: float):
    """(result, error, seconds) — runs ``fn`` in a daemon thread so a hung
    backend (e.g. a wedged device tunnel) cannot hang the doctor itself."""
    out: Dict = {}

    def body():
        t0 = time.perf_counter()
        try:
            out["result"] = fn()
        except Exception as e:  # noqa: BLE001 — reported, not raised
            out["error"] = f"{type(e).__name__}: {e}"
        out["seconds"] = time.perf_counter() - t0

    t = threading.Thread(target=body, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, f"timed out after {timeout_s:.0f} s", timeout_s
    return out.get("result"), out.get("error"), out.get("seconds", 0.0)


def run_doctor(device_timeout_s: float = 240.0,
               data_root: Optional[str] = None) -> Dict:
    import jax

    report: Dict = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
    }

    # 1. accelerator reachability — backend init can hang indefinitely on
    # a wedged tunnel, hence the thread timeout
    devices, err, secs = _run_with_timeout(jax.devices, device_timeout_s)
    if devices is not None:
        report["devices"] = [f"{d.device_kind} ({d.platform})"
                             for d in devices]
        report["backend_init_s"] = round(secs, 1)

        # 2. a real round trip: tiny op + value fetch (block_until_ready is
        # not a true sync on tunneled backends — fetch a value)
        def roundtrip():
            import jax.numpy as jnp

            return float(jnp.ones(()) + 1.0)

        val, rerr, rsecs = _run_with_timeout(roundtrip, device_timeout_s)
        report["device_roundtrip"] = (
            {"ok": val == 2.0, "seconds": round(rsecs, 1)}
            if rerr is None and val is not None
            else {"ok": False, "error": rerr})
    else:
        report["devices"] = None
        report["device_error"] = err

    # 3. native C++ host ops
    try:
        from stereospike_tpu import native

        report["native_host_ops"] = native._load() is not None
    except Exception as e:  # noqa: BLE001
        report["native_host_ops"] = False
        report["native_error"] = f"{type(e).__name__}: {e}"

    # 4. persistent compile cache
    cache = jax.config.jax_compilation_cache_dir
    report["compile_cache"] = {
        "dir": cache,
        "writable": bool(cache) and os.access(
            cache if os.path.isdir(cache) else os.path.dirname(cache) or ".",
            os.W_OK),
        "entries": (len(os.listdir(cache))
                    if cache and os.path.isdir(cache) else 0),
    }

    # 5. host CPUs for the virtual test mesh
    report["host_cpu_count"] = os.cpu_count()

    # 6. dataset root, if given
    if data_root:
        report["data_root"] = {
            "path": data_root,
            "exists": os.path.isdir(data_root),
        }

    report["ok"] = bool(report.get("devices")) and bool(
        report.get("device_roundtrip", {}).get("ok"))
    return report
