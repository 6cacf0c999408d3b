"""Environment diagnostics: the doctor must report a healthy CPU backend
and degrade to a structured failure (never a hang) when probes time out."""

import numpy as np

from stereospike_tpu.doctor import _run_with_timeout, run_doctor


def test_doctor_reports_healthy_backend(tmp_path):
    rep = run_doctor(device_timeout_s=60.0, data_root=str(tmp_path))
    assert rep["ok"] is True
    assert rep["devices"] and "cpu" in rep["devices"][0]
    assert rep["device_roundtrip"]["ok"] is True
    assert rep["native_host_ops"] is True
    assert rep["compile_cache"]["writable"] is True
    assert rep["data_root"]["exists"] is True


def test_run_with_timeout_bounds_a_hang():
    import time

    res, err, secs = _run_with_timeout(lambda: time.sleep(60), 0.2)
    assert res is None and "timed out" in err
    assert secs < 5


def test_run_with_timeout_captures_exceptions():
    def boom():
        raise RuntimeError("no backend")

    res, err, _ = _run_with_timeout(boom, 5.0)
    assert res is None and "RuntimeError: no backend" in err
