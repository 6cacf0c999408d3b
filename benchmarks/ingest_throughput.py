#!/usr/bin/env python
"""Host-side serving-ingest throughput (no accelerator involved).

The live path a DVS feed takes before any device work: SPKE packets over
TCP loopback → window assembly, and separately the raw ring-buffer
push/pop and the pad-to-block staging. Event cameras emit 1-10 M
events/s/sensor; this measures the margin the host stack has over that.

Writes ``benchmarks/ingest_throughput.json``.
"""

import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stereospike_tpu.sources import SocketSource, send_events
from stereospike_tpu.streaming import EventRingBuffer

N_EVENTS = int(os.environ.get("INGEST_EVENTS", "4000000"))
PACKET = int(os.environ.get("INGEST_PACKET", "50000"))


def bench_ring_buffer():
    buf = EventRingBuffer(capacity=1 << 21)
    ev = np.random.default_rng(0).random((PACKET, 4)).astype(np.float32)
    n = 0
    t0 = time.perf_counter()
    while n < N_EVENTS:
        buf.push(ev)
        if len(buf) > (1 << 20):
            buf.pop()
        n += PACKET
    buf.pop()
    return n / (time.perf_counter() - t0)


def bench_socket_ingest():
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    src = SocketSource(eyes=("left",), window_s=0.05, timeout=60.0,
                       _listen_sock=srv)
    rng = np.random.default_rng(1)
    n_packets = N_EVENTS // PACKET

    def producer():
        with socket.create_connection(("127.0.0.1", port)) as s:
            t = 0.0
            for _ in range(n_packets):
                ev = np.empty((PACKET, 4), np.float64)
                ev[:, 0] = rng.integers(0, 346, PACKET)
                ev[:, 1] = rng.integers(0, 260, PACKET)
                ev[:, 2] = np.linspace(t, t + 0.01, PACKET)
                ev[:, 3] = 1.0
                t += 0.01
                send_events(s, 0, ev)

    th = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    th.start()
    total = sum(w["left"].shape[0] for w in src)
    dt = time.perf_counter() - t0
    th.join()
    assert total == n_packets * PACKET, (total, n_packets * PACKET)
    return total / dt


def main():
    report = {
        "n_events": N_EVENTS,
        "packet_rows": PACKET,
        "ring_buffer_events_per_s": round(bench_ring_buffer()),
        "socket_window_ingest_events_per_s": round(bench_socket_ingest()),
        "camera_reference_events_per_s": 10_000_000,
    }
    for k in ("ring_buffer_events_per_s", "socket_window_ingest_events_per_s"):
        report[k.replace("_events_per_s", "_vs_camera")] = round(
            report[k] / report["camera_reference_events_per_s"], 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ingest_throughput.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
