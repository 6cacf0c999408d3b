#!/usr/bin/env python
"""Example SPKE producer: what a camera driver runs, end to end.

On the machine with the DVS camera(s)::

    # serving side (TPU host)
    python -m stereospike_tpu.cli stream --listen 0.0.0.0:7007 --reply \\
        --n-windows 0 --checkpoint-dir results/run1

    # camera side (this script; here fed by a synthetic event generator)
    python examples/spke_producer.py --host tpu-host --port 7007

Replace :func:`synthetic_events` with your driver's event callback — the
only contract is [N, 4] rows (x, y, t, p) with float64 absolute
timestamps (epoch or camera clock; ``send_events`` splits them into the
wire's float64 base + float32 offsets so no precision is lost). Depth
maps stream back on the same connection (``recv_depth``); with evaluator
pipelining they lag the event feed by the pipeline depth.
"""

import argparse
import socket
import threading
import time

import numpy as np

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereospike_tpu.sources import (  # noqa: E402
    aedat31_packets,
    recv_depth,
    send_events,
)


def synthetic_events(rng, hw, t0, span, n):
    """Stand-in for a camera driver callback: one packet of AER events."""
    return np.stack([
        rng.integers(0, hw[1], n).astype(np.float64),
        rng.integers(0, hw[0], n).astype(np.float64),
        np.sort(rng.uniform(t0, t0 + span, n)),
        rng.choice([0.0, 1.0], n).astype(np.float64)], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--hw", default="260,346")
    ap.add_argument("--eyes", type=int, default=2)
    ap.add_argument("--events-per-packet", type=int, default=20000)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--hz", type=float, default=20.0,
                    help="packet cadence (the server windows by timestamp, "
                         "not by packet)")
    ap.add_argument("--aedat", default=None,
                    help="replay AEDAT 3.1 recording(s) instead of the "
                         "synthetic generator; one path, or left,right "
                         "paths — overrides --eyes/--seconds")
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(","))

    # the serving side binds after loading its model — retry the connect
    sock = None
    for _ in range(120):
        try:
            sock = socket.create_connection((args.host, args.port),
                                            timeout=2.0)
            break
        except OSError:
            time.sleep(1.0)
    if sock is None:
        raise SystemExit(f"no server at {args.host}:{args.port}")
    sock.settimeout(120)
    depths = []

    def reader():
        while True:
            d = recv_depth(sock)
            if d is None:
                return
            depths.append(d)
            print(f"depth {len(depths)}: shape {d.shape} "
                  f"mean {float(np.nanmean(d)):.3f}", flush=True)

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()

    if args.aedat:
        # replay a camera recording packet-by-packet: timestamps come from
        # the file (the server windows by them), pacing from --hz
        dt = 1.0 / args.hz
        streams = [aedat31_packets(p) for p in args.aedat.split(",") if p]
        heads = [next(it, None) for it in streams]
        while any(h is not None for h in heads):
            eye = min((i for i, h in enumerate(heads) if h is not None),
                      key=lambda i: heads[i][0, 2])
            send_events(sock, eye, heads[eye])
            heads[eye] = next(streams[eye], None)
            time.sleep(dt)
    else:
        rng = np.random.default_rng(0)
        dt = 1.0 / args.hz
        t = time.time()  # epoch stamps fine: the wire keeps f64 precision
        deadline = time.time() + args.seconds
        while time.time() < deadline:
            for eye in range(args.eyes):
                send_events(sock, eye, synthetic_events(
                    rng, hw, t, dt, args.events_per_packet))
            t += dt
            time.sleep(dt)
    sock.shutdown(socket.SHUT_WR)
    rt.join(timeout=30)
    print(f"served {len(depths)} depth maps")


if __name__ == "__main__":
    main()
