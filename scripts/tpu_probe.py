"""Timed TPU-relay liveness probe (exit 0 = healthy, 1 = degraded/dead).

The relay on this box has two distinct failure modes (CLAUDE.md gotchas):
  * compile-service wedge — jax.devices()/device_put/cached execution stay
    instant, but every new compile hangs;
  * FULL outage — jax.devices() itself blocks (observed >2 h).
This probe distinguishes them with per-stage timeouts and prints one JSON
line, so shell watchdogs can queue TPU work behind recovery:

    while ! timeout 240 python scripts/tpu_probe.py; do sleep 300; done
    python scripts/bench_decode.py ...

Each stage runs in a daemon thread — a blocked PJRT call is unkillable from
Python, so on timeout the probe reports and hard-exits instead of joining.
"""

import json
import os
import sys
import threading
import time


def _stage(name, fn, timeout_s, report):
    out, err = [], []

    def run():
        try:
            out.append(fn())
        except Exception as e:  # noqa: BLE001 — report, don't crash the probe
            err.append(f"{type(e).__name__}: {str(e)[:200]}")

    t0 = time.time()
    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=timeout_s)
    dt = round(time.time() - t0, 1)
    if err:
        report[name] = {"ok": False, "s": dt, "error": err[0]}
        return None
    if not out:
        report[name] = {"ok": False, "s": dt, "error": f"timeout>{timeout_s}s"}
        return None
    report[name] = {"ok": True, "s": dt}
    return out[0]


def main():
    devices_timeout = float(os.environ.get("PROBE_DEVICES_TIMEOUT_S", 60))
    compile_timeout = float(os.environ.get("PROBE_COMPILE_TIMEOUT_S", 120))
    report = {}

    import jax

    devs = _stage("devices", jax.devices, devices_timeout, report)
    healthy = devs is not None
    if healthy:
        report["platform"] = devs[0].platform

        import numpy as np

        def tiny_compile():
            x = jax.device_put(np.ones((8, 8), np.float32))
            y = jax.jit(lambda a: a @ a)(x)
            # block_until_ready lies through the relay — fetch a scalar
            return float(np.asarray(jax.device_get(y.ravel()[0])))

        healthy = _stage("compile", tiny_compile, compile_timeout, report) is not None

    report["healthy"] = bool(healthy)
    print(json.dumps(report), flush=True)
    # a blocked PJRT thread prevents normal interpreter exit
    os._exit(0 if healthy else 1)


if __name__ == "__main__":
    sys.exit(main())
