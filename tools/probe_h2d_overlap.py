"""Probe: does a host->device upload overlap device compute on this
stack, and does issue order / issuing thread matter?

The driver loses ~1.9 s/video to a 55 MB uint8 upload at the measured
21-34 MB/s tunnel rate; r4 claimed transfers overlap compute enqueued
before them, but the r5 pipelined bench (upload enqueued behind a full
video of dispatches) measured NO gain.  This builds the truth table:

  compute        - 30 dispatches of ~80 ms matmul chains, synced
  upload         - one 55 MB uint8 device_put, synced
  put-host-cost  - how long device_put BLOCKS the calling thread
  upload->compute- upload enqueued first
  compute->upload- upload enqueued after all compute dispatches
  threaded       - upload from a second thread mid-compute
  chunked8       - 8 chunk puts interleaved between compute dispatches

Perfect overlap => combined ~= max(compute, upload); none => sum.

    python tools/probe_h2d_overlap.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def main():
    rng = np.random.RandomState(0)
    video = np.asarray(rng.rand(30, 640, 960, 3) * 255, np.uint8)  # 55 MB

    n = 4096
    a = jnp.asarray(rng.rand(n, n), jnp.bfloat16)

    @jax.jit
    def step(x):
        for _ in range(90):  # ~80 ms/dispatch -> ~2.5 s over 30 dispatches
            x = (x @ x) * 1e-3
        return x

    out = step(a)
    sync(out)

    N = 30

    def compute():
        x = a
        for _ in range(N):
            x = step(x)
        return x

    t0 = time.perf_counter(); sync(compute()); t_c = time.perf_counter() - t0
    log(f"compute ({N} dispatches)      : {t_c*1e3:7.0f} ms")

    t0 = time.perf_counter()
    d = jax.device_put(video)
    t_put = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(d); t_psync = time.perf_counter() - t0
    log(f"upload 55MB: put() blocks host {t_put*1e3:7.0f} ms; +sync {t_psync*1e3:7.0f} ms")
    t_u = t_put + t_psync
    del d

    t0 = time.perf_counter()
    d = jax.device_put(video); x = compute(); sync(x); sync(d)
    t_uc = time.perf_counter() - t0
    log(f"upload -> compute            : {t_uc*1e3:7.0f} ms  (sum {1e3*(t_c+t_u):.0f}, max {1e3*max(t_c,t_u):.0f})")
    del d

    t0 = time.perf_counter()
    x = compute(); d = jax.device_put(video); sync(x); sync(d)
    t_cu = time.perf_counter() - t0
    log(f"compute -> upload            : {t_cu*1e3:7.0f} ms")
    del d

    box = {}
    def worker():
        box["d"] = jax.device_put(video)
    t0 = time.perf_counter()
    th = threading.Thread(target=worker)
    x = a
    for i in range(N):
        x = step(x)
        if i == 2:
            th.start()
    th.join(); sync(x); sync(box["d"])
    t_th = time.perf_counter() - t0
    log(f"threaded mid-compute         : {t_th*1e3:7.0f} ms")
    del box["d"]

    chunks = np.array_split(video, 8)
    t0 = time.perf_counter()
    x = a; devs = []
    for i in range(N):
        x = step(x)
        if i % 4 == 1 and len(devs) < 8:
            devs.append(jax.device_put(chunks[len(devs)]))
    while len(devs) < 8:
        devs.append(jax.device_put(chunks[len(devs)]))
    sync(x)
    for d in devs:
        sync(d)
    t_ch = time.perf_counter() - t0
    log(f"chunked x8 interleaved       : {t_ch*1e3:7.0f} ms")


if __name__ == "__main__":
    main()
