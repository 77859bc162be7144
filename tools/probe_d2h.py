"""Probe: axon-tunnel D2H transfer behavior.

probe_driver measured 138 MB fp16 windows draining at 0.02-0.035 GB/s.
This isolates the link: single big asarray vs chunked vs chunked with
copy_to_host_async pre-issued, and dtype dependence (fp16 vs uint8),
to find whether the tunnel pipelines concurrent transfers.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_d2h.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def main():
    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.rand(60, 30, 160, 240).astype(np.float16))
    float(jnp.sum(big[0, 0, 0]))  # sync
    nbytes = big.size * 2

    for name, fn in [
        ("single asarray", lambda a: np.asarray(a)),
        ("device_get", lambda a: jax.device_get(a)),
    ]:
        t0 = time.perf_counter()
        _ = fn(big)
        dt = time.perf_counter() - t0
        log(f"{name:28s}: {dt*1e3:7.0f} ms  ({nbytes/dt/1e9:.3f} GB/s)")

    for nch in (4, 8, 16):
        chunks = [big[i::nch] for i in range(nch)]
        for c in chunks:
            float(jnp.sum(c[0, 0, 0]))
        t0 = time.perf_counter()
        outs = [np.asarray(c) for c in chunks]
        dt = time.perf_counter() - t0
        log(f"chunked x{nch:2d} sequential     : {dt*1e3:7.0f} ms  ({nbytes/dt/1e9:.3f} GB/s)")

        t0 = time.perf_counter()
        ok = True
        try:
            for c in chunks:
                c.copy_to_host_async()
        except Exception as e:
            ok = False
            log(f"  copy_to_host_async unsupported: {type(e).__name__}: {str(e)[:80]}")
        if ok:
            outs = [np.asarray(c) for c in chunks]
            dt = time.perf_counter() - t0
            log(f"chunked x{nch:2d} async-preissue  : {dt*1e3:7.0f} ms  ({nbytes/dt/1e9:.3f} GB/s)")

    # dtype dependence at same byte count
    u8 = jnp.asarray(rng.randint(0, 255, (60, 30, 160, 480), np.uint8))
    float(jnp.sum(u8[0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    _ = np.asarray(u8)
    dt = time.perf_counter() - t0
    log(f"uint8 same bytes            : {dt*1e3:7.0f} ms  ({u8.size/dt/1e9:.3f} GB/s)")

    # small-transfer latency (per-transfer overhead)
    small = jnp.asarray(rng.rand(64, 64).astype(np.float32))
    float(jnp.sum(small))
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(small)
    dt = (time.perf_counter() - t0) / 20
    log(f"16KB transfer latency       : {dt*1e3:7.2f} ms")

    # does a transfer overlap with device compute? dispatch a long matmul
    # chain, then immediately asarray the big buffer
    a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(a):
        for _ in range(60):
            a = a @ a / jnp.float32(70.0)
        return a

    r = burn(a)
    float(jnp.sum(r[0, :4]))
    t0 = time.perf_counter()
    r = burn(a)
    float(jnp.sum(r[0, :4]))
    t_burn = time.perf_counter() - t0
    log(f"burn alone                  : {t_burn*1e3:7.0f} ms")

    t0 = time.perf_counter()
    r = burn(a)
    h = np.asarray(big)
    float(jnp.sum(r[0, :4]))
    t_both = time.perf_counter() - t0
    t_drain = nbytes / 0.025e9
    log(f"burn + drain interleaved    : {t_both*1e3:7.0f} ms  "
        f"(sum would be ~{(t_burn + t_drain)*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
