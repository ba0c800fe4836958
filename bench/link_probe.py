"""Probe h2d/d2h bandwidth of the device link vs sub-buffer layout.

The axon relay parallelizes across in-flight buffers; this measures the
aggregate rate for a 64MB payload split into various sub-buffer sizes,
both directions, to pick MHC_D2H_SUB_MB / h2d strategy.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

MB = 1 << 20
TOTAL = int(sys.argv[1]) * MB if len(sys.argv) > 1 else 64 * MB

host = np.random.default_rng(0).integers(0, 256, TOTAL, np.uint8)

# warm up backend
jax.block_until_ready(jnp.zeros(8) + 1)


def bench_d2h(sub_mb: float):
    n = max(1, int(TOTAL / (sub_mb * MB)))
    dev = jnp.asarray(host)
    jax.block_until_ready(dev)
    subs = [jax.lax.slice(dev, (i * (TOTAL // n),), ((i + 1) * (TOTAL // n),))
            for i in range(n)]
    jax.block_until_ready(subs)
    t0 = time.perf_counter()
    for s in subs:
        s.copy_to_host_async()
    outs = [np.asarray(s) for s in subs]
    dt = time.perf_counter() - t0
    del outs
    return TOTAL / dt / 1e6


def bench_h2d(sub_mb: float):
    n = max(1, int(TOTAL / (sub_mb * MB)))
    parts = np.split(host, n)
    t0 = time.perf_counter()
    devs = [jax.device_put(p) for p in parts]
    jax.block_until_ready(devs)
    dt = time.perf_counter() - t0
    del devs
    return TOTAL / dt / 1e6


print(f"device={jax.devices()[0]}, total={TOTAL // MB}MB", flush=True)
for sub in (64, 16, 8, 4, 2, 1, 0.5, 0.25):
    if sub * MB > TOTAL:
        continue
    d = bench_d2h(sub)
    h = bench_h2d(sub)
    print(f"sub={sub:6}MB  d2h={d:8.1f} MB/s  h2d={h:8.1f} MB/s", flush=True)


def bench_duplex(sub_mb: float = 2):
    """Concurrent h2d + d2h: is the relay full-duplex?"""
    n = max(1, int(TOTAL / (sub_mb * MB)))
    dev = jnp.asarray(host)
    jax.block_until_ready(dev)
    subs = [jax.lax.slice(dev, (i * (TOTAL // n),), ((i + 1) * (TOTAL // n),))
            for i in range(n)]
    jax.block_until_ready(subs)
    parts = np.split(host, n)
    t0 = time.perf_counter()
    for s in subs:
        s.copy_to_host_async()
    devs = [jax.device_put(p) for p in parts]
    outs = [np.asarray(s) for s in subs]
    jax.block_until_ready(devs)
    dt = time.perf_counter() - t0
    del outs, devs
    return 2 * TOTAL / dt / 1e6


def bench_compute_overlap(sub_mb: float = 2):
    """d2h while a big matmul chain runs: does compute hide transfers?"""
    n = max(1, int(TOTAL / (sub_mb * MB)))
    dev = jnp.asarray(host)
    jax.block_until_ready(dev)
    subs = [jax.lax.slice(dev, (i * (TOTAL // n),), ((i + 1) * (TOTAL // n),))
            for i in range(n)]
    jax.block_until_ready(subs)
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(a):
        for _ in range(60):
            a = a @ a * 1e-3
        return a
    r = burn(a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = burn(a)
    jax.block_until_ready(r)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = burn(a)
    for s in subs:
        s.copy_to_host_async()
    outs = [np.asarray(s) for s in subs]
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    del outs
    return tc, dt, TOTAL / dt / 1e6


print("duplex (2*total moved):", round(bench_duplex(), 1), "MB/s agg", flush=True)
tc, dt, rate = bench_compute_overlap()
print(f"compute alone {tc:.2f}s; compute+d2h {dt:.2f}s ({rate:.1f} MB/s eff)",
      flush=True)
