"""Measure the VPU-elementwise vs MXU-dot crossover for the Kalman
[d, d] products under a chain vmap (sets kalman._MXU_DISPATCH_D).

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_mm_crossover.py
"""

import time

import jax
import jax.numpy as jnp


def _elem(a, b):
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _dot(a, b):
    return jnp.matmul(a, b, precision="highest")


def bench(fn, chains, d, steps=64, reps=5):
    key = jax.random.key(0)
    a = jax.random.normal(key, (chains, d, d), jnp.float32) * 0.1

    @jax.jit
    def run(a):
        def body(x, _):
            return fn(x, a) * 0.99, None

        out, _ = jax.lax.scan(body, a, None, length=steps)
        return out

    out = run(a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(a))
        best = min(best, time.time() - t0)
    return best


if __name__ == "__main__":
    print("devices:", jax.devices())
    for chains in (256, 2048, 8192):
        print(f"--- chains={chains} ---")
        for d in (2, 4, 8, 16, 24, 32, 48, 64, 96):
            te = bench(_elem, chains, d)
            td = bench(_dot, chains, d)
            win = "elem" if te < td else "DOT"
            print(f"d={d:3d}: elem {te*1e3:8.2f}ms dot {td*1e3:8.2f}ms"
                  f" -> {win}")
