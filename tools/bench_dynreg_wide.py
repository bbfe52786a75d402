"""Timed comparison: sequential vs parallel dynreg column moves as p
grows (VERDICT r3 item 4 — 'sublinear-in-p wall growth'). Run on TPU:
PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_dynreg_wide.py
"""
import time, sys, jax, jax.numpy as jnp
from boom_tpu.statespace.dynreg import SparseDynamicRegression

def timed_model(style, p, t_len=500, n=4, sweeps=20):
    kx, ky, kf = jax.random.split(jax.random.key(p), 3)
    x = jax.random.normal(kx, (t_len, n, p))
    beta0 = jnp.zeros((p,)).at[0].set(1.5).at[1].set(-1.0)
    y = jnp.einsum("tnp,p->tn", x, beta0) + 0.5*jax.random.normal(ky,(t_len,n))
    m = SparseDynamicRegression(x=x, y=y, column_move_style=style)
    kern = m.kernel()
    @jax.jit
    def run(key, st):
        def step(c, k): return kern(k, c), None
        return jax.lax.scan(step, st, jax.random.split(key, sweeps))[0]
    st = m.init_state(kf)
    out = run(jax.random.key(1), st); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0=time.time(); out = run(jax.random.key(2), st); jax.block_until_ready(out)
        best=min(best, time.time()-t0)
    return best/sweeps*1e3

for p in (32, 64, 128, 256, 512):
    tp = timed_model("parallel", p)
    ts = timed_model("sequential", p) if p <= 128 else float("nan")
    print(f"p={p:4d}: parallel {tp:8.1f} ms/sweep   sequential {ts:8.1f} ms/sweep")
    sys.stdout.flush()
