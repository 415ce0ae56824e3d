#!/usr/bin/env python
"""On-chip correctness + speed of grouped_fused_v2 at the bench shape."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bigsi_tpu.ops.lookup import build_grouped_streams, grouped_counts
from bigsi_tpu.ops.pallas_grouped import grouped_fused_v2

M, W, TR = 25_000_000, 32, 32
T = M // TR
B, K, H, RUN = 256, 512, 3, 6
CHAIN, REPEATS = 9, 3
dev = jax.devices()[0]
print("device:", dev, flush=True)
tiles = jax.jit(lambda k: jax.random.bits(k, (T, TR*W), jnp.uint32), device=dev)(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
nt = (B*K + RUN - 1)//RUN
tile_ids = np.repeat(rng.integers(0, T, size=nt).astype(np.int32), RUN)[:B*K].reshape(B, K)
slots = rng.integers(0, TR, size=(B, K, H)).astype(np.uint32)
smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
utile, gmask = build_grouped_streams(tile_ids, smask, r=RUN)
u = utile.shape[1]
ut, gm = jnp.asarray(utile), jnp.asarray(gmask)
print("U=%d fetches=%d" % (u, B*u), flush=True)

c_ref = np.asarray(grouped_counts(tiles, ut, gm))
c_new, e_new = grouped_fused_v2(tiles, ut, gm)
assert np.array_equal(np.asarray(c_new), c_ref), "ON-CHIP MISMATCH"
print("on-chip BIT-EXACT", flush=True)

def timed(fn, args):
    out = fn(*args); np.asarray(out)[0]
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter(); out = fn(*args); np.asarray(out)[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)

def mk(nsteps):
    @jax.jit
    def f(tiles, ut, gm):
        def body(carry, _):
            c, e = grouped_fused_v2(tiles, (ut + carry) % T, gm)
            return (c[0, 0] & jnp.int32(7)) + 1, ()
        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
        return carry.reshape(1)
    return f, (tiles, ut, gm)

t1 = timed(*mk(1)); tn = timed(*mk(CHAIN))
dt = max((tn - t1)/(CHAIN-1), 1e-9)
print("grouped_fused_v2: %.3f ms/step -> %.1f Mrows/s" % (dt*1e3, B*K*H/dt/1e6), flush=True)
