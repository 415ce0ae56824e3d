#!/usr/bin/env python
"""Time the fused Pallas query kernel on the real chip.

Cases: random tiles (dedup is identity) vs minimizer-style runs
(~RUN kmers share each tile -> ~RUN x fewer DMAs).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.pallas_lookup import build_chunk_streams, fused_query

REPEATS = 3


def timed(fn, args):
    out = fn(*args)
    np.asarray(out[0].reshape(-1)[0])
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0].reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 512_000
    T = M // 32
    B = 256 if on_tpu else 2
    K = 512 if on_tpu else 64
    H = 3
    NSTEPS = 9

    tiles_fat = jax.jit(
        lambda key: jax.random.bits(key, (T * 8, 128), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    for name, run in (("random", 1), ("minimizer~6", 6)):
        nt = (B * K + run - 1) // run
        base = rng.integers(0, T, size=nt).astype(np.int32)
        tile = np.repeat(base, run)[: B * K].reshape(B, K)
        slots = rng.integers(0, 32, size=(B, K, H)).astype(np.uint32)
        smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
        n_unique, utile, uslot, slotidx = build_chunk_streams(tile, smask)
        args0 = [jnp.asarray(x) for x in
                 (n_unique, utile, uslot, smask.reshape(-1), slotidx)]

        def make(nsteps):
            @jax.jit
            def f(tiles_fat, nu, ut, us, sm, si):
                def body(i, carry):
                    c, e = fused_query(
                        tiles_fat, nu, (ut + i) % T, us, sm, si, b=B, k=K
                    )
                    return carry + c.sum(dtype=jnp.uint32)

                return jax.lax.fori_loop(0, nsteps, body, jnp.uint32(0)).reshape(1)

            return f, (tiles_fat, *args0)

        try:
            def timed1(fn, args):
                out = fn(*args)
                np.asarray(out)[0]
                ts = []
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    out = fn(*args)
                    np.asarray(out)[0]
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            f1, a1 = make(1)
            fn_, an = make(NSTEPS)
            t1 = timed1(f1, a1)
            tn = timed1(fn_, an)
            dt = max((tn - t1) / (NSTEPS - 1), 1e-9)
            rows = B * K * H
            print(
                "%-12s: %8.3f ms/step -> %7.1f Mrows/s, %6.0f queries/s"
                % (name, dt * 1e3, rows / dt / 1e6, B / dt)
            )
        except Exception as e:
            print("%s failed: %s %s" % (name, type(e).__name__, str(e)[:300]))


if __name__ == "__main__":
    main()
