#!/usr/bin/env python
"""Does index locality change gather throughput?

Hypothesis test for the next headline jump: random tile fetches issue
at ~33 M/s; if SORTED indices gather faster (HBM row-buffer locality /
coalescing), a sort-then-gather query path beats the random-gather wall.

Cases over a tile-major matrix uint32[T, 32*W] (one fat row per tile):
  random        — uniform random tile ids
  sorted        — the same ids, sorted ascending
  clustered     — random ids confined to a 1/64 slice of the matrix
  sequential    — iota (pure streaming)
Also times a device-side sort of the ids, to price sort-then-gather.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

REPEATS = 3
CHAIN = 9


def marginal(make):
    def timed(fn, args):
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
    fn_, an = make(CHAIN)
    t1 = timed(f1, a1)
    tn = timed(fn_, an)
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 512_000
    T = M // 32
    W = 32
    R = 131072  # fetches per step (256 queries x 512 kmers, 1 tile each)

    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, 32 * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    cases = {
        "random": rng.integers(0, T, size=R).astype(np.int32),
        "clustered": rng.integers(0, T // 64, size=R).astype(np.int32),
        "sequential": (np.arange(R, dtype=np.int64) % T).astype(np.int32),
    }
    cases["sorted"] = np.sort(cases["random"])

    for name, idx_np in cases.items():
        idx = jax.device_put(idx_np, dev)

        def make(nsteps, idx=idx):
            @jax.jit
            def f(tiles, idx):
                def body(carry, _):
                    i2 = (idx + carry) % T
                    g = jnp.take(tiles, i2, axis=0)
                    s = g[:, 0].astype(jnp.int32).sum()
                    return (s & jnp.int32(7)) + 1, ()

                carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
                return carry.reshape(1)

            return f, (tiles, idx)

        dt = marginal(make)
        print(
            "%-10s: %8.3f ms/step -> %6.1f Mfetch/s (%5.1f GB/s)"
            % (name, dt * 1e3, R / dt / 1e6, R * 32 * W * 4 / dt / 1e9)
        )

    # price a device sort of R int32 ids
    idx = jax.device_put(cases["random"], dev)

    def make_sort(nsteps):
        @jax.jit
        def f(idx):
            def body(carry, _):
                s = jnp.sort((idx + carry) % T)
                return (s[0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (idx,)

    dt = marginal(make_sort)
    print("sort %d ids: %8.3f ms/step" % (R, dt * 1e3))


if __name__ == "__main__":
    main()
