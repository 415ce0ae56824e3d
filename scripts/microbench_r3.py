#!/usr/bin/env python
"""Presence-expansion variants for the grouped query path (on chip).

The round-2 split showed grouped = 0.33 ms gather + ~0.86 ms presence
expansion + 0.16 ms csa.  The presence masked-reduce runs on thin
[.., TR=32, W=32] shapes (25% lane use) and XLA materializes the
[B,U,R,TR,W] masked intermediate (~600 MB).  Variants:

  v1 — current: thin masked reduce (baseline)
  v2 — thin fold: unrolled running AND over TR (no big intermediate)
  v3 — fat reinterpret: tiles [.., 1024] viewed as [.., 8, 128]
       (row = 4j + l//32, word = l%32), reduce 8 sublanes + roll(32)
       + roll(64); counts accumulated in twisted order
  v4 — v3 with csa over the twisted [B, U*R, 128] planes

Usage: python scripts/microbench_r3.py [v1 v2 v3 ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import build_grouped_streams, csa_counts

M = 25_000_000
W = 32
TR = 32
T = M // TR
B, K, H, RUN = 256, 512, 3, 6
CHAIN = 9
REPEATS = 3


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


def marginal(make):
    t1 = timed(*make(1))
    tn = timed(*make(CHAIN))
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def scan_chain(body_fn, args):
    def make(nsteps):
        @jax.jit
        def f(*a):
            def body(carry, _):
                return body_fn(carry, *a), ()
            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)
        return f, args
    return make


def report(name, dt, extra=""):
    rows = B * K * H
    print("%-30s %9.3f ms  %8.1f Mrows/s  %s"
          % (name, dt * 1e3, rows / dt / 1e6, extra), flush=True)


def main():
    which = set(sys.argv[1:]) or {"v1", "v2", "v3", "v4"}
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    tiles = jax.jit(
        lambda key: jax.random.bits(key, (T, TR * W), jnp.uint32), device=dev
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    nt = (B * K + RUN - 1) // RUN
    base = rng.integers(0, T, size=nt).astype(np.int32)
    tile_ids = np.repeat(base, RUN)[: B * K].reshape(B, K)
    slots = rng.integers(0, TR, size=(B, K, H)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    utile, gmask = build_grouped_streams(tile_ids, smask, r=RUN)
    u = utile.shape[1]
    utile_d, gmask_d = jnp.asarray(utile), jnp.asarray(gmask)
    print("U=%d fetches=%d" % (u, B * u), flush=True)

    ones = jnp.uint32(0xFFFFFFFF)

    if "v1" in which:
        def v1(carry, tiles, ut, gm):
            g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
            g = g.reshape(B, u, TR, W)
            rowbit = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, TR, 1), 3)
            sel = (gm[:, :, :, None, None] >> rowbit) & jnp.uint32(1)
            masked = g[:, :, None, :, :] | (sel - jnp.uint32(1))
            p = jax.lax.reduce(masked, ones, jax.lax.bitwise_and, (3,))
            valid = (gm != 0)[..., None]
            rows = jnp.where(valid, p, jnp.uint32(0)).reshape(B, u * RUN, W)
            c = csa_counts(rows, axis=1)
            return (c[0, 0] & jnp.int32(7)) + 1

        report("v1 thin masked reduce",
               marginal(scan_chain(v1, (tiles, utile_d, gmask_d))))

    if "v2" in which:
        def v2(carry, tiles, ut, gm):
            g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
            g = g.reshape(B, u, TR, W)
            acc = None
            for row in range(TR):
                sel = (gm >> jnp.uint32(row)) & jnp.uint32(1)  # [B,U,R]
                m = g[:, :, row, :][:, :, None, :] | (sel[..., None] - 1)
                acc = m if acc is None else (acc & m)
            valid = (gm != 0)[..., None]
            rows = jnp.where(valid, acc, jnp.uint32(0)).reshape(B, u * RUN, W)
            c = csa_counts(rows, axis=1)
            return (c[0, 0] & jnp.int32(7)) + 1

        report("v2 thin fold over TR",
               marginal(scan_chain(v2, (tiles, utile_d, gmask_d))))

    if "v3" in which or "v4" in which:
        # fat reinterpretation: [.., 1024] IS [.., 8, 128] with
        # row(j,l) = 4j + l//32; presence word l%32 in quadrant l//32
        sub = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, 8, 128), 3)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, 8, 128), 4)
        riot_c = 4 * sub + lane // 32

        def fat_presence(carry, tiles, ut, gm):
            g = jnp.take(tiles, ((ut + carry) % T).reshape(-1), axis=0)
            g = g.reshape(B, u, 1, 8, 128)
            sel = (gm[:, :, :, None, None] >> riot_c) & jnp.uint32(1)
            masked = g | (sel - jnp.uint32(1))  # [B,U,R,8,128]
            red = jax.lax.reduce(masked, ones, jax.lax.bitwise_and, (3,))
            red = red & jnp.roll(red, 32, axis=-1)
            red = red & jnp.roll(red, 64, axis=-1)  # [B,U,R,128] x4 quad
            return red

        if "v3" in which:
            def v3(carry, tiles, ut, gm):
                red = fat_presence(carry, tiles, ut, gm)
                # unpack-accumulate: bits at (j,l) = sample 32*(l%32)+j+8*(l//32)
                shiftg = (
                    jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 8, 128), 2)
                    + 8 * (jax.lax.broadcasted_iota(
                        jnp.uint32, (1, 1, 8, 128), 3) // 32)
                )
                valid = jnp.where(gm != 0, ones, jnp.uint32(0))[..., None, None]
                bits = ((red[:, :, :, None, :] >> shiftg[:, None])
                        & jnp.uint32(1) & valid)
                c = jnp.sum(bits.astype(jnp.int32), axis=(1, 2))  # [B,8,128]
                return (c[0, 0, 0] & jnp.int32(7)) + 1

            report("v3 fat + unpack-sum",
                   marginal(scan_chain(v3, (tiles, utile_d, gmask_d))))

        if "v4" in which:
            def v4(carry, tiles, ut, gm):
                red = fat_presence(carry, tiles, ut, gm)
                valid = jnp.where(gm != 0, ones, jnp.uint32(0))[..., None]
                rows = (red & valid).reshape(B, u * RUN, 128)
                c = csa_counts(rows, axis=1)  # twisted order, [B, 128*32]
                return (c[0, 0] & jnp.int32(7)) + 1

            report("v4 fat + csa (twisted)",
                   marginal(scan_chain(v4, (tiles, utile_d, gmask_d))))


if __name__ == "__main__":
    main()
