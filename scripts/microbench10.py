#!/usr/bin/env python
"""Cut the fat-layout expansion cost: hoist the selection mask.

microbench9: at run length 12 the tile gather is ~0.12 ms and the
expansion ~0.9 ms.  The expansion's AND/OR is only ~300M lane-ops
(~0.1 ms); the rest is computing sel per [B,U,R,8,128] element
(iota, shift, and, sub).  Hoist it: compute the word-level mask on a
[B,U,R,8,4] tensor (one uint32 per tile word) and broadcast across the
32 lanes inside the fusion.

Variants (all on sorted run-length-12 streams):
  * fatcsa   — microbench8 baseline;
  * hoist    — hoisted word mask + lax.reduce over fat rows;
  * hoistun  — hoisted word mask + unrolled 8-row AND chain.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import TILE_ROWS, csa_counts
from scripts.microbench8 import grouped_fatcsa, to_fat, marginal
from scripts.microbench9 import make_inputs, B, K, H, W, T


def _wordmask(gmask, f, g):
    """gmask uint32[B,U,R] -> arithmetic mask uint32[B,U,R,f,g]:
    0 where tile row (gi*f + fi) is selected, all-ones otherwise."""
    fi = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, f, g), 3)
    gi = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, f, g), 4)
    rowid = gi * jnp.uint32(f) + fi
    return ((gmask[:, :, :, None, None] >> rowid) & jnp.uint32(1)) - jnp.uint32(1)


def fat_hoist(tiles_fat, utile, gmask, w, unroll=False):
    b, u = utile.shape
    r = gmask.shape[2]
    g = 128 // w
    f = TILE_ROWS // g
    gt = jnp.take(tiles_fat, utile.reshape(-1), axis=0).reshape(b, u, f, g, w)
    wm = _wordmask(gmask, f, g)[..., None]  # [b,u,r,f,g,1]
    if unroll:
        acc = gt[:, :, None, 0] | wm[:, :, :, 0]
        for j in range(1, f):
            acc = acc & (gt[:, :, None, j] | wm[:, :, :, j])
        part = acc  # [b,u,r,g,w]
    else:
        masked = gt[:, :, None] | wm  # [b,u,r,f,g,w]
        part = jax.lax.reduce(
            masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
        )
    presence = jax.lax.reduce(
        part, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
    )  # [b,u,r,w]
    valid = (gmask != 0)[..., None]
    rows = jnp.where(valid, presence, jnp.uint32(0)).reshape(b, u * r, w)
    n = rows.shape[1]
    pad = (-n) % g
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
    wide = rows.reshape(b, (n + pad) // g, g * w)
    counts = csa_counts(wide, axis=1)
    return counts.reshape(b, g, w * 32).sum(axis=1)


def bench(name, fn, args, rows):
    def make(nsteps):
        @jax.jit
        def f(*a):
            def body(carry, _):
                u2 = (a[1] + carry) % T
                out = fn(a[0], u2, *a[2:])
                return (out.reshape(-1)[0] & jnp.int32(7)) + 1, ()

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return c.reshape(1)

        return f, args

    dt = marginal(make)
    print(
        "%-10s %8.3f ms/step  %8.1f Mrows/s"
        % (name, dt * 1e3, rows / dt / 1e6),
        flush=True,
    )


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, TILE_ROWS * W), jnp.uint32),
        device=dev,
    )(jax.random.PRNGKey(0))
    tiles_fat = jax.jit(to_fat, device=dev)(tiles)
    rows = B * K * H

    u12, g12 = make_inputs(np.random.default_rng(3), 12, 12, sort=True)

    # verify at tiny shapes
    vt = 64
    uv, gv = make_inputs(np.random.default_rng(1), 12, 12)
    uv = uv % vt
    small_fat = np.asarray(to_fat(tiles[:vt]))
    ref = np.asarray(
        grouped_fatcsa(jnp.asarray(small_fat), jnp.asarray(uv), jnp.asarray(gv), W)
    )
    for unroll in (False, True):
        got = np.asarray(
            fat_hoist(
                jnp.asarray(small_fat), jnp.asarray(uv), jnp.asarray(gv), W,
                unroll=unroll,
            )
        )
        assert (ref == got).all(), "hoist mismatch (unroll=%s)" % unroll
    print("verify OK", flush=True)

    put = lambda *a: [jax.device_put(x, dev) for x in a]
    bench("fatcsa", lambda t, u, g: grouped_fatcsa(t, u, g, W),
          put(tiles_fat, u12, g12), rows)
    bench("hoist", lambda t, u, g: fat_hoist(t, u, g, W),
          put(tiles_fat, u12, g12), rows)
    bench("hoistun", lambda t, u, g: fat_hoist(t, u, g, W, unroll=True),
          put(tiles_fat, u12, g12), rows)


if __name__ == "__main__":
    main()
