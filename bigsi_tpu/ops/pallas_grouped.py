"""Grouped-query Pallas kernel v2: prefetch-gathered tiles, packed CSA.

Replaces the XLA grouped path's three cost centers (measured on chip,
scripts/microbench_r2/_r5/_r6.py, docs/DESIGN.md round-2 table):

* the XLA gather MATERIALIZES the gathered tiles (~0.3 ms per step at
  100 MB) — here tiles are fetched straight into VMEM blocks by the
  Mosaic pipeline, indexed from a scalar-prefetch stream
  (``PrefetchScalarGridSpec``: each grid step's E tile blocks come from
  ``utile[...]`` via BlockSpec index_maps — no manual DMA, no
  semaphores);
* XLA re-reads every gathered tile from HBM once per k-mer slot
  (R x ~100 MB) — here each tile is read once into VMEM and all R
  slot masks consume it there;
* per-slot unpack-accumulate costs ~32x the packed-domain work — here
  presence rows accumulate through a carry-save adder in PACKED form
  (5 full-adder ops per row) and only the ~log2(E*R) final planes are
  unpacked, once per grid step.

Layout: a 32-row tile of W=32 words is one fat [8, 128] block — lane l
of sublane j holds tile row ``4j + l//32``, word ``l % 32`` (the raw
[m, W] row-major bytes reinterpreted, no repacking).  Presence reduce =
7 sublane ANDs + lane rolls by 32/64; counts land "twisted"
(sample ``32*(l%32) + j + 8*(l//32)`` at position (j, l)) and are
untwisted once per batch by a tiny XLA take.

Constraints: W == 32 (1024-sample shards), E | U, entries of one query
contiguous (guaranteed by build_grouped_streams' [B, U] layout).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bigsi_tpu.ops.pallas_lookup import SUBLANES, LANES, untwist_permutation

TRW = 32 * 32  # uint32 words per tile (32 rows x W=32)
ENTRIES = 16   # tile blocks fetched per grid step


def _csa_push(planes: list, row):
    """Add a 1-bit packed row into a list of carry-save planes."""
    carry = row
    out = []
    for p in planes:
        out.append(p ^ carry)
        carry = p & carry
    out.append(carry)
    return out


def _csa_merge(a: list, b: list):
    """Bignum add of two plane lists (LSB first)."""
    out = []
    carry = None
    for i in range(max(len(a), len(b))):
        terms = [t for t in (
            a[i] if i < len(a) else None,
            b[i] if i < len(b) else None,
            carry,
        ) if t is not None]
        if len(terms) == 1:
            out.append(terms[0])
            carry = None
        elif len(terms) == 2:
            out.append(terms[0] ^ terms[1])
            carry = terms[0] & terms[1]
        else:
            s = terms[0] ^ terms[1]
            out.append(s ^ terms[2])
            carry = (terms[0] & terms[1]) | (s & terms[2])
    if carry is not None:
        out.append(carry)
    return out


def _kernel(utile_ref, gmask_ref, *refs, e, r, steps_per_query):
    tile_refs = refs[:e]
    counts_ref, exact_ref = refs[e], refs[e + 1]

    i = pl.program_id(0)

    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, SUBLANES, LANES), 2)
    riot = (4 * sub + lane // 32)[0]          # [8,128] tile row at (j,l)
    shiftg = (sub + 8 * (lane // 32))[0]      # [8,128] sample bit at (j,l)
    ones = jnp.uint32(0xFFFFFFFF)

    # one [E, 8, 128] value: E tiles fetched by the pipeline this step
    g = jnp.stack([tr[0] for tr in tile_refs])

    planes: list = []
    eacc = jnp.full((1, LANES), ones, jnp.uint32)
    for slot in range(r):
        gm = gmask_ref[:, slot]  # [E]
        sel = (gm[:, None, None] >> riot[None]) & jnp.uint32(1)
        masked = g | (sel - jnp.uint32(1))          # [E, 8, 128]
        red = masked[:, 0, :]
        for j in range(1, SUBLANES):
            red = red & masked[:, j, :]             # [E, 128]
        red = red & pltpu.roll(red, 32, axis=1)
        red = red & pltpu.roll(red, 64, axis=1)     # quadrant-replicated
        valid = jnp.where(gm != 0, ones, jnp.uint32(0))[:, None]
        planes = _csa_push(planes, red & valid)     # counts, packed domain
        ev = jnp.where(valid != 0, red, ones)
        e2 = ev
        n = e
        while n > 1:
            e2 = e2[: n // 2] & e2[n // 2:]
            n //= 2
        eacc = eacc & e2                            # [1,128]

    # fold the E axis of each plane: bignum add of halves, log2(E) levels
    width = e
    while width > 1:
        half = width // 2
        planes = _csa_merge(
            [p[:half] for p in planes], [p[half:] for p in planes]
        )
        width = half

    contrib = jnp.zeros((SUBLANES, LANES), jnp.int32)
    for p_i, p in enumerate(planes):
        bits = (jnp.broadcast_to(p.reshape(1, LANES), (SUBLANES, LANES))
                >> shiftg) & jnp.uint32(1)
        contrib = contrib + (bits.astype(jnp.int32) << p_i)

    first = (i % steps_per_query) == 0

    @pl.when(first)
    def _():
        counts_ref[0] = contrib
        exact_ref[0] = eacc

    @pl.when(jnp.logical_not(first))
    def _():
        counts_ref[0] += contrib
        exact_ref[0] &= eacc


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_fused_v2(tiles, utile, gmask, interpret=None):
    """tiles uint32[T, 1024] (W==32), utile int32[B, U], gmask
    uint32[B, U, R] -> (counts int32[B, 1024], exact uint32[B, 32])."""
    b, u = utile.shape
    r = gmask.shape[2]
    e = ENTRIES
    assert u % e == 0, "U must be a multiple of %d" % e
    steps = (b * u) // e
    steps_per_query = u // e
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    tile_specs = [
        pl.BlockSpec(
            (1, SUBLANES, LANES), functools.partial(_tile_index, j=j, e=e)
        )
        for j in range(e)
    ]
    tiles3 = tiles.reshape(tiles.shape[0], SUBLANES, LANES)
    counts_t, exact_t = pl.pallas_call(
        functools.partial(_kernel, e=e, r=r,
                          steps_per_query=steps_per_query),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((e, r), lambda i, pref: (i, 0)),
                *tile_specs,
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, SUBLANES, LANES),
                    lambda i, pref, spq=steps_per_query: (i // spq, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, LANES),
                    lambda i, pref, spq=steps_per_query: (i // spq, 0, 0),
                ),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.uint32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        utile.reshape(-1),
        gmask.reshape(b * u, r),
        *([tiles3] * e),
    )
    perm = jnp.asarray(untwist_permutation())
    counts = jnp.take(counts_t.reshape(b, SUBLANES * LANES), perm, axis=1)
    exact_words = exact_t[:, 0, :32]
    return counts, exact_words


def _tile_index(i, pref, *, j, e):
    return (pref[i * e + j], 0, 0)
