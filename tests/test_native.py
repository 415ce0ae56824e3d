"""Native C++ host runtime: bit-exact parity with the numpy oracles."""

import numpy as np
import pytest

from bigsi_tpu import native
from bigsi_tpu.hashing.murmur3 import murmur3_32, murmur3_32_batch
from bigsi_tpu.io.cortex import decode_kmers
from bigsi_tpu.kmers import canonicalize_kmer_matrix
from bigsi_tpu.matrix.bitmatrix import transpose_blooms
from bigsi_tpu.matrix.packing import unpack_bits_lsb

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def rand_kmers(rng, K, k):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(K, k))


def test_native_hash_parity():
    rng = np.random.default_rng(0)
    kmers = rand_kmers(rng, 200, 31)
    for m in (25, 1000, 25_000_000):
        out = native.hash_kmer_batch(kmers, 3, m)
        seeds = np.arange(3, dtype=np.uint32)
        expect = np.mod(murmur3_32_batch(kmers, seeds).astype(np.int64), m)
        assert np.array_equal(out, expect)


def test_native_scalar_hash():
    import ctypes

    lib = native._load()
    for key in (b"ATT", b"GATTACA", b"A" * 31):
        for seed in (0, 1, 42):
            got = lib.murmur3_32(key, len(key), seed)
            expect = murmur3_32(key, seed) & 0xFFFFFFFF
            assert got == expect


def test_native_bloom_insert():
    rng = np.random.default_rng(1)
    kmers = rand_kmers(rng, 100, 31)
    m = 10000
    bloom = np.zeros(m, dtype=np.uint8)
    assert native.bloom_insert_batch(kmers, 3, m, bloom)
    expect = np.zeros(m, dtype=bool)
    idx = native.hash_kmer_batch(kmers, 3, m)
    expect[idx.ravel()] = True
    assert np.array_equal(bloom.astype(bool), expect)


def test_native_transpose_parity():
    rng = np.random.default_rng(2)
    blooms = [(rng.random(300) < 0.4) for _ in range(70)]
    expect = transpose_blooms(blooms, 300)
    out = native.transpose_blooms(blooms, 300, expect.shape[1])
    assert np.array_equal(out, expect)


def test_native_cortex_decode_parity():
    rng = np.random.default_rng(3)
    packed = rng.integers(0, 2 ** 62, size=50, dtype=np.uint64)
    for k in (15, 31):
        got = native.decode_cortex_kmers(packed, k)
        assert np.array_equal(got, decode_kmers(packed, k))


def test_native_canonicalize_parity():
    rng = np.random.default_rng(4)
    kmers = rand_kmers(rng, 120, 31)
    expect = canonicalize_kmer_matrix(kmers)
    got = kmers.copy()
    assert native.canonicalize_kmers_inplace(got)
    assert np.array_equal(got, expect)


def test_native_and_count_parity():
    rng = np.random.default_rng(5)
    m, W, K, h = 400, 4, 60, 3
    matrix = rng.integers(0, 2 ** 32, size=(m, W), dtype=np.uint32)
    idx = rng.integers(0, m, size=(K, h)).astype(np.int64)
    counts = native.and_count_rows(matrix, idx)
    rows = matrix[idx.ravel()].reshape(K, h, W)
    anded = rows[:, 0]
    for j in range(1, h):
        anded = anded & rows[:, j]
    expect = unpack_bits_lsb(anded).sum(axis=0)
    assert np.array_equal(counts, expect)


def test_grouped_streams_native_parity():
    """C grouped_streams must match the numpy implementation exactly,
    including pads, run breaks, spills, and bucket padding."""
    import numpy as np

    from bigsi_tpu import native
    from bigsi_tpu.ops import lookup

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(17)
    for b, k, run in ((4, 64, 6), (3, 100, 6), (2, 8, 6), (5, 512, 12)):
        nt = (b * k + run - 1) // run
        base = rng.integers(0, 1000, size=nt).astype(np.int32)
        tile = np.repeat(base, run)[: b * k].reshape(b, k)
        smask = rng.integers(1, 2 ** 32, size=(b, k), dtype=np.uint64).astype(
            np.uint32
        )
        # sprinkle pads: trailing, interior, whole-row
        smask[:, -3:] = 0
        smask[0, k // 2] = 0
        if b > 2:
            smask[2, :] = 0

        def numpy_version():
            orig = native.grouped_streams
            native.grouped_streams = lambda *a, **kw: None
            try:
                return lookup.build_grouped_streams(tile, smask, r=run)
            finally:
                native.grouped_streams = orig

        un, gn = numpy_version()
        uc, gc = lookup.build_grouped_streams(tile, smask, r=run)
        assert np.array_equal(un, uc), (b, k, run)
        assert np.array_equal(gn, gc), (b, k, run)
