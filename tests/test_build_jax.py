"""On-device build ops vs the host build pipeline (bit-identical)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bigsi_tpu.bloom import BloomFilter
from bigsi_tpu.kmers import ascii_to_strings, convert_query_kmers
from bigsi_tpu.matrix.bitmatrix import transpose_blooms
from bigsi_tpu.matrix.packing import pack_bits_lsb
from bigsi_tpu.ops.build_jax import device_bloom, device_transpose


def random_kmers(rng, k, n):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n, k))


@pytest.mark.parametrize("layout", ["classic", "blocked"])
def test_device_bloom_matches_host(layout):
    rng = np.random.default_rng(0)
    m, h, klen = 4096, 3, 9
    kmers = random_kmers(rng, klen, 50)
    got = np.asarray(device_bloom(jnp.asarray(kmers), m=m, h=h, layout=layout))

    bf = BloomFilter(m=m, h=h, layout=layout)
    bf.update(convert_query_kmers(ascii_to_strings(kmers)))
    want = pack_bits_lsb(np.asarray(bf.bitarray)[None, :])[0]
    assert np.array_equal(got, want)


def test_device_transpose_matches_host():
    rng = np.random.default_rng(1)
    m, n = 1000, 70
    blooms = [rng.random(m) < 0.3 for _ in range(n)]
    want = transpose_blooms(blooms, m)

    packed_blooms = pack_bits_lsb(
        np.stack([np.pad(b, (0, (-m) % 32)) for b in blooms])
    )
    got = np.asarray(device_transpose(jnp.asarray(packed_blooms), m, rows_chunk=256))
    w = got.shape[1]
    assert np.array_equal(got, want[:, :w])
    assert np.all(want[:, w:] == 0)


def test_device_bloom_256_duplicate_kmers():
    """Regression: a k-mer repeated 256x must still set its bits (an
    additive uint8 accumulator wrapped to zero)."""
    import jax.numpy as jnp

    kmer = np.frombuffer(b"ACGTACGTA", dtype=np.uint8)
    once = np.asarray(device_bloom(jnp.asarray(kmer[None, :]), m=4096, h=3))
    many = np.asarray(
        device_bloom(jnp.asarray(np.tile(kmer, (256, 1))), m=4096, h=3)
    )
    assert np.array_equal(once, many)
    assert once.any()
