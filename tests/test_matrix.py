import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bigsi_tpu.matrix import (
    BitSliceMatrix,
    bloom_bytes_to_bools,
    bools_to_bloom_bytes,
    pack_bits_lsb,
    transpose_blooms,
    unpack_bits_lsb,
)


@given(st.lists(st.booleans(), min_size=1, max_size=300))
def test_pack_unpack_roundtrip(bits):
    a = np.array(bits, dtype=bool)
    packed = pack_bits_lsb(a)
    back = unpack_bits_lsb(packed, len(bits))
    assert np.array_equal(back.astype(bool), a)


@given(st.lists(st.booleans(), min_size=1, max_size=100))
def test_bloom_bytes_roundtrip(bits):
    a = np.array(bits, dtype=bool)
    data = bools_to_bloom_bytes(a)
    back = bloom_bytes_to_bools(data, len(bits))
    assert np.array_equal(back, a)
    # byte-padding bits are zero and retained without m
    full = bloom_bytes_to_bools(data)
    assert len(full) == 8 * len(data)
    assert not full[len(bits):].any()


@settings(deadline=None)
@given(
    st.integers(min_value=1, max_value=40),  # num samples N
    st.integers(min_value=1, max_value=200),  # num rows m
    st.integers(min_value=0, max_value=2 ** 32 - 1),
)
def test_transpose_blooms_matches_numpy_oracle(n, m, seed):
    rng = np.random.default_rng(seed)
    blooms = [rng.random(m) < 0.3 for _ in range(n)]
    words = transpose_blooms(blooms, m, row_chunk=37)
    dense = np.stack(blooms).T  # oracle: [m, N]
    got = unpack_bits_lsb(words, n)
    assert np.array_equal(got.astype(bool), dense)
    # padding words are zero
    assert not unpack_bits_lsb(words)[:, n:].any()


def test_bitmatrix_row_col_ops():
    rng = np.random.default_rng(0)
    blooms = [rng.random(100) < 0.5 for _ in range(5)]
    mat = BitSliceMatrix.create(blooms, num_rows=100, num_cols=5)
    assert mat.num_rows == 100
    assert mat.num_cols == 5
    for c in range(5):
        assert np.array_equal(mat.get_column(c), blooms[c])
    row7 = np.stack([b[7] for b in blooms])
    assert np.array_equal(mat.get_row_bools(7), row7)
    # set a row and read it back
    newrow = np.array([1, 0, 1, 0, 1], dtype=bool)
    mat.set_row_bools(7, newrow)
    assert np.array_equal(mat.get_row_bools(7), newrow)


def test_insert_column_growth():
    mat = BitSliceMatrix.zeros(50, 2)
    col = np.arange(50) % 2 == 0
    mat.insert_column(col, 2)
    assert mat.num_cols == 3
    assert np.array_equal(mat.get_column(2), col)
    # inserting far past the lane-padded edge grows the words array
    mat.insert_column(col, 4100)
    assert mat.num_cols == 4101
    assert np.array_equal(mat.get_column(4100), col)


@settings(deadline=None, max_examples=25)
@given(
    st.integers(min_value=1, max_value=70),
    st.integers(min_value=1, max_value=70),
    st.integers(min_value=1, max_value=80),
    st.integers(min_value=0, max_value=2 ** 31),
)
def test_merge_matches_concatenation(n1, n2, m, seed):
    rng = np.random.default_rng(seed)
    b1 = [rng.random(m) < 0.4 for _ in range(n1)]
    b2 = [rng.random(m) < 0.4 for _ in range(n2)]
    left = BitSliceMatrix.create(b1, m, n1)
    right = BitSliceMatrix.create(b2, m, n2)
    both = BitSliceMatrix.create(b1 + b2, m, n1 + n2)
    left.merge(right, row_chunk=13)
    assert left.num_cols == n1 + n2
    assert np.array_equal(
        unpack_bits_lsb(left.words, n1 + n2), unpack_bits_lsb(both.words, n1 + n2)
    )
