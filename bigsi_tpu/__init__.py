"""bigsi-tpu: a TPU-native BItsliced Genomic Signature Index.

A from-scratch rebuild of BIGSI (Phelimb/BIGSI, Bradley et al., Nature
Biotechnology 2019) designed for TPU hardware: sample Bloom filters are
packed into an HBM-resident, column-sharded uint32 bitslice matrix;
k-mer hashing and the row-gather/AND/popcount query kernel run on
device via JAX/XLA/Pallas, scaling over a ``jax.sharding.Mesh``.
"""

from bigsi_tpu.version import __version__
from bigsi_tpu.graph import BIGSI, BigsiQueryResult

__all__ = ["BIGSI", "BigsiQueryResult", "__version__"]
