from bigsi_tpu.ops.lookup import (
    and_rows_jnp,
    counts_from_packed,
    exact_and_reduce,
    unpack_words,
    query_counts_jnp,
)

__all__ = [
    "and_rows_jnp",
    "counts_from_packed",
    "exact_and_reduce",
    "unpack_words",
    "query_counts_jnp",
]
