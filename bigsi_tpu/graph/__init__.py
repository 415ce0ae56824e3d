from bigsi_tpu.graph.bigsi import BIGSI, BigsiQueryResult

__all__ = ["BIGSI", "BigsiQueryResult"]
