from bigsi_tpu.index.signature import KmerSignatureIndex

__all__ = ["KmerSignatureIndex"]
