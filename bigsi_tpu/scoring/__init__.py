from bigsi_tpu.scoring.score import Scorer

__all__ = ["Scorer"]
