from qmann_tpu.models import memn2n
from qmann_tpu.models.memn2n import (
    init_params, forward, loss_and_metrics, ForwardResult, Params,
)

__all__ = ["memn2n", "init_params", "forward", "loss_and_metrics",
           "ForwardResult", "Params"]
