from freerl_tpu.core.types import Transition, DimInfo
from freerl_tpu.core import normalization

__all__ = ["Transition", "DimInfo", "normalization"]
