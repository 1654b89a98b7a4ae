from freerl_tpu.buffers.uniform import ReplayBuffer
from freerl_tpu.buffers.per import PERBuffer
from freerl_tpu.buffers.nstep import NStepAccumulator

__all__ = ["ReplayBuffer", "PERBuffer", "NStepAccumulator"]
