from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.algos import common

__all__ = ["DQN", "DQNConfig", "common"]
