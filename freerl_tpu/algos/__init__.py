from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.algos.ddpg import DDPG, DDPGConfig
from freerl_tpu.algos.td3 import TD3, TD3Config
from freerl_tpu.algos.sac import SAC, SACConfig
from freerl_tpu.algos.ppo import PPO, PPOConfig
from freerl_tpu.algos.reinforce import REINFORCE, REINFORCEConfig
from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig, MATD3
from freerl_tpu.algos.masac import MASAC, MASACConfig
from freerl_tpu.algos.maac import MAAC, MAACConfig
from freerl_tpu.algos.mappo import IPPO, MAPPO, MAPPOConfig
from freerl_tpu.algos.rmappo import RIPPO, RMAPPO, RMAPPOConfig
from freerl_tpu.algos.happo import HAPPO, HAPPOConfig
from freerl_tpu.algos.mat import MAT, MATConfig
from freerl_tpu.algos.gail import GAIL, GAILConfig, ExpertData, train_gail
from freerl_tpu.algos.envelope import Envelope, EnvelopeConfig
from freerl_tpu.algos import common

__all__ = [
    "DQN", "DQNConfig",
    "DDPG", "DDPGConfig",
    "TD3", "TD3Config",
    "SAC", "SACConfig",
    "PPO", "PPOConfig",
    "REINFORCE", "REINFORCEConfig",
    "MADDPG", "MADDPGConfig", "MATD3",
    "MASAC", "MASACConfig",
    "MAAC", "MAACConfig",
    "MAPPO", "MAPPOConfig", "IPPO",
    "RMAPPO", "RMAPPOConfig", "RIPPO",
    "HAPPO", "HAPPOConfig",
    "MAT", "MATConfig",
    "GAIL", "GAILConfig", "ExpertData", "train_gail",
    "Envelope", "EnvelopeConfig",
    "common",
]
