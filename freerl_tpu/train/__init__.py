from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy
from freerl_tpu.train.marl import MARLConfig, train_marl

__all__ = [
    "OffPolicyConfig", "train_offpolicy",
    "OnPolicyConfig", "train_onpolicy",
    "MARLConfig", "train_marl",
]
