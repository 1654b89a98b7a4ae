from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy

__all__ = [
    "OffPolicyConfig", "train_offpolicy",
    "OnPolicyConfig", "train_onpolicy",
]
