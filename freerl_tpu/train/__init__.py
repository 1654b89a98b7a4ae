from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

__all__ = ["OffPolicyConfig", "train_offpolicy"]
