from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy
from freerl_tpu.train.marl import MARLConfig, train_marl
from freerl_tpu.train.evaluate import evaluate, plot_evaluate
from freerl_tpu.train.plotting import (
    aggregate_seeds,
    exp_smooth,
    plot_compare,
    plot_learning_curve,
)
from freerl_tpu.train.runio import (
    MetricsWriter,
    load_checkpoint,
    make_dir,
    save_checkpoint,
    trick_prefix,
)

__all__ = [
    "OffPolicyConfig", "train_offpolicy",
    "OnPolicyConfig", "train_onpolicy",
    "MARLConfig", "train_marl",
    "evaluate", "plot_evaluate",
    "aggregate_seeds", "exp_smooth", "plot_compare", "plot_learning_curve",
    "MetricsWriter", "make_dir", "trick_prefix",
    "save_checkpoint", "load_checkpoint",
]
