from freerl_tpu.nets.mlp import (
    MLP,
    Dense,
    DuelingQNet,
    CategoricalQNet,
    torch_default_init,
    final_uniform_init,
)
from freerl_tpu.nets.noisy import (
    NoisyDense,
    NoisyMLP,
    NoisyDuelingQNet,
    NoisyCategoricalQNet,
)
from freerl_tpu.nets import distributions

__all__ = [
    "MLP",
    "Dense",
    "DuelingQNet",
    "CategoricalQNet",
    "NoisyDense",
    "NoisyMLP",
    "NoisyDuelingQNet",
    "NoisyCategoricalQNet",
    "distributions",
    "torch_default_init",
    "final_uniform_init",
]
