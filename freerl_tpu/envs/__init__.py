"""Environment registry.

``make(name)`` is the TPU-native analogue of the reference's ``get_env``
(DQN_file/DQN.py:142-170): it returns a pure-JAX :class:`~freerl_tpu.envs.base.Env`
whose ``dim_info`` carries obs/action dims, continuity and action bound.
``make(name, dis_to_con=True)`` wraps continuous envs in the discrete bridge
(the reference's ``is_dis_to_con`` path, 16 bins for 1-D actions and
``2**action_dim`` for multi-D).
"""
from __future__ import annotations

from freerl_tpu.envs.base import (
    DisToConWrapper,
    Env,
    StepOut,
    step_auto_reset,
    vec_reset,
    vec_step_auto_reset,
)
from freerl_tpu.envs.classic import (
    CartPole,
    MountainCar,
    MountainCarContinuous,
    Pendulum,
)

_REGISTRY = {
    "CartPole-v1": CartPole,
    "MountainCar-v0": MountainCar,
    "MountainCarContinuous-v0": MountainCarContinuous,
    "Pendulum-v1": Pendulum,
}


def register(name: str, cls) -> None:
    _REGISTRY[name] = cls


def make(name: str, dis_to_con: bool = False, n_bins: int = 16,
         bins_per_dim: int = 2, **kwargs) -> Env:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown env {name!r}; registered: {sorted(_REGISTRY)}"
        )
    env = _REGISTRY[name](**kwargs)
    if dis_to_con and env.dim_info.is_continue:
        env = DisToConWrapper(env, n_bins=n_bins, bins_per_dim=bins_per_dim)
    return env


# registered lazily to keep import cost low and avoid cycles
def _register_extras():
    try:
        from freerl_tpu.envs.tabular import FrozenLake, Taxi  # noqa

        _REGISTRY.setdefault("FrozenLake-v1", FrozenLake)
        _REGISTRY.setdefault("Taxi-v3", Taxi)
    except ImportError:
        pass
    try:
        from freerl_tpu.envs.lunar_lander import LunarLander, LunarLanderContinuous  # noqa

        _REGISTRY.setdefault("LunarLander-v2", LunarLander)
        _REGISTRY.setdefault("LunarLanderContinuous-v2", LunarLanderContinuous)
    except ImportError:
        pass
    try:
        from freerl_tpu.envs.mpe import (  # noqa
            SimpleAdversary,
            SimpleSpread,
            SimpleTag,
            SimpleWorldComm,
        )

        _REGISTRY.setdefault("simple_spread_v3", SimpleSpread)
        _REGISTRY.setdefault("simple_adversary_v3", SimpleAdversary)
        _REGISTRY.setdefault("simple_tag_v3", SimpleTag)
        _REGISTRY.setdefault("simple_world_comm_v3", SimpleWorldComm)
    except ImportError:
        pass
    try:
        from freerl_tpu.envs.bipedal import BipedalWalker  # noqa

        _REGISTRY.setdefault("BipedalWalker-v3", BipedalWalker)
    except ImportError:
        pass
    try:
        from freerl_tpu.envs.mo import DeepSeaTreasure  # noqa

        _REGISTRY.setdefault("deep-sea-treasure-v0", DeepSeaTreasure)
    except ImportError:
        pass
    try:
        from freerl_tpu.envs.goal import GoalPendulum  # noqa

        _REGISTRY.setdefault("GoalPendulum-v1", GoalPendulum)
    except ImportError:
        pass
    try:
        from freerl_tpu.envs.pixel import PixelCartPole  # noqa

        _REGISTRY.setdefault("PixelCartPole-v1", PixelCartPole)
    except ImportError:
        pass


_register_extras()

__all__ = [
    "Env",
    "StepOut",
    "make",
    "register",
    "step_auto_reset",
    "vec_reset",
    "vec_step_auto_reset",
    "DisToConWrapper",
    "CartPole",
    "MountainCar",
    "MountainCarContinuous",
    "Pendulum",
]
