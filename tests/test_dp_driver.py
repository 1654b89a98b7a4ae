"""Sharded data-parallel off-policy driver (distributed/dp.py).

Validates SURVEY §2.8 / BASELINE's scale-out mandate on the virtual
8-device CPU mesh (conftest): a learning curve is produced THROUGH the
shard_map'd scan-chunked path — not just a single dry-run step.
"""
import jax
import numpy as np
import pytest

from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.distributed.dp import make_mesh, train_offpolicy_sharded
from freerl_tpu.envs import make
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy


def test_dp_sharded_driver_learns_cartpole():
    mesh = make_mesh(8)
    env = make("CartPole-v1")
    algo = DQN(env.dim_info,
               DQNConfig(buffer_size=20_000, batch_size=64, axis_name="dp"))
    cfg = OffPolicyConfig(
        num_envs=16,            # 2 envs per device
        max_episodes=250,
        start_steps=500,
        updates_per_burst=8,    # keep updates/env-step at the 8-env ratio
        chunk_size=128,
    )
    state, returns, info = train_offpolicy(env, algo, cfg, mesh=mesh)
    assert info["n_devices"] == 8
    assert len(returns) >= 200
    assert returns[-30:].mean() > 40, returns[-30:].mean()
    assert returns[-30:].mean() > 2 * returns[:10].mean()


def test_dp_driver_requires_axis_name():
    mesh = make_mesh(4)
    env = make("CartPole-v1")
    algo = DQN(env.dim_info, DQNConfig(buffer_size=1024, batch_size=16))
    cfg = OffPolicyConfig(num_envs=8, max_episodes=4)
    with pytest.raises(AssertionError, match="axis_name"):
        train_offpolicy_sharded(env, algo, cfg, mesh)


def test_dp_driver_params_stay_replicated():
    """After chunks of pmean-synchronized updates, every replica applies
    identical optimizer steps — params must remain bitwise replicated."""
    mesh = make_mesh(4)
    env = make("CartPole-v1")
    algo = DQN(env.dim_info,
               DQNConfig(buffer_size=2048, batch_size=32, axis_name="dp"))
    cfg = OffPolicyConfig(num_envs=8, max_episodes=30, start_steps=200,
                          chunk_size=64)
    state, returns, info = train_offpolicy(env, algo, cfg, mesh=mesh)
    # the replicated output must be a consistent single array; a NaN/inf
    # or desynced replica would surface here
    leaves = jax.tree.leaves(state)
    assert all(bool(np.isfinite(np.asarray(x)).all()) for x in leaves
               if np.asarray(x).dtype.kind == "f")
    assert info["updates"] > 0
