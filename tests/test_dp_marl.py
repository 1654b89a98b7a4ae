"""Sharded data-parallel MARL driver (distributed/dp.py train_marl_sharded).

The reference has no multi-agent scale-out at all (single env,
`.to(device)` — SURVEY §2.8); BASELINE's scale-out mandate covers the
MARL capability surface too. These tests run MADDPG through the
shard_map'd scan-chunked path on the virtual 8-device CPU mesh
(conftest) and require an actual learning curve, not just compilation.
"""
import jax
import numpy as np
import pytest

from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig
from freerl_tpu.distributed.dp import make_mesh, train_marl_sharded
from freerl_tpu.envs import make
from freerl_tpu.train.marl import MARLConfig, train_marl


def test_dp_sharded_marl_learns_spread():
    mesh = make_mesh(8)
    env = make("simple_spread_v3")
    algo = MADDPG(env, MADDPGConfig(
        buffer_size=20_000, batch_size=64, axis_name="dp",
    ))
    cfg = MARLConfig(
        num_envs=16,            # 2 envs per device
        max_episodes=400,
        start_steps=500,
        updates_per_burst=2,
        chunk_size=64,
    )
    state, returns, info = train_marl(env, algo, cfg, mesh=mesh)
    assert info["n_devices"] == 8
    team = returns.mean(axis=-1)
    assert len(team) >= 300
    # spread starts around -40 per agent and the single-device 600-ep
    # curve reaches ~-18; at 400 eps require clear improvement
    assert team[-50:].mean() > team[:30].mean() + 5, (
        team[-50:].mean(), team[:30].mean()
    )


def test_dp_marl_requires_axis_name():
    mesh = make_mesh(4)
    env = make("simple_spread_v3")
    algo = MADDPG(env, MADDPGConfig(buffer_size=1024, batch_size=16))
    cfg = MARLConfig(num_envs=8, max_episodes=4)
    with pytest.raises(AssertionError, match="axis_name"):
        train_marl_sharded(env, algo, cfg, mesh)


def test_dp_marl_params_stay_replicated():
    mesh = make_mesh(4)
    env = make("simple_spread_v3")
    algo = MADDPG(env, MADDPGConfig(
        buffer_size=2048, batch_size=32, axis_name="dp",
    ))
    cfg = MARLConfig(num_envs=8, max_episodes=60, start_steps=200,
                     chunk_size=32)
    state, returns, info = train_marl(env, algo, cfg, mesh=mesh)
    leaves = jax.tree.leaves(state)
    assert all(bool(np.isfinite(np.asarray(x)).all()) for x in leaves
               if np.asarray(x).dtype.kind == "f")
    assert info["updates"] > 0
