"""Sharded data-parallel ON-policy driver (distributed/dp.py).

The off-policy twin is covered by test_dp_driver.py; this validates the
PPO/MAPPO path on the virtual 8-device CPU mesh: learning THROUGH the
shard_map'd rollout+update iteration, normalizer-stat replication under
pmean sync (the 12-trick set stays exact under sharding), and the
axis_name contract.
"""
import jax
import numpy as np
import pytest

from freerl_tpu.algos.ppo import PPO, PPOConfig
from freerl_tpu.distributed.dp import make_mesh, train_onpolicy_sharded
from freerl_tpu.envs import make
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy


def test_dp_onpolicy_learns_cartpole():
    mesh = make_mesh(8)
    env = make("CartPole-v1")
    algo = PPO(env.dim_info,
               PPOConfig(horizon=1024, minibatch_size=64, num_envs=16,
                         adv_norm=True, axis_name="dp"))
    cfg = OnPolicyConfig(num_envs=16, max_episodes=250, horizon=1024)
    state, returns, info = train_onpolicy(env, algo, cfg, mesh=mesh)
    assert info["n_devices"] == 8
    assert len(returns) >= 200
    assert returns[-30:].mean() > 3 * returns[:10].mean(), (
        returns[:10].mean(), returns[-30:].mean(),
    )


def test_dp_onpolicy_requires_axis_name():
    mesh = make_mesh(4)
    env = make("CartPole-v1")
    algo = PPO(env.dim_info, PPOConfig(horizon=256, num_envs=8))
    cfg = OnPolicyConfig(num_envs=8, max_episodes=4, horizon=256)
    with pytest.raises(AssertionError, match="axis_name"):
        train_onpolicy_sharded(env, algo, cfg, mesh)


def test_dp_onpolicy_normalizer_stats_stay_replicated():
    """obs_norm / reward_scaling / adv_norm all run INSIDE shard_map;
    their running stats must come back replicated (a per-shard update
    would desync them and the P() out-spec would surface garbage)."""
    mesh = make_mesh(4)
    env = make("Pendulum-v1")
    algo = PPO(env.dim_info,
               PPOConfig(horizon=512, minibatch_size=64, num_envs=8,
                         adv_norm=True, obs_norm=True, reward_scaling=True,
                         axis_name="dp"))
    cfg = OnPolicyConfig(num_envs=8, max_episodes=40, horizon=512)
    state, returns, info = train_onpolicy(env, algo, cfg, mesh=mesh)
    # count folds the GLOBAL batch: 8 envs per vector step + the init fold
    assert float(state.obs_rms.count) > 8.0
    leaves = jax.tree.leaves(state)
    assert all(bool(np.isfinite(np.asarray(x)).all()) for x in leaves
               if np.asarray(x).dtype.kind == "f")


def test_global_rms_matches_single_device():
    """RunningMeanStd.update(axis_name=...) must equal the single-device
    update on the concatenated batch (law-of-total-variance merge)."""
    from functools import partial

    from freerl_tpu.core.normalization import RunningMeanStd
    from freerl_tpu.distributed.dp import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(4)
    rng = np.random.default_rng(0)
    batch = rng.normal(size=(16, 3)).astype(np.float32) * 2.0 + 1.0
    rms = RunningMeanStd.create((3,))

    def upd(rms, x):
        return rms.update(x, axis_name="dp")

    with mesh:
        out = jax.jit(shard_map(
            upd, mesh=mesh, in_specs=(P(), P("dp")), out_specs=P(),
            check_rep=False,
        ))(rms, jax.numpy.asarray(batch))
    ref = rms.update(jax.numpy.asarray(batch))
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.var), np.asarray(ref.var),
                               rtol=1e-5, atol=1e-6)
    assert float(out.count) == float(ref.count)
