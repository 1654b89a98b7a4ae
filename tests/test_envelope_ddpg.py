"""ENVELOPE-DDPG (continuous MORL) + multi-host glue unit tests."""
import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.algos.envelope import EnvelopeConfig, EnvelopeDDPG
from freerl_tpu.core.types import DimInfo, Transition


def test_envelope_ddpg_update_and_explore():
    di = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)
    algo = EnvelopeDDPG(di, reward_dim=2,
                        cfg=EnvelopeConfig(batch_size=32, buffer_size=1024,
                                           weight_num=3, max_episodes=100))
    state = algo.init(jax.random.PRNGKey(0))
    buf = algo.make_buffer(Transition(
        obs=jnp.zeros((3,)), action=jnp.zeros((1,)),
        reward=jnp.zeros((2,)), next_obs=jnp.zeros((3,)),
        done=jnp.bool_(False), episode_done=jnp.bool_(False),
    ))
    key = jax.random.PRNGKey(1)
    buf = buf.add(Transition(
        obs=jax.random.normal(key, (64, 3)),
        action=jax.random.uniform(key, (64, 1), jnp.float32, -2, 2),
        reward=jax.random.normal(key, (64, 2)),
        next_obs=jax.random.normal(key, (64, 3)),
        done=jnp.zeros((64,), jnp.bool_),
        episode_done=jnp.zeros((64,), jnp.bool_),
    ))
    beta0 = float(state.beta)
    s2, _, metrics = jax.jit(
        lambda s, b, k: algo.learn_step(s, b, k, 1)
    )(state, buf, key)
    assert np.isfinite(float(metrics["critic_loss"]))
    assert float(s2.beta) > beta0
    # preference-conditioned acting stays in the box
    from tests.test_continuous import _ctx

    _, a = algo.explore(s2, jnp.zeros((8, 3)), jax.random.PRNGKey(2), _ctx(8))
    assert a.shape == (8, 1) and float(jnp.abs(a).max()) <= 2.0
    det = algo.evaluate_action(s2, jnp.zeros((8, 3)), jnp.array([0.7, 0.3]))
    assert det.shape == (8, 1)
    # different preferences can give different actions
    det2 = algo.evaluate_action(s2, jnp.ones((8, 3)), jnp.array([0.1, 0.9]))
    det1 = algo.evaluate_action(s2, jnp.ones((8, 3)), jnp.array([0.9, 0.1]))
    assert not np.allclose(np.asarray(det1), np.asarray(det2))


def test_multihost_glue_single_host():
    from freerl_tpu.distributed.multihost import (
        global_mesh,
        hosts,
        initialize,
        is_primary,
    )

    assert initialize() is False      # no coordinator -> no-op
    assert is_primary() and hosts() == 1
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
