"""DQN unit tests: analytic TD values, trick combos, end-to-end learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.common import c51_project, polyak
from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.envs import make
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

DI = DimInfo(obs_dim=4, action_dim=2, is_continue=False)


def _batch(key, b=32):
    ks = jax.random.split(key, 3)
    return Transition(
        obs=jax.random.normal(ks[0], (b, 4)),
        action=jax.random.randint(ks[1], (b,), 0, 2),
        reward=jax.random.normal(ks[2], (b,)),
        next_obs=jax.random.normal(ks[0], (b, 4)),
        done=jnp.zeros((b,), jnp.bool_),
        episode_done=jnp.zeros((b,), jnp.bool_),
    )


def test_polyak_moves_target():
    a = {"w": jnp.ones((3,))}
    b = {"w": jnp.zeros((3,))}
    out = polyak(b, a, 0.01)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.01)


def test_c51_project_identity():
    atoms = jnp.linspace(-1.0, 1.0, 5)
    probs = jnp.array([[0.1, 0.2, 0.4, 0.2, 0.1]])
    proj = c51_project(probs, jnp.broadcast_to(atoms, (1, 5)), atoms)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(probs), atol=1e-6)
    # mass preserved under shift+clip
    proj2 = c51_project(probs, jnp.broadcast_to(atoms + 0.3, (1, 5)), atoms)
    np.testing.assert_allclose(np.asarray(proj2).sum(), 1.0, atol=1e-6)


def test_dqn_update_reduces_td_on_fixed_batch():
    algo = DQN(DI, DQNConfig())
    state = algo.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1))
    upd = jax.jit(lambda s: algo.update(s, batch)[0:2])
    losses = []
    for _ in range(50):
        state, metrics = upd(state)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize(
    "trick",
    [
        dict(double=True),
        dict(dueling=True),
        dict(per=True),
        dict(noisy=True),
        dict(n_step=3),
        dict(categorical=True),
        dict(double=True, dueling=True, per=True, noisy=True, n_step=3,
             categorical=True),  # Rainbow
    ],
    ids=["double", "dueling", "per", "noisy", "nstep", "c51", "rainbow"],
)
def test_trick_combos_compile_and_step(trick):
    cfg = DQNConfig(buffer_size=2048, batch_size=32, **trick)
    algo = DQN(DI, cfg)
    state = algo.init(jax.random.PRNGKey(0))
    from tests.test_buffers import _example

    buf = algo.make_buffer(
        Transition(
            obs=jnp.zeros((4,)),
            action=jnp.int32(0),
            reward=jnp.float32(0),
            next_obs=jnp.zeros((4,)),
            done=jnp.bool_(False),
            episode_done=jnp.bool_(False),
        )
    )
    key = jax.random.PRNGKey(1)
    for i in range(4):
        buf = buf.add(_batch(jax.random.fold_in(key, i), b=64))
    state2, buf2, metrics = jax.jit(
        lambda s, b, k: algo.learn_step(s, b, k, num_envs=64)
    )(state, buf, key)
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    delta = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(delta)) > 0


def test_explore_epsilon_mixes_random():
    from freerl_tpu.algos.base import ExploreCtx

    algo = DQN(DI, DQNConfig(epsilon=1.0))
    state = algo.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((256, 4))
    ctx = ExploreCtx(
        total_env_steps=jnp.int32(10_000), episodes=jnp.int32(0),
        done_prev=jnp.zeros((256,), jnp.bool_), random_steps=0,
    )
    _, a = algo.explore(state, obs, jax.random.PRNGKey(1), ctx)
    # epsilon=1 -> uniform random: both actions present
    counts = np.bincount(np.asarray(a), minlength=2)
    assert counts.min() > 50


def test_dqn_learns_cartpole_smoke():
    """End-to-end: vectorized CartPole training clearly beats the untrained
    policy (~9 steps/episode for a constant-argmax net) within 250 episodes."""
    env = make("CartPole-v1")
    algo = DQN(DI, DQNConfig(buffer_size=20_000, batch_size=64))
    cfg = OffPolicyConfig(
        num_envs=8,
        max_episodes=250,
        start_steps=500,
        updates_per_burst=4,
        chunk_size=128,
    )
    _, returns, info = train_offpolicy(env, algo, cfg)
    assert len(returns) >= 200
    assert returns[-30:].mean() > 40
    assert returns[-30:].mean() > 2 * returns[:10].mean()
