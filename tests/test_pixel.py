"""Pixel pipeline: procedural renderer, frame stack, conv trunks,
episode-major buffer, and end-to-end pixel training.

Parity surface: PPO_advance/Buffer.py Buffer_episode_for_PPO (:325-373) and
Buffer_atari (:374-433) — the reference's (stubbed) Atari path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.buffers.episode import EpisodeBuffer
from freerl_tpu.core.types import Transition
from freerl_tpu.envs import make
from freerl_tpu.envs.pixel import PixelCartPole
from freerl_tpu.nets.cnn import ConvTrunk


def test_render_tracks_cart_position():
    env = PixelCartPole()
    state, obs = env.reset(jax.random.PRNGKey(0))
    # shift the cart far right: bright columns must move right
    left = state.inner.replace(x=jnp.float32(-2.0))
    right = state.inner.replace(x=jnp.float32(2.0))
    f_l = np.asarray(env.render_frame(left))
    f_r = np.asarray(env.render_frame(right))
    col_l = (f_l == 1.0).any(axis=0).argmax()
    col_r = (f_r == 1.0).any(axis=0).argmax()
    assert col_r > col_l + 20
    # pole pixels exist (value 0.7) and obs is normalized
    assert (f_l == 0.7).sum() > 5
    assert f_l.min() >= 0.0 and f_l.max() <= 1.0


def test_frame_stack_rolls():
    env = PixelCartPole()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env.n_stack * env.H * env.W,)
    new, obs2, r, term, trunc = env.step(state, jnp.int32(1),
                                         jax.random.PRNGKey(1))
    # oldest slot of the new stack == newest slot of the old stack
    np.testing.assert_array_equal(
        np.asarray(new.frames[0]), np.asarray(state.frames[1])
    )
    # channel-last obs layout matches obs_shape
    img = np.asarray(obs2).reshape(env.obs_shape)
    np.testing.assert_array_equal(img[..., 1], np.asarray(new.frames[1]))


def test_conv_trunk_shapes():
    for arch, shape in [("small", (48, 48, 2)), ("nature", (84, 84, 4))]:
        trunk = ConvTrunk(obs_shape=shape, features=64, arch=arch)
        x = jnp.zeros((3, int(np.prod(shape))))
        params = trunk.init(jax.random.PRNGKey(0), x)
        out = trunk.apply(params, x)
        assert out.shape == (3, 64)
        # leading dims preserved
        x2 = jnp.zeros((2, 3, int(np.prod(shape))))
        assert trunk.apply(params, x2).shape == (2, 3, 64)


def _traj(T, done_at=None):
    done = np.zeros(T, bool)
    if done_at is not None:
        done[done_at] = True
    return Transition(
        obs=jnp.arange(T, dtype=jnp.float32)[:, None] * jnp.ones((T, 3)),
        action=jnp.zeros((T,), jnp.int32),
        reward=jnp.ones((T,)),
        next_obs=jnp.zeros((T, 3)),
        done=jnp.asarray(done),
        episode_done=jnp.asarray(done),
    )


def test_episode_buffer_mask_and_ring():
    ex = jax.tree.map(lambda x: x[0], _traj(4))
    buf = EpisodeBuffer.create(capacity=3, horizon=4, example=ex)
    buf = buf.add_episode(_traj(4, done_at=1))   # valid: [T, T, F, F]
    np.testing.assert_array_equal(
        np.asarray(buf.valid[0]), [True, True, False, False]
    )
    buf = buf.add_episode(_traj(4))              # no done: all valid
    np.testing.assert_array_equal(np.asarray(buf.valid[1]), [True] * 4)
    assert len(buf) == 2
    # ring wrap: 2 more episodes overwrite slot 0
    buf = buf.add_episodes(
        jax.tree.map(lambda a, b: jnp.stack([a, b]), _traj(4, 0), _traj(4, 2))
    )
    assert len(buf) == 3 and int(buf.ep_pos) == 1
    # done_at=0 went to slot 2; done_at=2 wrapped to slot 0
    np.testing.assert_array_equal(
        np.asarray(buf.valid[2]), [True, False, False, False]
    )
    np.testing.assert_array_equal(
        np.asarray(buf.valid[0]), [True, True, True, False]
    )
    flat, mask = buf.all()
    assert flat.obs.shape == (12, 3) and mask.shape == (12,)
    eps, m = buf.sample_episodes(jax.random.PRNGKey(0), 5)
    assert eps.obs.shape == (5, 4, 3) and m.shape == (5, 4)


def test_dqn_cnn_learns_on_pixels():
    """Short pixel-DQN run through the standard off-policy driver."""
    from freerl_tpu.algos import DQN, DQNConfig
    from freerl_tpu.train import OffPolicyConfig, train_offpolicy

    env = make("PixelCartPole-v1")
    algo = DQN(env.dim_info, DQNConfig(
        buffer_size=5_000, batch_size=32, hidden=(64,),
        obs_shape=env.obs_shape, conv_arch="small", cnn_features=64,
    ))
    cfg = OffPolicyConfig(num_envs=4, max_episodes=12, max_env_steps=3000,
                          start_steps=300, chunk_size=64)
    state, returns, info = train_offpolicy(env, algo, cfg)
    assert len(returns) >= 1 and np.isfinite(returns).all()


def test_ppo_cnn_builds_and_updates():
    from freerl_tpu.algos import PPO, PPOConfig
    from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy

    env = make("PixelCartPole-v1")
    algo = PPO(env.dim_info, PPOConfig(
        horizon=128, minibatch_size=32, K_epochs=2, num_envs=4,
        hidden=(64,), obs_shape=env.obs_shape, cnn_features=64,
    ))
    cfg = OnPolicyConfig(num_envs=4, max_episodes=6, max_env_steps=600)
    state, returns, info = train_onpolicy(env, algo, cfg)
    assert np.isfinite(returns).all()
