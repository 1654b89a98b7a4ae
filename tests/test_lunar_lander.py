"""LunarLander physics: calibration against the env spec + behavioral
parity with the Box2D original via the classic PD landing heuristic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.envs import make
from freerl_tpu.envs.lunar_lander import (
    HELIPAD_Y,
    LEG_DOWN,
    LanderState,
    LunarLander,
    LunarLanderContinuous,
    _MASS,
)


def heuristic(obs):
    """The classic PD landing controller (gymnasium's demo heuristic)."""
    angle_targ = np.clip(obs[0] * 0.5 + obs[2] * 1.0, -0.4, 0.4)
    hover_targ = 0.55 * np.abs(obs[0])
    angle_todo = (angle_targ - obs[4]) * 0.5 - obs[5] * 1.0
    hover_todo = (hover_targ - obs[1]) * 0.5 - obs[3] * 0.5
    if obs[6] or obs[7]:
        angle_todo = 0.0
        hover_todo = -obs[3] * 0.5
    a = 0
    if hover_todo > np.abs(angle_todo) and hover_todo > 0.05:
        a = 2
    elif angle_todo < -0.05:
        a = 3
    elif angle_todo > 0.05:
        a = 1
    return a


def _rest_state():
    return LanderState(
        x=jnp.float32(10.0), y=jnp.float32(HELIPAD_Y + LEG_DOWN),
        vx=jnp.float32(0), vy=jnp.float32(0), angle=jnp.float32(0),
        omega=jnp.float32(0), leg1=jnp.float32(1), leg2=jnp.float32(1),
        prev_shaping=jnp.float32(0), rest_time=jnp.float32(0),
        t=jnp.int32(0),
    )


def test_mass_matches_box2d():
    # Box2D lander body mass (hull density 5 over the gym polygon) ~= 4.82
    assert abs(_MASS - 4.85) < 0.1


def test_rest_is_stable_and_terminates_landed():
    env = LunarLander()
    step = jax.jit(env.step)
    s = _rest_state()
    key = jax.random.PRNGKey(0)
    for t in range(30):
        s, o, r, term, trunc = step(s, jnp.int32(0), jax.random.fold_in(key, t))
        if bool(term):
            break
    assert bool(term) and float(r) == 100.0
    assert abs(float(s.vy)) < 1e-3 and abs(float(s.omega)) < 1e-3
    assert t == 24  # 0.5 s sleep timer at 50 fps


def test_free_fall_crashes():
    env = LunarLander()
    step = jax.jit(env.step)
    s, o = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    tot = 0.0
    for t in range(200):
        s, o, r, term, trunc = step(s, jnp.int32(0), jax.random.fold_in(key, t))
        tot += float(r)
        if bool(term):
            break
    assert bool(term)
    assert float(r) == -100.0  # uncontrolled drop ends in a crash


def test_heuristic_lands():
    """PD controller lands consistently with Box2D-comparable returns
    (real LunarLander-v3 scores ~267 mean on the same controller)."""
    env = LunarLander()
    step = jax.jit(env.step)
    rets = []
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        s, o = env.reset(key)
        o = np.asarray(o)
        tot = 0.0
        for t in range(1000):
            s, o, r, term, trunc = step(
                s, jnp.int32(heuristic(np.asarray(o))),
                jax.random.fold_in(key, t),
            )
            tot += float(r)
            if bool(term) or bool(trunc):
                break
        assert float(r) == 100.0, f"seed {seed} did not land (r={float(r)})"
        rets.append(tot)
    assert np.mean(rets) > 200


def test_continuous_variant():
    env = LunarLanderContinuous()
    s, o = env.reset(jax.random.PRNGKey(0))
    assert o.shape == (8,)
    step = jax.jit(env.step)
    # full main throttle slows the fall vs noop
    s1 = s
    for t in range(30):
        s1, o1, r1, term, _ = step(
            s1, jnp.array([1.0, 0.0]), jax.random.fold_in(jax.random.PRNGKey(1), t)
        )
    s0 = s
    for t in range(30):
        s0, o0, r0, term0, _ = step(
            s0, jnp.array([-1.0, 0.0]), jax.random.fold_in(jax.random.PRNGKey(1), t)
        )
    assert float(s1.vy) > float(s0.vy)


def test_registry_and_vectorization():
    env = make("LunarLander-v2")
    assert env.dim_info.obs_dim == 8 and env.dim_info.action_dim == 4
    from freerl_tpu.envs import vec_reset, vec_step_auto_reset

    key = jax.random.PRNGKey(0)
    state, obs = vec_reset(env, key, 16)
    assert obs.shape == (16, 8)
    out = vec_step_auto_reset(
        env, state, jnp.zeros((16,), jnp.int32), key, 16
    )
    assert out.reward.shape == (16,)


@pytest.mark.skipif(
    not pytest.importorskip("Box2D", reason="Box2D not installed"),
    reason="Box2D missing",
)
def test_obs_scale_matches_gymnasium_at_reset():
    """Reset distributions line up with the real env (position/velocity
    normalization identical)."""
    gym = pytest.importorskip("gymnasium")
    genv = gym.make("LunarLander-v3")
    gobs, _ = genv.reset(seed=0)
    env = LunarLander()
    s, o = env.reset(jax.random.PRNGKey(0))
    o = np.asarray(o)
    # same obs layout; x≈0, y≈1.4, legs 0 at spawn in both
    assert abs(o[0]) < 0.1 and abs(gobs[0]) < 0.1
    assert abs(o[1] - gobs[1]) < 0.15
    assert o[6] == gobs[6] == 0.0 and o[7] == gobs[7] == 0.0
