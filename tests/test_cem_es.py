"""ES suite + CEM-GD3PG hybrid tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.cem_gd3pg import CEMGD3PG, CEMGD3PGConfig, train_cem_gd3pg
from freerl_tpu.algos.es import (
    GES,
    VES,
    Control,
    sepCEM,
    sepCEMA,
    sepCEMv2,
    sepCMAES,
    sepMCEM,
)
from freerl_tpu.envs import make


def _sphere(x):
    """Maximize -||x - 3||^2 — optimum at 3."""
    return -np.sum((x - 3.0) ** 2, axis=-1)


@pytest.mark.parametrize(
    "make_es",
    [
        # CEM variants keep the reference's damp-floor-driven search
        # radius (cov ~ damp after collapse), so give them a usable floor
        lambda d: sepCEM(d, sigma_init=1.0, pop_size=32, antithetic=True,
                         damp=0.3, damp_limit=0.1),
        lambda d: sepCEMA(d, sigma_init=1.0, pop_size=32, damp=0.3,
                          damp_limit=0.1),
        lambda d: sepMCEM(d, sigma_init=1.0, pop_size=32, damp=0.3,
                          damp_limit=0.1),
        lambda d: sepCEMv2(d, sigma_init=1.0, pop_size=32, damp=0.3,
                           damp_limit=0.1),
        lambda d: sepCMAES(d, sigma_init=1.0, pop_size=32),
        lambda d: VES(d, sigma_init=0.5, pop_size=32, lr=0.5),
        lambda d: GES(d, sigma_init=0.5, pop_size=32, lr=0.5),
    ],
    ids=["sepCEM", "sepCEMA", "sepMCEM", "sepCEMv2", "sepCMAES", "VES",
         "GES"],
)
def test_es_optimizes_sphere(make_es):
    np.random.seed(0)
    d = 8
    es = make_es(d)
    for _ in range(60):
        sols = es.ask(32)
        es.tell(sols, _sphere(sols))
    assert _sphere(es.mu[None])[0] > -2.0, es.mu


def test_control_is_noop():
    es = Control(4, sigma_init=0.1)
    mu0 = es.mu.copy()
    sols = es.ask(8)
    es.tell(sols, _sphere(sols))
    np.testing.assert_array_equal(es.mu, mu0)


def test_cem_gd3pg_population_eval_parallel():
    env = make("Pendulum-v1")
    algo = CEMGD3PG(env.dim_info, CEMGD3PGConfig(pop_size=4))
    state = algo.init(jax.random.PRNGKey(0))
    flat = np.stack([algo.get_params(state.actor1)] * 4)
    fit, trans = algo.eval_population(env, flat, jax.random.PRNGKey(1))
    assert fit.shape == (4,)
    # identical params, different env seeds -> finite, distinct returns
    assert np.isfinite(np.asarray(fit)).all()
    # param roundtrip
    p2 = algo.set_params(algo.get_params(state.actor1))
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(state.actor1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_cem_gd3pg_trains_pendulum_briefly():
    env = make("Pendulum-v1")
    algo = CEMGD3PG(env.dim_info, CEMGD3PGConfig(
        pop_size=4, buffer_size=50_000, batch_size=64))
    state, returns, info = train_cem_gd3pg(
        env, algo, max_episodes=12, start_steps=500,
        updates_per_episode=20,
    )
    assert len(returns) == 12
    assert np.isfinite(returns).all()
    # fitness EMAs moved
    assert float(state.f1_total) != 0.0 or float(state.f2_total) != 0.0
