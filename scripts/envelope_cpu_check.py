"""Reduced-scale CPU sanity run of the fixed ENVELOPE on DST.

Not the parity artifact (that is the full TPU protocol via
envelope_e2e.py) — this validates, at ~1/16 update compute, that the
round-4 parity fixes (beta_init 0.95 scalarized-dominant loss,
no-replacement priority sampling, per-terminal homotopy bumps, no grad
clip, 0.5/0.5 curve scalarization) learn DST and do NOT collapse the
way the round-3 run did (learned until ep ~1000, then fell to -20).

Prints a 100-episode-bucket curve, final Q magnitudes at the start
state, and an 11-weight mini Pareto sweep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FREERL_PLATFORM", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.algos.envelope import Envelope, EnvelopeConfig
from freerl_tpu.envs import make
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

EPISODES = int(sys.argv[1]) if len(sys.argv) > 1 else 1600

env = make("deep-sea-treasure-v0")
cfg = EnvelopeConfig(
    batch_size=64, weight_num=32, buffer_size=200_000,
    epsilon=0.4, epsilon_decay=True, max_episodes=EPISODES,
)
algo = Envelope(env.dim_info, env.reward_dim, cfg)
loop = OffPolicyConfig(
    seed=0, num_envs=8, max_episodes=EPISODES, start_steps=500,
    updates_per_burst=8, chunk_size=128, log_every_chunks=1,
)

t0 = time.time()


def on_chunk(i, n_eps, n_steps, carry):
    print(f"[{time.time()-t0:7.0f}s] chunk {i} eps {n_eps} steps {n_steps} "
          f"beta {float(carry.algo_state.beta):.3f}", flush=True)


state, returns, info = train_offpolicy(env, algo, loop, on_chunk=on_chunk)
print("info:", info, flush=True)
for a in range(0, len(returns), 100):
    print(f"ep {a:5d}-{a+100:5d}: {returns[a:a+100].mean():7.2f}")

obs = jnp.zeros((1, 2))
for w1 in [0.0, 0.2, 0.5, 0.8, 0.99]:
    w = jnp.array([[w1, 1 - w1]], jnp.float32)
    q = algo.net.apply({"params": state.params}, obs, w)[0]
    wq = q @ w[0]
    print(f"w1={w1:.2f} argmax={int(wq.argmax())} absmax_q={float(jnp.abs(q).max()):.1f}")

# mini sweep: greedy rollouts for 11 weights
rets = []
for w1 in np.linspace(0, 1, 11, dtype=np.float32):
    w = jnp.array([w1, 1 - w1], jnp.float32)
    s, o = env.reset(jax.random.PRNGKey(0))
    total = np.zeros(2)
    for t in range(env.max_steps):
        a = int(algo.evaluate_action(state, o[None], w)[0])
        s, o, r, term, trunc = env.step(s, a, jax.random.PRNGKey(0))
        total += np.asarray(r)
        if bool(term) or bool(trunc):
            break
    rets.append(float(np.dot(total, np.asarray(w))))
    print(f"sweep w1={w1:.1f}: vec={total} scalar={rets[-1]:.2f}")
print("mini-sweep mean:", np.mean(rets))
