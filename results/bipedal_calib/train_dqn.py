"""BipedalWalker DQN dis_to_con parity run (reference protocol).

Reference: DQN_file/DQN.py with is_dis_to_con, 2**4 = 16 actions,
500 episodes, seeds 0/10/100; committed curve final-50 means
-26 / -67 / -72 (DQN_file/learning_curves/BipedalWalker-v3/DQN_3_seed.npy).
"""
import os
import sys

backend = os.environ.get("BACKEND", "cpu")
import jax
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from freerl_tpu.envs import make
from freerl_tpu.algos import DQN, DQNConfig
from freerl_tpu.train import OffPolicyConfig, train_offpolicy

SEEDS = [int(s) for s in sys.argv[1:]] or [0, 10, 100]
OUT = "/root/repo/results/learning_curves/BipedalWalker-v3"
os.makedirs(OUT, exist_ok=True)

for seed in SEEDS:
    env = make("BipedalWalker-v3", dis_to_con=True)   # 2**4 = 16 actions
    algo = DQN(env.dim_info, DQNConfig(buffer_size=1_000_000,
                                       batch_size=256))
    cfg = OffPolicyConfig(
        seed=seed, num_envs=8, max_episodes=500, start_steps=2000,
        random_steps=1000, updates_per_burst=8, chunk_size=256,
        log_every_chunks=16,
    )
    def on_chunk(ci, eps, steps, carry):
        n = min(int(eps), 500)
        rets = np.asarray(carry.episode_returns)[:n]
        last = rets[-20:].mean() if n >= 20 else float("nan")
        print(f"seed {seed} chunk {ci}: eps={eps} steps={steps} "
              f"last20={last:.1f}", flush=True)
    _, returns, info = train_offpolicy(env, algo, cfg, on_chunk=on_chunk)
    np.save(f"{OUT}/DQN_seed_{seed}.npy", returns)
    print(f"seed {seed}: final-50 mean {returns[-50:].mean():.1f} "
          f"({info['env_steps']} steps, {info['elapsed_s']:.0f}s, "
          f"{info['env_steps_per_s']:.0f} sps)", flush=True)
