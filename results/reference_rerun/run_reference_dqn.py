"""Diagnostic: run the REFERENCE torch base DQN on an env/seed, with its
own main-loop protocol (fixed reset, eps=0.1, per-step learn after 500
steps, batch 256) — DQN_file/DQN.py:227-343 semantics. (Reference code
imported read-only; throwaway diagnostics like run_reference_noisy.py.)

Usage: python run_reference_dqn.py <env_name> <seed> [episodes]
"""
import os
import sys
import time

sys.path.insert(0, "/root/reference/DQN_file")
os.environ.setdefault("OMP_NUM_THREADS", "1")
import gymnasium as gym
import numpy as np
import torch
from DQN import DQN

env_name = sys.argv[1] if len(sys.argv) > 1 else "FrozenLake-v1"
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
episodes = int(sys.argv[3]) if len(sys.argv) > 3 else 500

env = gym.make(env_name)
if isinstance(env.observation_space, gym.spaces.Box):
    obs_dim = env.observation_space.shape[0]
else:
    obs_dim = 1
action_dim = env.action_space.n
np.random.seed(seed)
torch.manual_seed(seed)
policy = DQN((obs_dim, action_dim), False, 1e-3, int(1e6),
             torch.device("cpu"))
obs, _ = env.reset(seed=seed)
if not isinstance(obs, np.ndarray):
    obs = np.array([obs], dtype=np.float32)
ep_r, eps_done, step, returns = 0.0, 0, 0, []
t0 = time.time()
while eps_done < episodes:
    step += 1
    if np.random.rand() < 0.1:
        action = np.random.randint(action_dim)
    else:
        action = policy.select_action(obs)
    nobs, r, term, trunc, _ = env.step(action)
    if not isinstance(nobs, np.ndarray):
        nobs = np.array([nobs], dtype=np.float32)
    policy.add(obs, action, r, nobs, term)
    ep_r += r
    obs = nobs
    if term or trunc:
        returns.append(ep_r)
        eps_done += 1
        if eps_done % 100 == 0:
            print(f"ep {eps_done} last100 "
                  f"{np.mean(returns[-100:]):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        obs, _ = env.reset(seed=seed)
        if not isinstance(obs, np.ndarray):
            obs = np.array([obs], dtype=np.float32)
        ep_r = 0.0
    if step > 500:
        policy.learn(256, 0.99, 0.01)

arr = np.array(returns)
print(f"REF {env_name} seed {seed}: final-50 {arr[-50:].mean():.3f} "
      f"({time.time() - t0:.0f}s)", flush=True)
np.save(f"ref_dqn_{env_name}_seed{seed}.npy", arr)
