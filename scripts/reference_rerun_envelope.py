"""Run the REFERENCE's ENVELOPE implementation (imported unmodified from
/root/reference/ENVELOPE_MORL_file) on a mo_gymnasium shim, with Q-bound
instrumentation.

mo_gymnasium is absent in this image, so a minimal numpy
deep-sea-treasure-v0 (same map/dynamics/100-step truncation as mo_gym's
DEFAULT_MAP; independently implemented — freerl_tpu/envs/mo.py documents
the derivation) is registered as a fake ``mo_gymnasium`` module before
importing the reference file. The training loop below replicates the
reference's own main protocol (ENVELOPE_DQN.py:458-544: single env,
epsilon 0.4 linearly to 0.05 per episode, add-time priority, 1 learn per
step after 500, batch 256 x weight_num 128) and probes max|Q| at the
start state for w1 in {0.5, 0.9, 0.99} every 100 episodes — diagnostic
for whether the reference algorithm keeps Q bounded (its shipped
ENVELOPE_DQN.pt is bounded at |Q| <= 24) under THIS environment and at
which episode count.

Evidence lands in results/reference_rerun/envelope/. No reference code
is copied; the module is imported read-only.

Usage: python scripts/reference_rerun_envelope.py [--max_episodes 2000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/ENVELOPE_MORL_file"

_TREASURES = [
    (1, 0, 0.7), (2, 1, 8.2), (3, 2, 11.5), (4, 3, 14.0), (4, 4, 15.1),
    (4, 5, 16.1), (7, 6, 19.6), (7, 7, 20.3), (9, 8, 22.4), (10, 9, 23.7),
]
_ROWS = _COLS = 11
_VALUE = np.zeros((_ROWS, _COLS), np.float32)
_DEPTH = np.full((_COLS,), _ROWS, np.int32)
for r, c, v in _TREASURES:
    _VALUE[r, c] = v
    _DEPTH[c] = r


def _make_dst():
    import gymnasium as gym

    class DST:
        observation_space = gym.spaces.Box(0, 10, (2,), np.float32)
        action_space = gym.spaces.Discrete(4)
        reward_dim = 2

        def __init__(self):
            self._r = self._c = self._t = 0

        @property
        def unwrapped(self):
            return self

        def reset(self, seed=None):
            self._r = self._c = self._t = 0
            return np.array([0.0, 0.0], np.float32), {}

        def step(self, a):
            dr = [-1, 1, 0, 0][int(a)]
            dc = [0, 0, -1, 1][int(a)]
            nr = int(np.clip(self._r + dr, 0, _ROWS - 1))
            nc = int(np.clip(self._c + dc, 0, _COLS - 1))
            if nr > _DEPTH[nc]:
                nr, nc = self._r, self._c
            self._r, self._c = nr, nc
            self._t += 1
            treasure = float(_VALUE[nr, nc])
            reward = np.array([treasure, -1.0], np.float32)
            terminated = treasure > 0
            truncated = self._t >= 100 and not terminated
            return (np.array([nr, nc], np.float32), reward, terminated,
                    truncated, {})

    return DST()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_episodes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weight_num", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=256)
    args = ap.parse_args()

    shim = types.ModuleType("mo_gymnasium")
    shim.make = lambda name: _make_dst()
    sys.modules["mo_gymnasium"] = shim
    sys.path.insert(0, REF)

    import torch

    torch.set_num_threads(2)
    from ENVELOPE_DQN import ENVELOPE  # noqa: E402  (reference, read-only)

    np.random.seed(args.seed)
    torch.manual_seed(args.seed)
    env = _make_dst()
    device = torch.device("cpu")
    policy = ENVELOPE([2, 4, 2], False, Qnet_lr=1e-3,
                      buffer_size=1_000_000, device=device, beta=0.95,
                      max_episodes=args.max_episodes)

    out = os.path.join(REPO, "results", "reference_rerun", "envelope")
    os.makedirs(out, exist_ok=True)
    probes = []

    def probe():
        with torch.no_grad():
            row = {}
            for w1 in (0.5, 0.9, 0.99):
                w = torch.tensor([[w1, 1 - w1]], dtype=torch.float32)
                obs = torch.zeros((1, 2))
                q = policy.agent.Qnet(obs, w)[0].numpy()
                row[f"absmax_w{w1}"] = float(np.abs(q).max())
            return row

    epsilon, eps_final = 0.4, 0.05
    eps_delta = (epsilon - eps_final) / args.max_episodes
    gamma, tau = 0.99, 0.01
    start_steps, learn_interval = 500, 1

    t0 = time.time()
    ep = 0
    step = 0
    ep_ret = 0.0
    returns = []
    obs, _ = env.reset(seed=args.seed)
    while ep < args.max_episodes:
        step += 1
        if np.random.rand() < epsilon:
            action = np.random.randint(4)
        else:
            action = policy.select_action(obs)
        next_obs, reward, terminated, truncated, _ = env.step(action)
        done = terminated or truncated
        policy.add(obs, action, reward, next_obs, terminated, gamma)
        ep_ret += float(reward @ np.array([0.5, 0.5]))
        obs = next_obs
        if done:
            returns.append(ep_ret)
            ep_ret = 0.0
            ep += 1
            epsilon -= eps_delta
            obs, _ = env.reset(seed=args.seed)
            if ep % 100 == 0:
                row = dict(ep=ep, ret100=float(np.mean(returns[-100:])),
                           steps=step, wall=round(time.time() - t0, 1),
                           **probe())
                probes.append(row)
                print(json.dumps(row), flush=True)
                with open(os.path.join(out, "probes.json"), "w") as f:
                    json.dump(probes, f, indent=2)
        if step > start_steps and step % learn_interval == 0:
            policy.learn(args.batch_size, gamma, tau, args.weight_num, 1)

    np.save(os.path.join(out, f"ref_rerun_seed_{args.seed}.npy"),
            np.asarray(returns, np.float32))
    print("done:", len(returns), "episodes,", step, "steps,",
          round(time.time() - t0, 1), "s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
