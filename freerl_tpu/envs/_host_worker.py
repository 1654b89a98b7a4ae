"""Jax-free worker entry for HostVecEnv's process pool.

Kept free of jax/flax imports so each spawned worker starts in ~100ms
instead of paying the full framework import (see envs/host.py).
"""
from __future__ import annotations

import numpy as np


def _worker_main(pipe, payload, n_local: int, is_continue: bool):
    """Worker process: owns n_local envs, steps them on command."""
    import cloudpickle

    make_fn = cloudpickle.loads(payload)
    envs = [make_fn() for _ in range(n_local)]
    try:
        while True:
            cmd, data = pipe.recv()
            if cmd == "reset":
                obs = []
                for i, e in enumerate(envs):
                    o, _ = e.reset(seed=int(data) + i)
                    obs.append(np.asarray(o, np.float32).reshape(-1))
                pipe.send(np.stack(obs))
            elif cmd == "step":
                next_obs, carry_obs, rewards, terms, truncs = (
                    [], [], [], [], []
                )
                for e, a in zip(envs, data):
                    if not is_continue:
                        a = int(a)
                    o2, r, term, trunc, _ = e.step(a)
                    o2 = np.asarray(o2, np.float32).reshape(-1)
                    next_obs.append(o2)
                    if term or trunc:
                        o_new, _ = e.reset()
                        carry_obs.append(
                            np.asarray(o_new, np.float32).reshape(-1)
                        )
                    else:
                        carry_obs.append(o2)
                    rewards.append(np.float32(r))
                    terms.append(bool(term))
                    truncs.append(bool(trunc))
                pipe.send((
                    np.stack(next_obs), np.stack(carry_obs),
                    np.asarray(rewards, np.float32),
                    np.asarray(terms), np.asarray(truncs),
                ))
            elif cmd == "close":
                break
    finally:
        for e in envs:
            try:
                e.close()
            except Exception:
                pass
        pipe.close()
