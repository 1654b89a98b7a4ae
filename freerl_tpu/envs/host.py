"""Host-callback env bridge: run real python envs inside the jitted loops.

The pure-JAX envs are the TPU-native fast path, but the reference's
ecosystem includes envs that cannot be re-derived (SMACv2's StarCraft
binary — SURVEY §7 'wrap or defer') and users may want the original
gymnasium/PettingZoo implementations bit-for-bit. This bridge wraps ANY
host python vector of envs behind ``jax.experimental.io_callback`` so the
same jitted training drivers run unchanged: the device computes actions,
one ordered callback steps all N host envs, results flow back as fixed
shapes.

Auto-reset happens host-side (true ``next_obs`` is returned separately
from the post-reset ``carry_obs``, preserving the buffer semantics).
Throughput is host-bound — this is the compatibility path, not the fast
path.

``num_workers > 1`` shards the host envs over worker PROCESSES (spawn +
cloudpickle'd make_fn), stepping the shards concurrently — this realizes
the multiprocessing acceleration the reference only left as a comment
("cuda train / cpu sample", PPO_advance/PPO_cc.py:44-46): the device
trains while a pool of host CPUs steps the python envs.

Usage:
    env = HostVecEnv(lambda: gym.make("LunarLander-v3"), num_envs=16,
                     num_workers=4)
    train_offpolicy(env, algo, OffPolicyConfig(num_envs=16, ...))
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env, StepOut
from freerl_tpu.envs._host_worker import _worker_main


@struct.dataclass
class HostEnvState:
    """Device-side token; the real state lives in host python envs."""

    tick: jnp.ndarray


class HostVecEnv(Env):
    """N host envs stepped in lockstep through one ordered io_callback."""

    def __init__(self, make_fn: Callable, num_envs: int,
                 max_steps: int | None = None, num_workers: int = 0):
        self.make_fn = make_fn
        self.num_envs = num_envs
        self.num_workers = num_workers if num_workers > 1 else 0
        if self.num_workers:
            assert num_envs % self.num_workers == 0, (
                "num_envs must divide evenly over num_workers"
            )
            probe = make_fn()
            self._envs = []
            self._pipes = None    # started lazily (after space probing)
        else:
            self._envs = [make_fn() for _ in range(num_envs)]
            probe = self._envs[0]
        # gymnasium-style spaces
        obs_space = probe.observation_space
        act_space = probe.action_space
        import gymnasium as gym

        if isinstance(act_space, gym.spaces.Box):
            self.dim_info = DimInfo(
                obs_dim=int(np.prod(obs_space.shape)),
                action_dim=int(act_space.shape[0]),
                is_continue=True,
                max_action=float(act_space.high[0]),
            )
        else:
            self.dim_info = DimInfo(
                obs_dim=int(np.prod(obs_space.shape or (1,))),
                action_dim=int(act_space.n),
                is_continue=False,
            )
        spec = getattr(probe, "spec", None)
        self.max_steps = max_steps or (
            getattr(spec, "max_episode_steps", None) or 1000
        )
        self.reward_threshold = getattr(spec, "reward_threshold", None)
        self.name = getattr(spec, "id", "HostVecEnv")
        self._obs_shape = (num_envs, self.dim_info.obs_dim)
        if self.num_workers:
            try:
                probe.close()
            except Exception:
                pass

    # ------------------------------------------------------------------
    def _ensure_workers(self):
        if self._pipes is not None:
            return
        import multiprocessing as mp

        import cloudpickle

        ctx = mp.get_context("forkserver")  # clean server process:
        # no __main__ re-exec (spawn breaks under pytest/stdin mains) and
        # no fork of the live TPU/grpc client threads. Override the
        # default ['__main__'] preload — guardless entry scripts (pytest's
        # console script) would otherwise EXECUTE inside the forkserver.
        ctx.set_forkserver_preload(["freerl_tpu.envs._host_worker"])
        payload = cloudpickle.dumps(self.make_fn)
        n_local = self.num_envs // self.num_workers
        self._pipes, self._procs = [], []
        for _ in range(self.num_workers):
            parent, child = ctx.Pipe()
            p = ctx.Process(
                target=_worker_main,
                args=(child, payload, n_local, self.dim_info.is_continue),
                daemon=True,
            )
            p.start()
            child.close()
            self._pipes.append(parent)
            self._procs.append(p)

    def close(self):
        if self.num_workers and self._pipes is not None:
            for pipe in self._pipes:
                try:
                    pipe.send(("close", None))
                    pipe.close()
                except Exception:
                    pass
            for p in self._procs:
                p.join(timeout=5)
            self._pipes = None

    # ------------------------------------------------------------------
    def _host_reset(self, seed):
        if self.num_workers:
            self._ensure_workers()
            n_local = self.num_envs // self.num_workers
            for w, pipe in enumerate(self._pipes):
                pipe.send(("reset", int(seed) + w * n_local))
            return np.concatenate([pipe.recv() for pipe in self._pipes])
        obs = []
        for i, e in enumerate(self._envs):
            o, _ = e.reset(seed=int(seed) + i)
            obs.append(np.asarray(o, np.float32).reshape(-1))
        return np.stack(obs)

    def _host_step(self, actions):
        actions = np.asarray(actions)
        if self.num_workers:
            # scatter shards to all workers, then gather — the shards step
            # concurrently in separate processes (no GIL contention)
            shards = np.split(actions, self.num_workers)
            for pipe, shard in zip(self._pipes, shards):
                pipe.send(("step", shard))
            outs = [pipe.recv() for pipe in self._pipes]
            return tuple(
                np.concatenate([o[i] for o in outs]) for i in range(5)
            )
        next_obs, carry_obs, rewards, terms, truncs = [], [], [], [], []
        for e, a in zip(self._envs, actions):
            if not self.dim_info.is_continue:
                a = int(a)
            o2, r, term, trunc, _ = e.step(a)
            o2 = np.asarray(o2, np.float32).reshape(-1)
            next_obs.append(o2)
            if term or trunc:
                o_new, _ = e.reset()
                carry_obs.append(np.asarray(o_new, np.float32).reshape(-1))
            else:
                carry_obs.append(o2)
            rewards.append(np.float32(r))
            terms.append(bool(term))
            truncs.append(bool(trunc))
        return (
            np.stack(next_obs), np.stack(carry_obs),
            np.asarray(rewards, np.float32),
            np.asarray(terms), np.asarray(truncs),
        )

    # ------------------------------------------------------------------
    # vectorized protocol consumed by the training drivers (envs/base.py
    # vec_reset / vec_step_auto_reset delegate here when present)
    def vec_reset(self, key, num_envs):
        assert num_envs == self.num_envs, (
            "HostVecEnv is fixed-size; construct with the loop's num_envs"
        )
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct(self._obs_shape, jnp.float32),
            seed, ordered=True,
        )
        return HostEnvState(tick=jnp.int32(0)), obs

    def vec_step_auto_reset(self, state, action, key, num_envs) -> StepOut:
        n = self.num_envs
        out_shapes = (
            jax.ShapeDtypeStruct(self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct(self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.bool_),
            jax.ShapeDtypeStruct((n,), jnp.bool_),
        )
        next_obs, carry_obs, reward, term, trunc = (
            jax.experimental.io_callback(
                self._host_step, out_shapes, action, ordered=True
            )
        )
        return StepOut(
            state=HostEnvState(tick=state.tick + 1),
            carry_obs=carry_obs,
            next_obs=next_obs,
            reward=reward,
            terminated=term,
            truncated=trunc,
        )
