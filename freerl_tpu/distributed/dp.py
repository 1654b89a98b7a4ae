"""Data-parallel actor-learner over a device mesh.

The reference has NO distributed backend (single process, `.to(device)` —
SURVEY §2.8); this layer is the TPU-native scale-out mandated by
BASELINE.json: envs and replay shards live per-device, parameters are
replicated, and gradients sync with a psum/pmean over ICI inside a
`shard_map`'d update — XLA collectives are the whole communication backend
(no NCCL/MPI analogue needed).

Layout: every device runs ``num_envs / n_devices`` env instances and owns a
shard-local replay ring — experience never crosses chips, only gradients do,
which is the bandwidth-optimal layout for RL (transitions are bulky, grads of
a 128-wide MLP are ~100KB). The learner runs under ``axis_name='dp'``; the
algo's ``update`` pmean-reduces gradients when its config carries that axis
name, so all replicas apply identical optimizer steps and parameters stay
replicated with no broadcast.

Two entry points:
  - :func:`train_offpolicy_sharded` — the production driver:
    ``lax.scan``-chunked like train/loop.py (one XLA dispatch per
    ``chunk_size`` vector steps), per-device chronological episode records
    merged host-side by completion step. ``train_offpolicy(..., mesh=m)``
    delegates here.
  - :func:`dp_env_learner_step` — a single-step builder kept for dry-runs
    and step-level tests.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental (check_rep→check_vma)
    from jax import shard_map as _shard_map
    _REP_KW = "check_vma"
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _REP_KW = "check_rep"


def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **{_REP_KW: check_rep})

from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import (Env, record_scalarize,
                                  vec_reset, vec_step_auto_reset)

_BIG = jnp.int32(1_000_000_000)  # "past all warmups" step count


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(mesh_utils.create_device_mesh((n,), devs[:n]), (axis,))


def _algo_state_specs(state, dev, rep):
    """Per-leaf partition specs for a replicated algo state.

    Almost every leaf (params, optimizer, normalizer stats) is replicated
    — gradients and normalizer moments are pmean-synced. The exceptions
    are PER-ENV state living inside the algo state, which must shard with
    the env axis:
      - ``RewardScaling.ret`` (PPO/MAPPO reward_scaling trick): the
        per-env running discounted return;
      - ``ou_state`` (DDPG OUNoise supplement): per-env correlated noise.
    """
    from jax.tree_util import tree_map_with_path

    def pick(path, _leaf):
        names = tuple(
            n for n in (
                getattr(p, "name", getattr(p, "key", None)) for p in path
            ) if isinstance(n, str)
        )
        if names and names[-1] == "ret" and "rew_scale" in names:
            return dev
        if names and names[-1] == "ou_state":
            return dev
        return rep

    return tree_map_with_path(pick, state)


def _example_transition(env: Env, algo=None) -> Transition:
    di = env.dim_info
    if di.is_continue:
        action = jnp.zeros((di.action_dim,), jnp.float32)
    elif algo is not None and hasattr(algo, "stored_action_example"):
        action = algo.stored_action_example()
    else:
        action = jnp.zeros((), jnp.int32)
    rdim = getattr(env, "reward_dim", 1)
    reward = jnp.zeros((rdim,) if rdim > 1 else (), jnp.float32)
    return Transition(
        obs=jnp.zeros((di.obs_dim,), jnp.float32),
        action=action,
        reward=reward,
        next_obs=jnp.zeros((di.obs_dim,), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        episode_done=jnp.zeros((), jnp.bool_),
    )


def _merge_records(counts, rets, steps, max_episodes):
    """Merge per-device chronological episode records into one curve.

    Orders episodes by (completion vector-step, device) so the merged
    artifact matches the single-device drivers' chronological format.
    ``rets`` is (n_dev, cap) or (n_dev, cap, A).
    """
    counts = np.asarray(counts)
    rets = np.asarray(rets)
    steps = np.asarray(steps)
    rows, vals = [], []
    for d in range(len(counts)):
        # lazy host-sync lets the loop overshoot max_episodes, so the
        # counter can exceed the record capacity; slots past it were
        # dropped at write time (mode="drop")
        n = min(int(counts[d]), rets.shape[1])
        rows.append(np.stack([steps[d, :n], np.full(n, d)], axis=1))
        vals.append(rets[d, :n])
    keys_m = np.concatenate(rows, axis=0) if rows else np.zeros((0, 2))
    vals_m = (np.concatenate(vals, axis=0) if vals
              else np.zeros((0,) + rets.shape[2:]))
    order = np.lexsort((keys_m[:, 1], keys_m[:, 0]))
    return vals_m[order][:max_episodes]


# ---------------------------------------------------------------------------
# production driver: scan-chunked shard_map training loop
# ---------------------------------------------------------------------------
@struct.dataclass
class ShardCarry:
    """Global view of the sharded loop state.

    Arrays with a leading device axis (size n_dev) are shard-local state;
    ``algo_state``/``key``/``total_steps``/``update_count`` are replicated.
    """
    algo_state: object
    buffer: object                 # (n_dev, ...) shard-local replay rings
    env_state: object              # (num_envs, ...) split across devices
    obs: jnp.ndarray
    key: jax.Array
    ep_return: jnp.ndarray         # (num_envs,)
    done_prev: jnp.ndarray         # (num_envs,)
    ep_counter: jnp.ndarray        # (n_dev,) per-device completed episodes
    episode_returns: jnp.ndarray   # (n_dev, cap) per-device chronological
    episode_steps: jnp.ndarray     # (n_dev, cap) completion vector-step
    total_steps: jnp.ndarray       # scalar, replicated
    update_count: jnp.ndarray      # scalar, replicated


def train_offpolicy_sharded(env: Env, algo, cfg, mesh: Mesh,
                            axis: str = "dp", on_chunk=None):
    """Data-parallel twin of train/loop.py's ``train_offpolicy``.

    Same algorithm contract and reference conventions (start_steps warmup,
    done_bool-into-buffer, chronological episode record), but the chunked
    ``lax.scan`` runs inside a ``shard_map`` over ``mesh``: each device
    steps its env slice, writes its own replay shard, and the learner
    burst's gradients pmean over ``axis`` (the algo's config must carry
    ``axis_name=axis`` — asserted below). The merged episode curve orders
    per-device records by completion step, so the artifact format matches
    the single-device driver's.

    Note: algos whose ``process_obs`` mutates running normalizer stats
    would de-replicate that state across devices; the driver asserts the
    algo doesn't opt into stateful obs processing unless it declares
    ``dp_safe_process_obs = True`` (i.e. it pmean-syncs internally).
    """
    from freerl_tpu.algos.base import ExploreCtx

    n_dev = mesh.devices.size
    num_envs = cfg.num_envs
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    envs_per_dev = num_envs // n_dev
    aname = getattr(algo.cfg, "axis_name", None)
    assert aname == axis, (
        f"algo config must carry axis_name={axis!r} so learn_step pmean-"
        f"syncs gradients (got {aname!r})"
    )
    # an episode costs >=1 env step, so the record never needs more
    # slots than the step budget (guards huge max_episodes sentinels);
    # include the final chunk's overshoot past max_env_steps
    record_cap = min(
        cfg.max_episodes,
        cfg.max_env_steps + cfg.chunk_size * cfg.num_envs,
    ) + envs_per_dev + 1

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_env, k_loop = jax.random.split(key, 3)
    algo_state = algo.init(k_algo)
    # params/opt/normalizer stats replicate; per-env leaves (e.g. DDPG's
    # OU noise state) shard with the env axis
    state_spec = _algo_state_specs(algo_state, P(axis), P())

    def _shard_init(k):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(k, me)
        env_state, obs = vec_reset(env, k, envs_per_dev)
        buffer = algo.make_buffer(_example_transition(env, algo),
                                  num_envs=envs_per_dev)
        buffer = jax.tree.map(lambda x: x[None], buffer)
        return env_state, obs, buffer

    with mesh:
        env_state, obs, buffer = jax.jit(shard_map(
            _shard_init, mesh=mesh, in_specs=P(), out_specs=P(axis),
            check_rep=False,
        ))(k_env)

    carry = ShardCarry(
        algo_state=algo_state,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        key=k_loop,
        ep_return=jnp.zeros((num_envs,), jnp.float32),
        done_prev=jnp.zeros((num_envs,), jnp.bool_),
        ep_counter=jnp.zeros((n_dev,), jnp.int32),
        episode_returns=jnp.zeros((n_dev, record_cap), jnp.float32),
        episode_steps=jnp.full((n_dev, record_cap), jnp.int32(2**30)),
        total_steps=jnp.int32(0),
        update_count=jnp.int32(0),
    )

    def step_fn(c, _):
        # shard-local view: buffer/records carry a leading (1,) device axis
        k, k_base = jax.random.split(c["key"])
        me = jax.lax.axis_index(axis)
        kk = jax.random.fold_in(k_base, me)
        k_act, k_step, k_learn, k_add = jax.random.split(kk, 4)
        total_env_steps = c["total_steps"] * num_envs

        ctx = ExploreCtx(
            total_env_steps=total_env_steps,
            episodes=jnp.sum(c["ep_counter"]),
            done_prev=c["done_prev"],
            random_steps=cfg.random_steps,
        )
        if hasattr(algo, "explore_stored"):
            algo_state, action, stored = algo.explore_stored(
                c["algo_state"], c["obs"], k_act, ctx
            )
        else:
            algo_state, action = algo.explore(c["algo_state"], c["obs"],
                                              k_act, ctx)
            stored = action
        out = vec_step_auto_reset(env, c["env_state"], action, k_step,
                                  envs_per_dev)
        algo_state, next_obs, carry_obs = algo.process_obs(
            algo_state, out.next_obs, out.carry_obs
        )
        trans = Transition(
            obs=c["obs"], action=stored, reward=out.reward,
            next_obs=next_obs, done=out.terminated,
            episode_done=out.episode_done,
        )
        buffer = jax.tree.map(lambda x: x[0], c["buffer"])
        if hasattr(algo, "add_transition"):
            algo_state, buffer = algo.add_transition(
                algo_state, buffer, trans, k_add
            )
        else:
            buffer = buffer.add(trans)

        # per-device chronological episode record + completion step
        step_reward = record_scalarize(env, out.reward)
        ret = c["ep_return"] + step_reward
        dones = out.episode_done
        n_count = c["ep_counter"][0]
        offs = jnp.cumsum(dones.astype(jnp.int32)) - 1
        slot = jnp.where(dones, n_count + offs, record_cap)
        episode_returns = c["episode_returns"][0].at[slot].set(
            ret, mode="drop"
        )
        episode_steps = c["episode_steps"][0].at[slot].set(
            c["total_steps"], mode="drop"
        )
        ep_counter = n_count + jnp.sum(dones.astype(jnp.int32))
        ep_return = jnp.where(dones, 0.0, ret)

        total_steps = c["total_steps"] + 1
        env_steps_now = total_steps * num_envs
        do_learn = jnp.logical_and(
            env_steps_now > cfg.start_steps,
            (total_steps
             % max(cfg.learn_interval_steps // num_envs, 1)) == 0,
        )

        def burst(args):
            s, b, kb = args

            def one(i, acc):
                s, b = acc
                s, b, _ = algo.learn_step(
                    s, b, jax.random.fold_in(kb, i), envs_per_dev
                )
                return (s, b)

            return jax.lax.fori_loop(0, cfg.updates_per_burst, one, (s, b))

        algo_state, buffer = jax.lax.cond(
            do_learn, burst, lambda a: (a[0], a[1]),
            (algo_state, buffer, k_learn),
        )
        update_count = c["update_count"] + jnp.where(
            do_learn, cfg.updates_per_burst, 0
        )
        new_c = dict(
            algo_state=algo_state,
            buffer=jax.tree.map(lambda x: x[None], buffer),
            env_state=out.state,
            obs=carry_obs,
            key=k,
            ep_return=ep_return,
            done_prev=dones,
            ep_counter=ep_counter[None],
            episode_returns=episode_returns[None],
            episode_steps=episode_steps[None],
            total_steps=total_steps,
            update_count=update_count,
        )
        return new_c, None

    def _shard_chunk(c):
        c, _ = jax.lax.scan(step_fn, c, None, length=cfg.chunk_size)
        return c

    rep = P()
    dev = P(axis)
    spec = dict(
        algo_state=state_spec, buffer=dev, env_state=dev, obs=dev,
        key=rep, ep_return=dev, done_prev=dev, ep_counter=dev,
        episode_returns=dev, episode_steps=dev, total_steps=rep,
        update_count=rep,
    )
    as_dict = lambda c: {f: getattr(c, f) for f in spec}
    sharded_chunk = shard_map(
        _shard_chunk, mesh=mesh,
        in_specs=(spec,), out_specs=spec, check_rep=False,
    )

    @partial(jax.jit, donate_argnums=0)
    def run_chunk(cd):
        return sharded_chunk(cd)

    carry_d = jax.tree.map(jnp.copy, as_dict(carry))
    t0 = time.time()
    chunk_i = 0
    n_eps = 0
    sync_every = getattr(cfg, "host_sync_every", 4)
    with mesh:
        while True:
            carry_d = run_chunk(carry_d)
            chunk_i += 1
            # lazy episode-count sync (a tunnel readback is ~60 ms)
            n_steps = chunk_i * cfg.chunk_size * num_envs
            if (chunk_i % sync_every == 0
                    or n_steps >= cfg.max_env_steps):
                n_eps = int(jnp.sum(carry_d["ep_counter"]))
            if on_chunk is not None and chunk_i % cfg.log_every_chunks == 0:
                on_chunk(chunk_i, n_eps, n_steps, ShardCarry(**carry_d))
            if (cfg.checkpoint_dir and cfg.checkpoint_every_chunks
                    and chunk_i % cfg.checkpoint_every_chunks == 0):
                from freerl_tpu.train.runio import save_checkpoint

                save_checkpoint(f"{cfg.checkpoint_dir}/ckpt",
                                carry_d["algo_state"])
            if n_eps >= cfg.max_episodes or n_steps >= cfg.max_env_steps:
                break
    elapsed = time.time() - t0

    counts = np.asarray(carry_d["ep_counter"])
    returns = _merge_records(counts, carry_d["episode_returns"],
                             carry_d["episode_steps"], cfg.max_episodes)

    n_steps = int(carry_d["total_steps"]) * num_envs
    info = {
        "elapsed_s": elapsed,
        "env_steps": n_steps,
        "updates": int(carry_d["update_count"]),
        "env_steps_per_s": n_steps / max(elapsed, 1e-9),
        "episodes": int(counts.sum()),
        "n_devices": n_dev,
    }
    return carry_d["algo_state"], returns.astype(np.float32), info


# ---------------------------------------------------------------------------
# production driver: sharded off-policy MARL (MADDPG / MATD3 / MASAC /
# MAAC family)
# ---------------------------------------------------------------------------
def train_marl_sharded(env: Env, algo, cfg, mesh: Mesh,
                       axis: str = "dp", on_chunk=None):
    """Data-parallel twin of train/marl.py's ``train_marl``.

    Same layout strategy as :func:`train_offpolicy_sharded` — per-device
    env slices and shard-local replay rings, pmean-synced per-agent
    learners (every agent's actor AND critic gradients reduce over
    ``axis`` inside the algo's update; MADDPG/MASAC/MAAC already carry
    the ``axis_name`` hook) — with the MARL carry shapes: obs
    ``(N, A, O)``, per-agent rewards ``(N, A)``, episode records
    ``(cap, A)``. The reference has no multi-agent scale-out at all
    (single env, ``.to(device)`` — SURVEY §2.8); this covers BASELINE's
    scale-out mandate for the MARL capability surface.
    """
    from freerl_tpu.algos.base import ExploreCtx
    from freerl_tpu.train.marl import _example_transition as _marl_example

    n_dev = mesh.devices.size
    num_envs = cfg.num_envs
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    envs_per_dev = num_envs // n_dev
    A = env.n_agents
    aname = getattr(algo.cfg, "axis_name", None)
    assert aname == axis, (
        f"algo config must carry axis_name={axis!r} so per-agent updates "
        f"pmean-sync gradients (got {aname!r})"
    )
    record_cap = min(
        cfg.max_episodes,
        cfg.max_env_steps + cfg.chunk_size * num_envs,
    ) + envs_per_dev + 1

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_env, k_loop = jax.random.split(key, 3)
    algo_state = algo.init(k_algo)
    state_spec = _algo_state_specs(algo_state, P(axis), P())

    def _shard_init(k):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(k, me)
        env_state, obs = vec_reset(env, k, envs_per_dev)
        buffer = algo.make_buffer(_marl_example(env),
                                  num_envs=envs_per_dev)
        buffer = jax.tree.map(lambda x: x[None], buffer)
        return env_state, obs, buffer

    with mesh:
        env_state, obs, buffer = jax.jit(shard_map(
            _shard_init, mesh=mesh, in_specs=P(), out_specs=P(axis),
            check_rep=False,
        ))(k_env)

    carry = dict(
        algo_state=algo_state,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        key=k_loop,
        ep_return=jnp.zeros((num_envs, A), jnp.float32),
        done_prev=jnp.zeros((num_envs,), jnp.bool_),
        ep_counter=jnp.zeros((n_dev,), jnp.int32),
        episode_returns=jnp.zeros((n_dev, record_cap, A), jnp.float32),
        episode_steps=jnp.full((n_dev, record_cap), jnp.int32(2**30)),
        total_steps=jnp.int32(0),
        update_count=jnp.int32(0),
    )

    def step_fn(c, _):
        k, k_base = jax.random.split(c["key"])
        me = jax.lax.axis_index(axis)
        kk = jax.random.fold_in(k_base, me)
        k_act, k_step, k_learn = jax.random.split(kk, 3)
        total_env_steps = c["total_steps"] * num_envs

        ctx = ExploreCtx(
            total_env_steps=total_env_steps,
            episodes=jnp.sum(c["ep_counter"]),
            done_prev=c["done_prev"],
            random_steps=cfg.random_steps,
        )
        algo_state, action = algo.explore(
            c["algo_state"], c["obs"], k_act, ctx
        )
        env_action = (
            (action + 1.0) / 2.0 if env.dim_info.is_continue else action
        )
        out = vec_step_auto_reset(env, c["env_state"], env_action, k_step,
                                  envs_per_dev)
        trans = Transition(
            obs=c["obs"], action=action, reward=out.reward,
            next_obs=out.next_obs, done=out.terminated,
            episode_done=out.episode_done,
        )
        buffer = jax.tree.map(lambda x: x[0], c["buffer"]).add(trans)

        ret = c["ep_return"] + out.reward                  # (N_dev, A)
        dones = out.episode_done
        n_count = c["ep_counter"][0]
        offs = jnp.cumsum(dones.astype(jnp.int32)) - 1
        slot = jnp.where(dones, n_count + offs, record_cap)
        episode_returns = c["episode_returns"][0].at[slot].set(
            ret, mode="drop"
        )
        episode_steps = c["episode_steps"][0].at[slot].set(
            c["total_steps"], mode="drop"
        )
        ep_counter = n_count + jnp.sum(dones.astype(jnp.int32))
        ep_return = jnp.where(dones[:, None], 0.0, ret)

        total_steps = c["total_steps"] + 1
        do_learn = (total_steps * num_envs) > cfg.start_steps

        def burst(args):
            s, b, kb = args

            def one(i, acc):
                s, b = acc
                s, b, _ = algo.learn_step(
                    s, b, jax.random.fold_in(kb, i), envs_per_dev
                )
                return (s, b)

            return jax.lax.fori_loop(0, cfg.updates_per_burst, one, (s, b))

        algo_state, buffer = jax.lax.cond(
            do_learn, burst, lambda a: (a[0], a[1]),
            (algo_state, buffer, k_learn),
        )
        update_count = c["update_count"] + jnp.where(
            do_learn, cfg.updates_per_burst, 0
        )
        new_c = dict(
            algo_state=algo_state,
            buffer=jax.tree.map(lambda x: x[None], buffer),
            env_state=out.state,
            obs=out.carry_obs,
            key=k,
            ep_return=ep_return,
            done_prev=dones,
            ep_counter=ep_counter[None],
            episode_returns=episode_returns[None],
            episode_steps=episode_steps[None],
            total_steps=total_steps,
            update_count=update_count,
        )
        return new_c, None

    def _shard_chunk(c):
        c, _ = jax.lax.scan(step_fn, c, None, length=cfg.chunk_size)
        return c

    rep = P()
    dev = P(axis)
    spec = dict(
        algo_state=state_spec, buffer=dev, env_state=dev, obs=dev,
        key=rep, ep_return=dev, done_prev=dev, ep_counter=dev,
        episode_returns=dev, episode_steps=dev, total_steps=rep,
        update_count=rep,
    )
    sharded_chunk = shard_map(
        _shard_chunk, mesh=mesh,
        in_specs=(spec,), out_specs=spec, check_rep=False,
    )

    @partial(jax.jit, donate_argnums=0)
    def run_chunk(cd):
        return sharded_chunk(cd)

    carry_d = jax.tree.map(jnp.copy, carry)
    t0 = time.time()
    chunk_i = 0
    n_eps = 0
    sync_every = getattr(cfg, "host_sync_every", 4)
    with mesh:
        while True:
            carry_d = run_chunk(carry_d)
            chunk_i += 1
            n_steps = chunk_i * cfg.chunk_size * num_envs
            if (chunk_i % sync_every == 0
                    or n_steps >= cfg.max_env_steps):
                n_eps = int(jnp.sum(carry_d["ep_counter"]))
            if on_chunk is not None and chunk_i % cfg.log_every_chunks == 0:
                on_chunk(chunk_i, n_eps, n_steps, carry_d)
            if (cfg.checkpoint_dir and cfg.checkpoint_every
                    and chunk_i % cfg.checkpoint_every == 0):
                from freerl_tpu.train.runio import save_checkpoint

                save_checkpoint(f"{cfg.checkpoint_dir}/ckpt",
                                carry_d["algo_state"])
            if n_eps >= cfg.max_episodes or n_steps >= cfg.max_env_steps:
                break
    elapsed = time.time() - t0

    counts = np.asarray(carry_d["ep_counter"])
    returns = _merge_records(counts, carry_d["episode_returns"],
                             carry_d["episode_steps"], cfg.max_episodes)

    n_steps = int(carry_d["total_steps"]) * num_envs
    info = {
        "elapsed_s": elapsed,
        "env_steps": n_steps,
        "updates": int(carry_d["update_count"]),
        "env_steps_per_s": n_steps / max(elapsed, 1e-9),
        "episodes": int(counts.sum()),
        "n_devices": n_dev,
    }
    return carry_d["algo_state"], returns.astype(np.float32), info


# ---------------------------------------------------------------------------
# production driver: sharded on-policy (PPO / MAPPO family)
# ---------------------------------------------------------------------------
def train_onpolicy_sharded(env: Env, algo, cfg, mesh: Mesh,
                           axis: str = "dp", on_iter=None):
    """Data-parallel twin of train/onpolicy.py's ``train_onpolicy``.

    Each device rolls its ``num_envs / n_devices`` env slice for the scan
    horizon, then the full K-epoch minibatch update runs per shard with
    pmean-reduced gradients (the algo's config must carry
    ``axis_name=axis``): the effective minibatch is ``minibatch_size *
    n_devices``, the canonical DP semantic. The normalization tricks stay
    EXACT under sharding — obs/reward running stats and adv_norm compute
    global-batch moments via pmean (see core/normalization.py), so the
    normalizer state remains replicated.

    Episode curves use the same per-device chronological record + merge
    by completion step as :func:`train_offpolicy_sharded`, so artifacts
    are format-compatible with the single-device driver's.

    Recurrent policies (algos/rmappo.py) are an explicit non-goal for
    the sharded drivers (decided r4): their update samples EPISODE
    CHUNKS for truncated BPTT rather than flat minibatches, so the DP
    semantics differ (per-device chunk boundaries vs the global
    chronological episode order), and the reference has no recurrent
    MARL at all to set parity expectations. The per-env GRU carries
    would shard cleanly with the env axis if this is ever revisited —
    the blocker is the episode-chunk minibatch layout, not the state.
    """
    n_dev = mesh.devices.size
    num_envs = cfg.num_envs
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    envs_per_dev = num_envs // n_dev
    aname = getattr(algo.cfg, "axis_name", None)
    assert aname == axis, (
        f"algo config must carry axis_name={axis!r} so update pmean-syncs "
        f"gradients and normalizer stats (got {aname!r})"
    )
    assert not hasattr(algo, "init_policy_carry"), (
        "recurrent on-policy algos are not supported by the sharded driver"
    )
    from freerl_tpu.algos.ppo import Rollout

    T = max(cfg.horizon // num_envs, 1)
    # include the final iteration's overshoot past max_env_steps
    record_cap = min(
        cfg.max_episodes, cfg.max_env_steps + T * cfg.num_envs
    ) + envs_per_dev + 1
    n_agents = getattr(env, "n_agents", 1)
    remap01 = (
        getattr(env, "action_space_01", False) and env.dim_info.is_continue
    )

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_env, k_loop = jax.random.split(key, 3)
    algo_state = algo.init(k_algo)
    # params/opt/normalizer stats replicate; per-env leaves (e.g. the
    # reward_scaling running return) shard with the env axis
    state_spec = _algo_state_specs(algo_state, P(axis), P())

    def _shard_init(state, k):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(k, me)
        env_state, obs = vec_reset(env, k, envs_per_dev)
        state, _, obs = algo.process_obs(state, obs, obs)
        return state, env_state, obs

    with mesh:
        algo_state, env_state, obs = jax.jit(shard_map(
            _shard_init, mesh=mesh, in_specs=(state_spec, P()),
            out_specs=(state_spec, P(axis), P(axis)), check_rep=False,
        ))(algo_state, k_env)

    rec_shape = (
        (n_dev, record_cap, n_agents) if n_agents > 1
        else (n_dev, record_cap)
    )
    carry = dict(
        algo_state=algo_state,
        env_state=env_state,
        obs=obs,
        key=k_loop,
        ep_return=jnp.zeros(
            (num_envs, n_agents) if n_agents > 1 else (num_envs,),
            jnp.float32,
        ),
        ep_counter=jnp.zeros((n_dev,), jnp.int32),
        episode_returns=jnp.zeros(rec_shape, jnp.float32),
        episode_steps=jnp.full((n_dev, record_cap), jnp.int32(2**30)),
        total_steps=jnp.int32(0),
    )

    def rollout_step(c, _):
        k, k_base = jax.random.split(c["key"])
        me = jax.lax.axis_index(axis)
        kk = jax.random.fold_in(k_base, me)
        k_act, k_step = jax.random.split(kk)
        env_a, stored_a, logp = algo.sample_action(
            c["algo_state"], c["obs"], k_act
        )
        if remap01:
            env_a = (env_a + 1.0) / 2.0
        out = vec_step_auto_reset(env, c["env_state"], env_a, k_step,
                                  envs_per_dev)
        algo_state, reward = algo.process_reward(
            c["algo_state"], out.reward, out.episode_done
        )
        algo_state, next_obs, carry_obs = algo.process_obs(
            algo_state, out.next_obs, out.carry_obs
        )

        # per-device chronological episode record on RAW rewards
        ret = c["ep_return"] + out.reward
        dones = out.episode_done
        n_count = c["ep_counter"][0]
        offs = jnp.cumsum(dones.astype(jnp.int32)) - 1
        slot = jnp.where(dones, n_count + offs, record_cap)
        episode_returns = c["episode_returns"][0].at[slot].set(
            ret, mode="drop"
        )
        episode_steps = c["episode_steps"][0].at[slot].set(
            c["total_steps"], mode="drop"
        )
        ep_counter = n_count + jnp.sum(dones.astype(jnp.int32))
        dmask = dones[:, None] if n_agents > 1 else dones
        ep_return = jnp.where(dmask, 0.0, ret)

        step_data = Rollout(
            obs=c["obs"], action=stored_a, log_pi=logp, reward=reward,
            next_obs=next_obs, done=out.terminated,
            adv_done=out.episode_done,
        )
        new_c = dict(
            algo_state=algo_state, env_state=out.state, obs=carry_obs,
            key=k, ep_return=ep_return, ep_counter=ep_counter[None],
            episode_returns=episode_returns[None],
            episode_steps=episode_steps[None],
            total_steps=c["total_steps"] + 1,
        )
        return new_c, step_data

    def _shard_iteration(c):
        # shard-local view: records carry a leading (1,) device axis
        c, rollout = jax.lax.scan(rollout_step, c, None, length=T)
        k, k_upd = jax.random.split(c["key"])
        episodes = jax.lax.psum(c["ep_counter"][0], axis)
        algo_state, metrics = algo.update(
            c["algo_state"], rollout, k_upd, episodes=episodes
        )
        c = dict(c, algo_state=algo_state, key=k)
        return c, metrics

    rep, dev = P(), P(axis)
    spec = dict(
        algo_state=state_spec, env_state=dev, obs=dev, key=rep,
        ep_return=dev, ep_counter=dev, episode_returns=dev,
        episode_steps=dev, total_steps=rep,
    )
    sharded_iter = shard_map(
        _shard_iteration, mesh=mesh, in_specs=(spec,),
        out_specs=(spec, rep), check_rep=False,
    )

    @partial(jax.jit, donate_argnums=0)
    def run_iteration(cd):
        return sharded_iter(cd)

    carry_d = jax.tree.map(jnp.copy, carry)
    t0 = time.time()
    it = 0
    n_eps = 0
    log_every = getattr(cfg, "log_every_iters", 10)
    sync_every = getattr(cfg, "host_sync_every", 4)
    with mesh:
        while True:
            carry_d, metrics = run_iteration(carry_d)
            it += 1
            n_steps = it * T * num_envs
            if (it % sync_every == 0
                    or n_steps >= cfg.max_env_steps):
                n_eps = int(jnp.sum(carry_d["ep_counter"]))
            if on_iter is not None and it % log_every == 0:
                import types

                on_iter(it, n_eps, n_steps,
                        types.SimpleNamespace(
                            algo_state=carry_d["algo_state"]),
                        metrics)
            if (getattr(cfg, "checkpoint_dir", None)
                    and getattr(cfg, "checkpoint_every", 0)
                    and it % cfg.checkpoint_every == 0):
                from freerl_tpu.train.runio import save_checkpoint

                save_checkpoint(f"{cfg.checkpoint_dir}/ckpt",
                                carry_d["algo_state"])
            if n_eps >= cfg.max_episodes or n_steps >= cfg.max_env_steps:
                break
    elapsed = time.time() - t0

    # merge per-device chronological records by completion vector-step
    counts = np.asarray(carry_d["ep_counter"])
    returns = _merge_records(counts, carry_d["episode_returns"],
                             carry_d["episode_steps"], cfg.max_episodes)

    n_steps = int(carry_d["total_steps"]) * num_envs
    info = {
        "elapsed_s": elapsed,
        "env_steps": n_steps,
        "iterations": it,
        "env_steps_per_s": n_steps / max(elapsed, 1e-9),
        "episodes": int(counts.sum()),
        "n_devices": n_dev,
    }
    return carry_d["algo_state"], returns.astype(np.float32), info


# ---------------------------------------------------------------------------
# single-step builder (dry-runs / step-level tests)
# ---------------------------------------------------------------------------
def dp_env_learner_step(env: Env, algo, mesh: Mesh, envs_per_device: int,
                        axis: str = "dp"):
    """Build a single sharded full training step.

    Returns ``(init_fn, step_fn)``:
      - ``init_fn(seed) -> carry``: replicated algo state, per-device env
        batches and replay shards (shard-local leading device axis);
      - ``step_fn(carry) -> (carry, metrics)``: one vectorized env step,
        shard-local buffer add + sample, and a collective-synchronized
        gradient update — one XLA program.
    """

    # ------------------------------------------------------------------
    def _shard_init(key):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key, me)
        env_state, obs = vec_reset(env, k, envs_per_device)
        buffer = algo.make_buffer(_example_transition(env),
                                  num_envs=envs_per_device)
        # re-add the device axis stripped by out_specs=P(axis)
        buffer = jax.tree.map(lambda x: x[None], buffer)
        return env_state, obs, buffer

    def init_fn(seed: int):
        key = jax.random.PRNGKey(seed)
        k_algo, k_env = jax.random.split(key)
        algo_state = algo.init(k_algo)
        init_sharded = jax.jit(
            shard_map(
                _shard_init, mesh=mesh, in_specs=P(), out_specs=P(axis),
                check_rep=False,
            )
        )
        env_state, obs, buffer = init_sharded(k_env)
        return dict(
            algo_state=algo_state,
            env_state=env_state,
            obs=obs,
            buffer=buffer,
            key=key,
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _shard_step(algo_state, env_state, obs, buffer, key, step):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(jax.random.fold_in(key, me), step)
        k_act, k_step, k_learn = jax.random.split(k, 3)
        buffer = jax.tree.map(lambda x: x[0], buffer)  # strip device axis

        from freerl_tpu.algos.base import ExploreCtx

        ctx = ExploreCtx(
            total_env_steps=_BIG,
            episodes=jnp.int32(0),
            done_prev=jnp.zeros((envs_per_device,), jnp.bool_),
            random_steps=0,
        )
        algo_state, action = algo.explore(algo_state, obs, k_act, ctx)
        out = vec_step_auto_reset(env, env_state, action, k_step,
                                  envs_per_device)
        trans = Transition(
            obs=obs,
            action=action,
            reward=out.reward,
            next_obs=out.next_obs,
            done=out.terminated,
            episode_done=out.episode_done,
        )
        buffer = buffer.add(trans)
        algo_state, buffer, metrics = algo.learn_step(
            algo_state, buffer, k_learn, envs_per_device
        )
        buffer = jax.tree.map(lambda x: x[None], buffer)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        metrics = dict(
            metrics, mean_reward=jax.lax.pmean(jnp.mean(out.reward), axis)
        )
        return algo_state, out.state, out.carry_obs, buffer, metrics

    sharded = shard_map(
        _shard_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P(axis), P(axis), P()),
        check_rep=False,
    )

    @jax.jit
    def step_fn(carry):
        algo_state, env_state, obs, buffer, metrics = sharded(
            carry["algo_state"], carry["env_state"], carry["obs"],
            carry["buffer"], carry["key"], carry["step"],
        )
        new_carry = dict(
            algo_state=algo_state,
            env_state=env_state,
            obs=obs,
            buffer=buffer,
            key=carry["key"],
            step=carry["step"] + 1,
        )
        return new_carry, metrics

    return init_fn, step_fn
