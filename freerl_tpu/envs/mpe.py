"""PettingZoo MPE parallel environments re-derived in pure JAX.

The reference trains its whole multi-agent family on MPE parallel envs with
``max_cycles=25, continuous_actions=True`` (MADDPG_file/MADDPG_simple.py:
214-239). These are re-derived from the published multiagent-particle-envs
dynamics:

  world step: force from the 5-way continuous action
  (u = [a1-a2, a3-a4], scaled by mass*accel), soft contact forces between
  collidable entities (contact_force=100, softplus penetration with
  margin 1e-3), semi-implicit integration with damping 0.25, dt 0.1,
  optional per-entity max_speed clamp.

Scenarios:
  - simple_spread_v3: N agents / N landmarks; reward = (1-local_ratio) *
    (-sum over landmarks of min agent distance) + local_ratio *
    (-1 per collision with another agent); local_ratio=0.5 (pettingzoo
    default used by the reference);
  - simple_adversary_v3 (physical deception): 1 adversary, N good, 2
    landmarks, shaped distance rewards, no collisions;
  - simple_tag_v3 (predator-prey): 3 slow large adversaries chase 1 fast
    good agent among 2 obstacles; +10/-10 per catch, boundary penalty.

Heterogeneous per-agent obs dims (adversary/tag) are zero-padded to the
max and exposed via ``agent_obs_dims`` (SURVEY §7 hard part 8).
Episodes never terminate — truncation at 25 steps.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env

DT = 0.1
DAMPING = 0.25
CONTACT_FORCE = 100.0
CONTACT_MARGIN = 1e-3


@struct.dataclass
class MPEState:
    pos: jnp.ndarray     # (E, 2) all entities: agents then landmarks
    vel: jnp.ndarray     # (E, 2)
    goal: jnp.ndarray    # scalar int32 (adversary scenario; else 0)
    t: jnp.ndarray


class MPEBase(Env):
    """Generic MPE world; subclasses define entity tables + scenario."""

    max_steps = 25
    reward_threshold = None
    n_agents: int = 0
    # entity tables (numpy, static) — agents first, then landmarks
    sizes: np.ndarray
    movable: np.ndarray
    collide: np.ndarray
    accel: np.ndarray       # force multiplier per agent (mass*accel)
    max_speed: np.ndarray   # <=0 means unlimited
    act_dim = 5
    action_space_01 = True  # env box is [0,1]; policies act in [-1,1]

    @property
    def n_entities(self):
        return len(self.sizes)

    @property
    def n_landmarks(self):
        return self.n_entities - self.n_agents

    # ---- to be provided by scenario -----------------------------------
    def _reset_world(self, key):
        raise NotImplementedError

    def _rewards(self, state: MPEState) -> jnp.ndarray:
        raise NotImplementedError

    def _observations(self, state: MPEState) -> jnp.ndarray:
        raise NotImplementedError

    # -------------------------------------------------------------------
    def reset(self, key):
        state = self._reset_world(key)
        return state, self._observations(state)

    def observation(self, state):
        return self._observations(state)

    continuous_actions: bool = True

    def step(self, state: MPEState, actions, key):
        """actions: (n_agents, 5) in [0,1] (continuous_actions=True) or
        (n_agents,) discrete indices {0:noop, 1:+x, 2:-x, 3:+y, 4:-y}."""
        if self.continuous_actions:
            a = jnp.clip(actions, 0.0, 1.0)
        else:
            a = jax.nn.one_hot(actions.astype(jnp.int32), 5)
        u = jnp.stack([a[:, 1] - a[:, 2], a[:, 3] - a[:, 4]], axis=-1)
        forces = jnp.zeros((self.n_entities, 2))
        forces = forces.at[: self.n_agents].set(
            u * jnp.asarray(self.accel)[:, None]
        )

        # soft contact forces between collidable pairs
        pos = state.pos
        delta = pos[:, None, :] - pos[None, :, :]           # (E, E, 2)
        dist = jnp.sqrt(jnp.sum(delta**2, axis=-1) + 1e-8)
        dist_min = (
            jnp.asarray(self.sizes)[:, None]
            + jnp.asarray(self.sizes)[None, :]
        )
        k = CONTACT_MARGIN
        # stable softplus — naive log1p(exp(x)) overflows to inf for
        # overlapping pairs and poisons the masked sum with inf*0=NaN
        penetration = jax.nn.softplus(-(dist - dist_min) / k) * k
        coll_mask = (
            jnp.asarray(self.collide)[:, None]
            & jnp.asarray(self.collide)[None, :]
        )
        coll_mask = coll_mask & ~jnp.eye(self.n_entities, dtype=bool)
        fmag = CONTACT_FORCE * penetration * coll_mask
        fdir = delta / dist[..., None]
        contact = jnp.sum(fmag[..., None] * fdir, axis=1)   # (E, 2)
        forces = forces + contact * jnp.asarray(self.movable)[:, None]

        # integrate (mass = 1 for all reference scenarios)
        vel = state.vel * (1.0 - DAMPING) + forces * DT
        ms = jnp.asarray(self.max_speed)
        speed = jnp.sqrt(jnp.sum(vel**2, axis=-1) + 1e-12)
        cap = jnp.where(ms > 0, ms, jnp.inf)
        scale = jnp.minimum(1.0, cap / speed)
        vel = vel * scale[:, None] * jnp.asarray(self.movable)[:, None]
        pos = pos + vel * DT

        # replace() keeps scenario-specific state fields (e.g. the comm
        # channel in simple_world_comm) intact across the base integrator
        new = state.replace(pos=pos, vel=vel, t=state.t + 1)
        new = self._update_comm(new, a)
        rewards = self._rewards(new)
        terminated = jnp.asarray(False)
        truncated = new.t >= self.max_steps
        return new, self._observations(new), rewards, terminated, truncated

    def _update_comm(self, state, actions):
        """Hook for scenarios with a communication channel (world.dim_c>0);
        the base world is silent."""
        return state

    # helpers -----------------------------------------------------------
    def _is_collision(self, state, i, j):
        d = jnp.sqrt(
            jnp.sum((state.pos[i] - state.pos[j]) ** 2) + 1e-8
        )
        return d < self.sizes[i] + self.sizes[j]

    def _pad_obs(self, obs_list):
        width = max(o.shape[0] for o in obs_list)
        return jnp.stack([
            jnp.pad(o, (0, width - o.shape[0])) for o in obs_list
        ])


# ---------------------------------------------------------------------------
class SimpleSpread(MPEBase):
    """N agents cover N landmarks (cooperative navigation)."""

    name = "simple_spread_v3"

    def __init__(self, N: int = 3, local_ratio: float = 0.5,
                 continuous_actions: bool = True):
        self.continuous_actions = continuous_actions
        self.n_agents = N
        self.local_ratio = local_ratio
        n = N + N  # N agents + N landmarks
        self.sizes = np.concatenate([np.full(N, 0.15), np.full(N, 0.05)])
        self.movable = np.concatenate([np.ones(N, bool), np.zeros(N, bool)])
        self.collide = np.concatenate([np.ones(N, bool), np.zeros(N, bool)])
        self.accel = np.full(N, 5.0)
        self.max_speed = np.full(n, -1.0)
        obs_dim = 4 + 2 * N + 2 * (N - 1) + 2 * (N - 1)  # +comm zeros
        self.agent_obs_dims = (obs_dim,) * N
        self.agent_act_dims = (self.act_dim,) * N
        self.dim_info = DimInfo(
            obs_dim=obs_dim, action_dim=self.act_dim,
            is_continue=continuous_actions, max_action=1.0,
        )

    def _reset_world(self, key):
        k1, k2 = jax.random.split(key)
        apos = jax.random.uniform(k1, (self.n_agents, 2), jnp.float32, -1, 1)
        lpos = jax.random.uniform(
            k2, (self.n_landmarks, 2), jnp.float32, -0.9, 0.9
        )
        return MPEState(
            pos=jnp.concatenate([apos, lpos]),
            vel=jnp.zeros((self.n_entities, 2)),
            goal=jnp.int32(0),
            t=jnp.int32(0),
        )

    def _rewards(self, state):
        N = self.n_agents
        apos = state.pos[:N]
        lpos = state.pos[N:]
        d = jnp.sqrt(
            jnp.sum((lpos[:, None, :] - apos[None, :, :]) ** 2, axis=-1)
            + 1e-8
        )  # (L, N)
        global_rew = -jnp.sum(jnp.min(d, axis=1))
        # local: -1 per collision with each other agent
        ad = jnp.sqrt(
            jnp.sum((apos[:, None, :] - apos[None, :, :]) ** 2, axis=-1)
            + 1e-8
        )
        colliding = (ad < 0.3) & ~jnp.eye(N, dtype=bool)
        local = -jnp.sum(colliding, axis=1).astype(jnp.float32)
        return (
            global_rew * (1.0 - self.local_ratio)
            + local * self.local_ratio
        )

    def _observations(self, state):
        N = self.n_agents
        apos, avel = state.pos[:N], state.vel[:N]
        lpos = state.pos[N:]

        def per_agent(i):
            lm_rel = (lpos - apos[i]).reshape(-1)
            others = jnp.concatenate([apos[:i], apos[i + 1:]])
            other_rel = (others - apos[i]).reshape(-1)
            comm = jnp.zeros(2 * (N - 1))
            return jnp.concatenate([avel[i], apos[i], lm_rel, other_rel, comm])

        return jnp.stack([per_agent(i) for i in range(N)])


# ---------------------------------------------------------------------------
class SimpleAdversary(MPEBase):
    """Physical deception: adversary (agent 0) + N good agents, 2 landmarks,
    one random goal. No collisions; shaped distance rewards."""

    name = "simple_adversary_v3"

    def __init__(self, N: int = 2, continuous_actions: bool = True):
        self.continuous_actions = continuous_actions
        self.n_good = N
        self.n_agents = N + 1       # adversary first (pettingzoo order)
        n_lm = 2
        n = self.n_agents + n_lm
        self.sizes = np.concatenate([
            np.full(self.n_agents, 0.15), np.full(n_lm, 0.08)
        ])
        self.movable = np.concatenate([
            np.ones(self.n_agents, bool), np.zeros(n_lm, bool)
        ])
        self.collide = np.zeros(n, bool)
        self.accel = np.full(self.n_agents, 5.0)
        self.max_speed = np.full(n, -1.0)
        adv_dim = 2 * n_lm + 2 * N            # 8 for N=2
        good_dim = 2 + 2 * n_lm + 2 * N       # 10 for N=2
        self.agent_obs_dims = (adv_dim,) + (good_dim,) * N
        self.agent_act_dims = (self.act_dim,) * self.n_agents
        self.dim_info = DimInfo(
            obs_dim=max(adv_dim, good_dim), action_dim=self.act_dim,
            is_continue=continuous_actions, max_action=1.0,
        )

    def _reset_world(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        apos = jax.random.uniform(
            k1, (self.n_agents, 2), jnp.float32, -1, 1
        )
        lpos = jax.random.uniform(k2, (2, 2), jnp.float32, -0.9, 0.9)
        goal = jax.random.randint(k3, (), 0, 2)
        return MPEState(
            pos=jnp.concatenate([apos, lpos]),
            vel=jnp.zeros((self.n_entities, 2)),
            goal=goal,
            t=jnp.int32(0),
        )

    def _rewards(self, state):
        na = self.n_agents
        apos = state.pos[:na]
        goal_pos = state.pos[na + state.goal]
        d_goal = jnp.sqrt(
            jnp.sum((apos - goal_pos) ** 2, axis=-1) + 1e-8
        )
        adv_d = d_goal[0]
        good_d = d_goal[1:]
        # good agents: closest good agent near goal is good, adversary far
        good_rew = -jnp.min(good_d) + adv_d
        adv_rew = -adv_d
        return jnp.concatenate([adv_rew[None], jnp.full((self.n_good,), 0.0) + good_rew])

    def _observations(self, state):
        na = self.n_agents
        apos, avel = state.pos[:na], state.vel[:na]
        lpos = state.pos[na:]
        goal_pos = state.pos[na + state.goal]
        obs = []
        for i in range(na):
            lm_rel = (lpos - apos[i]).reshape(-1)
            others = jnp.concatenate([apos[:i], apos[i + 1:]])
            other_rel = (others - apos[i]).reshape(-1)
            if i == 0:  # adversary: no goal knowledge
                obs.append(jnp.concatenate([lm_rel, other_rel]))
            else:
                obs.append(jnp.concatenate(
                    [goal_pos - apos[i], lm_rel, other_rel]
                ))
        return self._pad_obs(obs)


# ---------------------------------------------------------------------------
class SimpleTag(MPEBase):
    """Predator-prey: adversaries (first 3) chase the good agent (last),
    2 collidable obstacles. Good agent is faster."""

    name = "simple_tag_v3"

    def __init__(self, num_good: int = 1, num_adversaries: int = 3,
                 continuous_actions: bool = True):
        self.continuous_actions = continuous_actions
        self.n_adv = num_adversaries
        self.n_good = num_good
        self.n_agents = num_adversaries + num_good
        n_lm = 2
        n = self.n_agents + n_lm
        self.sizes = np.concatenate([
            np.full(self.n_adv, 0.075), np.full(self.n_good, 0.05),
            np.full(n_lm, 0.2),
        ])
        self.movable = np.concatenate([
            np.ones(self.n_agents, bool), np.zeros(n_lm, bool)
        ])
        self.collide = np.ones(n, bool)
        self.accel = np.concatenate([
            np.full(self.n_adv, 3.0), np.full(self.n_good, 4.0)
        ])
        self.max_speed = np.concatenate([
            np.full(self.n_adv, 1.0), np.full(self.n_good, 1.3),
            np.full(n_lm, -1.0),
        ])
        adv_dim = 4 + 2 * n_lm + 2 * (self.n_agents - 1) + 2 * self.n_good
        good_dim = 4 + 2 * n_lm + 2 * (self.n_agents - 1) + 2 * (
            self.n_good - 1
        )
        self.agent_obs_dims = (adv_dim,) * self.n_adv + (good_dim,) * self.n_good
        self.agent_act_dims = (self.act_dim,) * self.n_agents
        self.dim_info = DimInfo(
            obs_dim=max(adv_dim, good_dim), action_dim=self.act_dim,
            is_continue=continuous_actions, max_action=1.0,
        )

    def _reset_world(self, key):
        k1, k2 = jax.random.split(key)
        apos = jax.random.uniform(
            k1, (self.n_agents, 2), jnp.float32, -1, 1
        )
        lpos = jax.random.uniform(k2, (2, 2), jnp.float32, -0.9, 0.9)
        return MPEState(
            pos=jnp.concatenate([apos, lpos]),
            vel=jnp.zeros((self.n_entities, 2)),
            goal=jnp.int32(0),
            t=jnp.int32(0),
        )

    @staticmethod
    def _bound(x):
        """Boundary penalty on |coordinate| (reference scenario bound())."""
        x = jnp.abs(x)
        return jnp.where(
            x < 0.9,
            0.0,
            jnp.where(x < 1.0, (x - 0.9) * 10.0,
                      jnp.minimum(jnp.exp(2 * x - 2), 10.0)),
        )

    def _rewards(self, state):
        adv_pos = state.pos[: self.n_adv]
        good_pos = state.pos[self.n_adv: self.n_agents]
        d = jnp.sqrt(jnp.sum(
            (adv_pos[:, None, :] - good_pos[None, :, :]) ** 2, axis=-1
        ) + 1e-8)
        catch = d < (0.075 + 0.05)
        n_catch = jnp.sum(catch).astype(jnp.float32)
        adv_rew = jnp.full((self.n_adv,), 10.0 * n_catch)
        good_rew = -10.0 * jnp.sum(
            catch, axis=0
        ).astype(jnp.float32)
        bound_pen = jnp.sum(self._bound(good_pos), axis=-1)
        good_rew = good_rew - bound_pen
        return jnp.concatenate([adv_rew, good_rew])

    def _observations(self, state):
        na = self.n_agents
        apos, avel = state.pos[:na], state.vel[:na]
        lpos = state.pos[na:]
        obs = []
        for i in range(na):
            lm_rel = (lpos - apos[i]).reshape(-1)
            others = jnp.concatenate([apos[:i], apos[i + 1:]])
            other_rel = (others - apos[i]).reshape(-1)
            # velocities of good agents other than self
            good_idx = [
                j for j in range(self.n_adv, na) if j != i
            ]
            if good_idx:
                other_vel = jnp.concatenate([avel[j] for j in good_idx])
            else:
                other_vel = jnp.zeros((0,))
            obs.append(jnp.concatenate(
                [avel[i], apos[i], lm_rel, other_rel, other_vel]
            ))
        return self._pad_obs(obs)


# ---------------------------------------------------------------------------
@struct.dataclass
class WorldCommState:
    pos: jnp.ndarray     # (E, 2)
    vel: jnp.ndarray     # (E, 2)
    goal: jnp.ndarray    # unused; kept for base-class compatibility
    t: jnp.ndarray
    comm: jnp.ndarray    # (dim_c,) leader's broadcast channel


class SimpleWorldComm(MPEBase):
    """simple_world_comm_v3: 1 leader adversary (speaks, dim_c=4) + 3
    adversaries chase `num_good` food-seeking good agents among 1 collidable
    landmark, 2 food sources, and 2 concealing forests.

    Re-derived from the published multiagent-particle-envs scenario that
    PettingZoo ships; the reference constructs it at
    MADDPG_file/MADDPG_simple.py:224-225 with
    ``num_good=env_agent_n, num_adversaries=4, continuous_actions=True``.

    Entity order: [leader, adv x3, good x num_good] then
    [landmark, food x2, forest x2]. Leader action is 9-dim (5 movement +
    4 comm); others 5-dim — exposed via heterogeneous ``agent_act_dims``.
    Forest concealment: another agent's relative position/velocity reads
    as zeros unless observer and observed share a forest, both are outside
    all forests, or the observer is the leader (who sees everything).
    """

    name = "simple_world_comm_v3"
    dim_c = 4

    def __init__(self, num_good: int = 2, num_adversaries: int = 4,
                 continuous_actions: bool = True):
        assert continuous_actions, (
            "simple_world_comm is built continuous (the reference always "
            "passes continuous_actions=True for MPE)"
        )
        self.continuous_actions = True
        self.n_adv = num_adversaries          # leader is adversary 0
        self.n_good = num_good
        self.n_agents = num_adversaries + num_good
        n_lm = 5                              # 1 landmark + 2 food + 2 forest
        n = self.n_agents + n_lm
        self.sizes = np.concatenate([
            np.full(self.n_adv, 0.075), np.full(self.n_good, 0.045),
            np.array([0.2, 0.03, 0.03, 0.3, 0.3]),
        ])
        self.movable = np.concatenate([
            np.ones(self.n_agents, bool), np.zeros(n_lm, bool)
        ])
        # landmark is an obstacle; food and forests are intangible
        self.collide = np.concatenate([
            np.ones(self.n_agents, bool),
            np.array([True, False, False, False, False]),
        ])
        self.accel = np.concatenate([
            np.full(self.n_adv, 3.0), np.full(self.n_good, 4.0)
        ])
        self.max_speed = np.concatenate([
            np.full(self.n_adv, 1.0), np.full(self.n_good, 1.3),
            np.full(n_lm, -1.0),
        ])
        A = self.n_agents
        # adv/leader: vel2 pos2 entity10 other2(A-1) goodvel2*n_good
        #             forest2 comm4
        adv_dim = 4 + 2 * n_lm + 2 * (A - 1) + 2 * self.n_good + 2 + self.dim_c
        # good i: vel2 pos2 entity10 other2(A-1) forest2 othergoodvel
        good_dim = 4 + 2 * n_lm + 2 * (A - 1) + 2 + 2 * (self.n_good - 1)
        self.agent_obs_dims = (adv_dim,) * self.n_adv + (good_dim,) * self.n_good
        self.agent_act_dims = (5 + self.dim_c,) + (5,) * (A - 1)
        self.dim_info = DimInfo(
            obs_dim=max(adv_dim, good_dim),
            action_dim=max(self.agent_act_dims),
            is_continue=True, max_action=1.0,
        )

    # entity index helpers
    @property
    def _i_lm(self):
        return self.n_agents

    @property
    def _i_food(self):
        return self.n_agents + 1

    @property
    def _i_forest(self):
        return self.n_agents + 3

    def _reset_world(self, key):
        k1, k2 = jax.random.split(key)
        apos = jax.random.uniform(k1, (self.n_agents, 2), jnp.float32, -1, 1)
        lpos = jax.random.uniform(k2, (5, 2), jnp.float32, -0.9, 0.9)
        return WorldCommState(
            pos=jnp.concatenate([apos, lpos]),
            vel=jnp.zeros((self.n_entities, 2)),
            goal=jnp.int32(0),
            t=jnp.int32(0),
            comm=jnp.zeros((self.dim_c,)),
        )

    def _update_comm(self, state, actions):
        # only the leader speaks (others are silent): c <- action[5:9]
        return state.replace(comm=actions[0, 5:5 + self.dim_c])

    def _in_forest(self, state):
        """(A, 2) bool: agent a overlaps forest f."""
        apos = state.pos[: self.n_agents]
        fpos = state.pos[self._i_forest: self._i_forest + 2]
        d = jnp.sqrt(jnp.sum(
            (apos[:, None, :] - fpos[None, :, :]) ** 2, axis=-1
        ) + 1e-8)
        thresh = jnp.asarray(self.sizes[: self.n_agents])[:, None] + 0.3
        return d < thresh

    def _rewards(self, state):
        na = self.n_agents
        adv_pos = state.pos[: self.n_adv]
        good_pos = state.pos[self.n_adv: na]
        good_size = jnp.asarray(self.sizes[self.n_adv: na])

        d_ag = jnp.sqrt(jnp.sum(
            (adv_pos[:, None, :] - good_pos[None, :, :]) ** 2, axis=-1
        ) + 1e-8)                                           # (n_adv, n_good)
        catch = d_ag < (0.075 + good_size[None, :])
        n_catch = jnp.sum(catch).astype(jnp.float32)

        # adversaries (incl. leader): shaped -0.1*min dist to prey,
        # +5 per (adversary, good) contact anywhere in the pack
        adv_rew = -0.1 * jnp.min(d_ag, axis=1) + 5.0 * n_catch

        # good agents: -5 per adversary touching them, x2 boundary
        # penalty per coordinate, +2 per food eaten, +0.05*min food dist
        food_pos = state.pos[self._i_food: self._i_food + 2]
        d_food = jnp.sqrt(jnp.sum(
            (good_pos[:, None, :] - food_pos[None, :, :]) ** 2, axis=-1
        ) + 1e-8)                                           # (n_good, 2)
        eat = d_food < (good_size[:, None] + 0.03)
        good_rew = (
            -5.0 * jnp.sum(catch, axis=0).astype(jnp.float32)
            - 2.0 * jnp.sum(SimpleTag._bound(good_pos), axis=-1)
            + 2.0 * jnp.sum(eat, axis=-1).astype(jnp.float32)
            + 0.05 * jnp.min(d_food, axis=-1)
        )
        return jnp.concatenate([adv_rew, good_rew])

    def _observations(self, state):
        na = self.n_agents
        apos, avel = state.pos[:na], state.vel[:na]
        ent_pos = state.pos[na:]                     # landmark+food+forest
        inf = self._in_forest(state)                 # (A, 2)
        outside = ~jnp.any(inf, axis=-1)             # (A,)
        forest_flag = jnp.where(inf, 1.0, -1.0)

        # visibility of agent j to observer i (leader sees all)
        vis = (
            (inf[:, None, 0] & inf[None, :, 0])
            | (inf[:, None, 1] & inf[None, :, 1])
            | (outside[:, None] & outside[None, :])
        )
        vis = vis.at[0, :].set(True)

        obs = []
        for i in range(na):
            entity_rel = (ent_pos - apos[i]).reshape(-1)
            other_rel = jnp.concatenate([
                jnp.where(vis[i, j], apos[j] - apos[i], 0.0)
                for j in range(na) if j != i
            ])
            good_vel = jnp.concatenate([
                jnp.where(vis[i, j], avel[j], 0.0)
                for j in range(self.n_adv, na) if j != i
            ]) if (self.n_good - (1 if i >= self.n_adv else 0)) else jnp.zeros((0,))
            if i < self.n_adv:    # leader + adversaries (comm appended)
                obs.append(jnp.concatenate([
                    avel[i], apos[i], entity_rel, other_rel, good_vel,
                    forest_flag[i], state.comm,
                ]))
            else:                 # good agents: no comm channel
                # layout parity with the published scenario's non-adversary
                # branch: [vel, pos, entity_pos, in_forest, other_pos,
                # other_vel] — in_forest comes BEFORE other_pos.
                obs.append(jnp.concatenate([
                    avel[i], apos[i], entity_rel, forest_flag[i],
                    other_rel, good_vel,
                ]))
        return self._pad_obs(obs)
