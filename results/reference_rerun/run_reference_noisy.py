"""Diagnostic: run the REFERENCE torch DQN+Noisy on MountainCar seed 10.
(Reference code imported read-only; this file is throwaway diagnostics.)"""
import sys, os
sys.path.insert(0, "/root/reference/DQN_file")
os.environ.setdefault("OMP_NUM_THREADS", "1")
import numpy as np
import gymnasium as gym
import torch
from DQN_with_tricks import DQN

trick = {'Double':False,'Dueling':False,'PER':False,'Noisy':True,
         'N_Step':False,'Categorical':False}
seed = int(sys.argv[1]) if len(sys.argv) > 1 else 10
env = gym.make("MountainCar-v0")
obs_dim = env.observation_space.shape[0]
action_dim = env.action_space.n
np.random.seed(seed); torch.manual_seed(seed)
policy = DQN((obs_dim, action_dim), False, 1e-3, int(1e6),
             torch.device("cpu"), trick=trick, gamma=0.99, batch_size=256)
obs, _ = env.reset(seed=seed)
ep_r, eps_done, step, returns = 0.0, 0, 0, []
import time
t0=time.time()
while eps_done < 500:
    action = policy.select_action(obs)
    nobs, r, term, trunc, _ = env.step(action)
    done_bool = term
    policy.add(obs, action, r, nobs, done_bool)
    ep_r += r; step += 1
    obs = nobs
    if term or trunc:
        returns.append(ep_r)
        eps_done += 1
        if eps_done % 50 == 0:
            rr = np.array(returns)
            # flip rate probe
            qs = []
            o = torch.as_tensor(np.random.uniform([-1.2,-0.07],[0.6,0.07],(256,2)).astype(np.float32))
            with torch.no_grad():
                policy.agent.Qnet.l2.is_train = False
                det = policy.agent.Qnet(o).argmax(1)
                policy.agent.Qnet.l2.is_train = True
                flips = np.mean([ (policy.agent.Qnet(o).argmax(1) != det).float().mean().item() for _ in range(10)])
            with torch.no_grad():
                policy.agent.Qnet.l2.is_train = False
                qd = policy.agent.Qnet(o)
                policy.agent.Qnet.l2.is_train = True
                gs = qd.sort(1).values
                gap = (gs[:,-1]-gs[:,-2]).mean().item()
                ws = policy.agent.Qnet.l2.weight_sigma.abs().mean().item()
                bs = policy.agent.Qnet.l2.bias_sigma.abs().mean().item()
            print(f"ep {eps_done}: last50={rr[-50:].mean():.1f} "
                  f"succ={(rr>-199.5).sum()} flip={flips:.3f} "
                  f"gap={gap:.3f} wsig={ws:.4f} bsig={bs:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        ep_r = 0.0
        obs, _ = env.reset(seed=seed)
    if step > 500:
        policy.learn(256, 0.99, 0.01)
rr = np.array(returns)
print("FINAL:", rr[-50:].mean(), "succ:", (rr>-199.5).sum())
