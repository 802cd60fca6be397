#!/usr/bin/env python3
"""Spring-system simulation of rig points — working version of the
reference's broken scripts/rig_physics.py (it imports a module that does
not exist, src.physics). Rig points connect by springs to their k nearest
neighbors; the simulation integrates damped spring dynamics under gravity
and writes point trajectories for DynamicRigNeRF initialization.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def arguments():
  a = argparse.ArgumentParser()
  a.add_argument("--points", type=int, default=16)
  a.add_argument("--steps", type=int, default=200)
  a.add_argument("--dt", type=float, default=0.02)
  a.add_argument("--k-neighbors", type=int, default=4)
  a.add_argument("--stiffness", type=float, default=40.0)
  a.add_argument("--damping", type=float, default=0.5)
  a.add_argument("--out", default="outputs/rig_physics.npz")
  return a.parse_args()


def main():
  args = arguments()
  key = jax.random.PRNGKey(0)
  pts0 = jax.random.normal(key, (args.points, 3)) * 0.4
  pts0 = pts0.at[:, 1].add(1.0)  # start above the ground plane y=0

  # spring topology: k nearest neighbors at rest
  d0 = jnp.linalg.norm(pts0[:, None] - pts0[None], axis=-1)
  nbr = jnp.argsort(d0, axis=-1)[:, 1:args.k_neighbors + 1]   # [P, k]
  rest = jnp.take_along_axis(d0, nbr, axis=-1)                # [P, k]

  def accel(pts, vel):
    p_n = pts[nbr]                                            # [P, k, 3]
    delta = p_n - pts[:, None]
    dist = jnp.maximum(jnp.linalg.norm(delta, axis=-1), 1e-6)
    force = (args.stiffness * (dist - rest))[..., None] * (
        delta / dist[..., None])
    f = force.sum(1) - args.damping * vel
    f = f + jnp.array([0.0, -9.8, 0.0])
    return f

  def step(carry, _):
    pts, vel = carry
    a = accel(pts, vel)
    vel = vel + args.dt * a
    pts = pts + args.dt * vel
    # ground collision at y=0 with restitution
    below = pts[:, 1] < 0
    pts = pts.at[:, 1].set(jnp.where(below, 0.0, pts[:, 1]))
    vel = vel.at[:, 1].set(jnp.where(below, -0.4 * vel[:, 1], vel[:, 1]))
    return (pts, vel), pts

  init = (pts0, jnp.zeros_like(pts0))
  _, traj = jax.lax.scan(step, init, None, length=args.steps)
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  np.savez(args.out, trajectory=np.asarray(traj),
           neighbors=np.asarray(nbr))
  print(f"wrote {args.out}: trajectory {traj.shape} "
        f"(final height {float(traj[-1][:, 1].mean()):.3f})")


if __name__ == "__main__":
  main()
