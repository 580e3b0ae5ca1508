"""Spring n-body simulator (SURVEY.md §2 R8) — vmapped ``lax.scan``.

Parity: the reference generates trajectories with a host-side numpy
semi-implicit Euler loop over pairwise spring forces and writes
``[n_sims, T, N, state_dim]`` arrays.  Same physics here — state per body is
``(mass, pos[2], vel[2])``, force on i is ``Σ_j −k·(|d|−L)·d̂ − γ·vel`` —
but the integrator is a ``lax.scan`` vmapped over simulations, so thousands
of trajectories integrate in one XLA program on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SpringSystem", "generate_trajectories", "one_step_dataset"]


@dataclasses.dataclass(frozen=True)
class SpringSystem:
    n_bodies: int = 6
    dim: int = 2
    stiffness: float = 0.5
    rest_length: float = 1.0
    damping: float = 0.02
    dt: float = 0.01
    # Initial-condition scales.
    mass_range: tuple = (0.5, 2.0)
    pos_scale: float = 2.0
    vel_scale: float = 0.5

    def edges(self):
        """Fully-connected directed edge list (no self loops)."""
        n = self.n_bodies
        s, r = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        mask = s != r
        return (
            jnp.asarray(s[mask], jnp.int32),
            jnp.asarray(r[mask], jnp.int32),
        )

    def acceleration(self, mass, pos, vel):
        """f32[N,1], f32[N,D], f32[N,D] → f32[N,D] spring + damping accel."""
        d = pos[:, None, :] - pos[None, :, :]              # [N, N, D] x_i − x_j
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)
        eye = jnp.eye(self.n_bodies, dtype=pos.dtype)[..., None]
        force_pair = -self.stiffness * (dist - self.rest_length) * (d / dist)
        force_pair = force_pair * (1.0 - eye)              # no self force
        force = jnp.sum(force_pair, axis=1) - self.damping * vel
        return force / mass

    def step(self, mass, pos, vel):
        """Semi-implicit Euler (reference stepper)."""
        vel = vel + self.dt * self.acceleration(mass, pos, vel)
        pos = pos + self.dt * vel
        return pos, vel

    def init_state(self, key):
        km, kp, kv = jax.random.split(key, 3)
        lo, hi = self.mass_range
        mass = jax.random.uniform(km, (self.n_bodies, 1), minval=lo, maxval=hi)
        pos = self.pos_scale * jax.random.normal(kp, (self.n_bodies, self.dim))
        vel = self.vel_scale * jax.random.normal(kv, (self.n_bodies, self.dim))
        return mass, pos, vel


@partial(jax.jit, static_argnames=("system", "n_steps", "record_every"))
def _simulate_one(system: SpringSystem, key, n_steps: int, record_every: int):
    mass, pos, vel = system.init_state(key)

    def outer(carry, _):
        pos, vel = carry

        def inner(c, _):
            p, v = c
            return system.step(mass, p, v), None

        (pos, vel), _ = jax.lax.scan(inner, (pos, vel), None, length=record_every)
        return (pos, vel), jnp.concatenate([pos, vel], axis=-1)

    first = jnp.concatenate([pos, vel], axis=-1)
    _, traj = jax.lax.scan(outer, (pos, vel), None, length=n_steps)
    traj = jnp.concatenate([first[None], traj], axis=0)   # [T+1, N, 2D]
    mass_t = jnp.broadcast_to(mass, (traj.shape[0],) + mass.shape)
    return jnp.concatenate([mass_t, traj], axis=-1)       # [T+1, N, 1+2D]


def generate_trajectories(
    system: SpringSystem, key, n_sims: int, n_steps: int, record_every: int = 1
):
    """→ f32[n_sims, n_steps+1, N, 1+2D]: (mass ‖ pos ‖ vel) trajectories."""
    keys = jax.random.split(key, n_sims)
    return jax.vmap(lambda k: _simulate_one(system, k, n_steps, record_every))(keys)


def one_step_dataset(trajs, dim: int = 2):
    """(state_t → vel_{t+1}) pairs for discrete-IN training (SURVEY.md §3.4).

    Returns ``(states[B, N, 1+2D], target_vel[B, N, D])`` with
    B = n_sims·n_steps.
    """
    s, t1, n, f = trajs.shape
    inputs = trajs[:, :-1].reshape(s * (t1 - 1), n, f)
    targets = trajs[:, 1:, :, 1 + dim :].reshape(s * (t1 - 1), n, dim)
    return inputs, targets
