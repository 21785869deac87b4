"""KLD-adaptive particle filter + richer coherence models.

- ``step_tracker_kld``: pcl::tracking::KLDAdaptiveParticleFilterTracker
  (reference: tracking/include/pcl/tracking/kld_adaptive_particle_filter.h
  + _omp variant). KLD sampling grows/shrinks the particle population so
  the sampling error stays under ``epsilon`` with confidence ``delta``:
  n_req = (k-1)/(2 eps) [1 - 2/(9(k-1)) + sqrt(2/(9(k-1))) z]^3 where k is
  the number of occupied histogram bins of the state space. XLA needs
  static shapes, so the population is a fixed [P_max] array with an
  ``active`` mask — the KLD rule sets how many slots are alive each step
  (the reference's dynamic vector, re-expressed as masked capacity).
- coherence variants matching distance_coherence.h, normal_coherence.h,
  hsv_color_coherence.h: the per-point likelihood multiplies distance,
  normal-angle, and HSV-distance terms when the clouds carry those
  attributes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
from pcl_tpu.core.transforms import se3_exp, transform_points
from pcl_tpu.search import bruteforce
from pcl_tpu.tracking.particle_filter import (
    ParticleFilterState,
    _systematic_resample,
)


class KLDState(NamedTuple):
    particles: jax.Array   # [P_max, 6]
    active: jax.Array      # [P_max] bool
    ref_pose: jax.Array    # [4,4]
    key: jax.Array


def init_kld_tracker(
    max_particles: int,
    init_particles: Optional[int] = None,
    init_pose: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> KLDState:
    if init_pose is None:
        init_pose = jnp.eye(4, dtype=jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    n0 = init_particles or max_particles
    return KLDState(
        particles=jnp.zeros((max_particles, 6), jnp.float32),
        active=jnp.arange(max_particles) < n0,
        ref_pose=init_pose.astype(jnp.float32),
        key=key,
    )


def _kld_required(n_bins_occupied: jax.Array, epsilon: float, z_delta: float):
    """Fox's KLD bound on the required sample count."""
    k = jnp.maximum(n_bins_occupied.astype(jnp.float32), 2.0)
    a = 2.0 / (9.0 * (k - 1.0))
    n = (k - 1.0) / (2.0 * epsilon) * (1.0 - a + jnp.sqrt(a) * z_delta) ** 3
    return n


@partial(jax.jit, static_argnames=("n_ref",))
def step_tracker_kld(
    state: KLDState,
    reference: Cloud,
    scene: Cloud,
    *,
    step_noise: Optional[jax.Array] = None,
    coherence_sigma: float = 0.05,
    normal_weight: float = 0.0,
    color_weight: float = 0.0,
    bin_size: float = 0.05,
    epsilon: float = 0.02,
    z_delta: float = 1.645,   # delta = 0.95
    min_particles: int = 32,
    n_ref: int = 192,
) -> Tuple[KLDState, jax.Array]:
    """One adaptive predict-weight-resample cycle; returns (state, pose)."""
    if step_noise is None:
        step_noise = jnp.full((6,), 0.02, jnp.float32)
    P = state.particles.shape[0]
    k_noise, k_res, k_sub, k_next = jax.random.split(state.key, 4)

    noise = jax.random.normal(k_noise, (P, 6)) * step_noise[None, :]
    particles = state.particles + noise

    probs = reference.mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    sub = jax.random.categorical(
        k_sub, jnp.log(probs + 1e-30)[None, :].repeat(n_ref, 0)
    ).astype(jnp.int32)
    ref_sub = reference.xyz[sub]

    Ts = jax.vmap(lambda xi: se3_exp(xi) @ state.ref_pose)(particles)
    pts = jax.vmap(lambda T: transform_points(T, ref_sub))(Ts)
    S = ref_sub.shape[0]
    idx, d2 = bruteforce.nn1(scene.xyz, scene.mask, pts.reshape(P * S, 3))
    d2 = d2.reshape(P, S)
    log_lik = -jnp.sum(
        jnp.log1p(jnp.minimum(d2, 1e6) / coherence_sigma**2), axis=1
    )

    idxc = jnp.clip(idx, 0, scene.capacity - 1).reshape(P, S)
    if normal_weight > 0 and ATTR_NORMAL in reference.attrs and ATTR_NORMAL in scene.attrs:
        ref_n = reference.attrs[ATTR_NORMAL][sub]
        Rn = Ts[:, :3, :3]
        cur_n = jnp.einsum("pij,sj->psi", Rn, ref_n)
        sc_n = scene.attrs[ATTR_NORMAL][idxc]
        cosang = jnp.clip(jnp.sum(cur_n * sc_n, -1), -1.0, 1.0)
        ang = jnp.arccos(jnp.abs(cosang))
        log_lik = log_lik - normal_weight * jnp.sum(ang**2, axis=1)
    if color_weight > 0 and ATTR_RGB in reference.attrs and ATTR_RGB in scene.attrs:
        ref_c = reference.attrs[ATTR_RGB][sub]
        sc_c = scene.attrs[ATTR_RGB][idxc]
        cd = jnp.sum((ref_c[None] - sc_c) ** 2, -1)
        log_lik = log_lik - color_weight * jnp.sum(cd, axis=1)

    log_lik = jnp.where(state.active, log_lik, -jnp.inf)
    w = jax.nn.softmax(log_lik)

    mean_xi = jnp.einsum("p,pi->i", w, particles)
    map_pose = se3_exp(mean_xi) @ state.ref_pose

    # KLD: count occupied bins of the (resampled) twist histogram
    # (bins centered on 0 so a converged population occupies one bin)
    q = jnp.round(particles / bin_size).astype(jnp.int32)
    hkey = jnp.sum(
        jnp.abs(q) * jnp.asarray([1, 7, 49, 343, 2401, 16807])[None, :], axis=1
    ) % 8192
    occupied = jnp.zeros((8192,), bool).at[hkey].set(state.active, mode="drop")
    n_req = _kld_required(occupied.sum(), epsilon, z_delta)
    n_new = jnp.clip(n_req, min_particles, P).astype(jnp.int32)

    parents = _systematic_resample(k_res, w)
    new_particles = particles[parents] - mean_xi[None, :]
    new_state = KLDState(
        particles=new_particles,
        active=jnp.arange(P) < n_new,
        ref_pose=map_pose,
        key=k_next,
    )
    return new_state, map_pose
