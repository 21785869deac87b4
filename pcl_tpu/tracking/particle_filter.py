"""Particle-filter pose tracker.

Re-design of pcl::tracking::ParticleFilterTracker (reference: tracking/
include/pcl/tracking/particle_filter.h:19; coherences at tracking/include/
pcl/tracking/distance_coherence.h, nearest_pair_point_cloud_coherence.h).
PCL loops particles -> transform reference -> per-point coherence via
kd-tree. Here the [P] particle population transforms a fixed reference
subsample in one batch and every (particle, point) NN lookup goes through
ONE flat 1-NN sweep; weights, systematic resampling and the zero-mean
Gaussian motion model (particle_filter.h resample/weight/update stages) are
pure vectorized ops under jit.

State is explicit and functional (init_tracker / step_tracker) rather than
a stateful tracker object.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.transforms import se3_exp, transform_points
from pcl_tpu.search import bruteforce


class ParticleFilterState(NamedTuple):
    particles: jax.Array     # [P,6] twists relative to ref_pose
    weights: jax.Array       # [P]
    ref_pose: jax.Array      # [4,4] current MAP pose estimate
    key: jax.Array           # PRNG


def init_tracker(
    n_particles: int,
    init_pose: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> ParticleFilterState:
    if init_pose is None:
        init_pose = jnp.eye(4, dtype=jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    return ParticleFilterState(
        particles=jnp.zeros((n_particles, 6), jnp.float32),
        weights=jnp.full((n_particles,), 1.0 / n_particles, jnp.float32),
        ref_pose=init_pose.astype(jnp.float32),
        key=key,
    )


def _systematic_resample(key, weights):
    """[P] weights -> [P] parent indices (systematic / stochastic universal
    resampling, the reference's resample stage)."""
    P = weights.shape[0]
    cum = jnp.cumsum(weights)
    cum = cum / jnp.maximum(cum[-1], 1e-30)
    u0 = jax.random.uniform(key, (), minval=0.0, maxval=1.0 / P)
    pts = u0 + jnp.arange(P, dtype=jnp.float32) / P
    return jnp.searchsorted(cum, pts).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_ref",))
def step_tracker(
    state: ParticleFilterState,
    reference: Cloud,            # object model (tracked target)
    scene: Cloud,                # current frame
    *,
    step_noise: jax.Array = None,     # [6] motion-model std devs
    coherence_sigma: float = 0.05,
    n_ref: int = 256,
) -> Tuple[ParticleFilterState, jax.Array]:
    """One predict-weight-resample cycle. Returns (new_state, map_pose)."""
    if step_noise is None:
        step_noise = jnp.asarray([0.02, 0.02, 0.02, 0.02, 0.02, 0.02], jnp.float32)
    P = state.particles.shape[0]
    k_noise, k_res, k_sub, k_next = jax.random.split(state.key, 4)

    # predict: diffuse particles with Gaussian twist noise
    noise = jax.random.normal(k_noise, (P, 6)) * step_noise[None, :]
    particles = state.particles + noise

    # weight: coherence of transformed reference subsample with the scene
    probs = reference.mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    sub = jax.random.categorical(
        k_sub, jnp.log(probs + 1e-30)[None, :].repeat(n_ref, 0)
    ).astype(jnp.int32)
    ref_sub = reference.xyz[sub]                       # [S,3]

    Ts = jax.vmap(lambda xi: se3_exp(xi) @ state.ref_pose)(particles)  # [P,4,4]
    pts = jax.vmap(lambda T: transform_points(T, ref_sub))(Ts)         # [P,S,3]
    S = ref_sub.shape[0]
    _idx, d2 = bruteforce.nn1(scene.xyz, scene.mask, pts.reshape(P * S, 3))
    d2 = d2.reshape(P, S)
    # distance coherence: prod_j 1/(1 + d^2/sigma^2) in log space
    # (reference distance_coherence.h)
    log_lik = -jnp.sum(jnp.log1p(jnp.minimum(d2, 1e6) / coherence_sigma**2), axis=1)
    log_lik = jnp.where(jnp.isfinite(log_lik), log_lik, -jnp.inf)
    w = jax.nn.softmax(log_lik)

    # MAP estimate: weighted mean twist -> fold into ref_pose
    mean_xi = jnp.einsum("p,pi->i", w, particles)
    map_pose = se3_exp(mean_xi) @ state.ref_pose

    # resample and re-center the particle set around the new reference
    parents = _systematic_resample(k_res, w)
    new_particles = particles[parents] - mean_xi[None, :]
    new_state = ParticleFilterState(
        particles=new_particles,
        weights=jnp.full((P,), 1.0 / P, jnp.float32),
        ref_pose=map_pose,
        key=k_next,
    )
    return new_state, map_pose
