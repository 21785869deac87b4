"""Random cloud generation + string split utilities.

- CloudGenerator equivalents (reference: common/include/pcl/common/
  generate.h + common/random.h): fill organized clouds with per-axis
  uniform or normal samples under an explicit PRNG key (JAX keys replace
  the reference's seeded mt19937 engines).
- ``split`` (reference: io/include/pcl/io/split.h): tokenize on any of a
  set of delimiter characters, dropping empty tokens.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, make_cloud


def generate_cloud_uniform(
    key: jax.Array,
    width: int,
    height: int = 1,
    ranges: Sequence[Tuple[float, float]] = ((0.0, 1.0),) * 3,
) -> Cloud:
    """Organized cloud with per-axis uniform samples in [lo, hi)
    (CloudGenerator<UniformGenerator>, generate.h:58)."""
    n = width * height
    keys = jax.random.split(key, 3)
    cols = [jax.random.uniform(k, (n,), jnp.float32, lo, hi)
            for k, (lo, hi) in zip(keys, ranges)]
    return make_cloud(jnp.stack(cols, axis=1), width=width, height=height)


def generate_cloud_normal(
    key: jax.Array,
    width: int,
    height: int = 1,
    params: Sequence[Tuple[float, float]] = ((0.0, 1.0),) * 3,
) -> Cloud:
    """Organized cloud with per-axis normal samples (mean, sigma)
    (CloudGenerator<NormalGenerator>)."""
    n = width * height
    keys = jax.random.split(key, 3)
    cols = [mu + sd * jax.random.normal(k, (n,), jnp.float32)
            for k, (mu, sd) in zip(keys, params)]
    return make_cloud(jnp.stack(cols, axis=1), width=width, height=height)


def split(text: str, delimiters: str = " \r\t") -> List[str]:
    """Tokenize on any delimiter character, skipping empty tokens
    (pcl::split, io/split.h — pinned by test/io/test_split.cpp)."""
    out: List[str] = []
    cur: List[str] = []
    for ch in text:
        if ch in delimiters:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
