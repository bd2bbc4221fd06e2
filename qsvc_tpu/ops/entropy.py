"""Shannon entropy of a 256-bin histogram (reference entropy.cpp:19-33).

Drives the adaptive I/B frame decision (decorrelate.cpp:934-1027).  Computed
on device: a bincount + masked p*log2(p) reduction, float32 like the
reference's ``float`` accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp


def histogram_entropy(values: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Entropy (bits/symbol) of the histogram of integer ``values`` in
    [0, bins)."""
    count = jnp.bincount(values.reshape(-1), length=bins)
    total = jnp.sum(count)
    p = count.astype(jnp.float32) / total.astype(jnp.float32)
    terms = jnp.where(count > 0, p * (jnp.log(p) / jnp.log(jnp.float32(2.0))), 0.0)
    return -jnp.sum(terms)
