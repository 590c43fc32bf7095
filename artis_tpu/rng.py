"""Counter-based per-packet random numbers.

The reference uses one sequential GSL RNG stream per OpenMP thread
(reference: input.cc:1884-1917). That design is order-dependent and
unusable for vectorised transport. Here every packet derives its
randoms from (seed, packet_id, event_counter, salt) with JAX's
counter-based threefry generator, so results are independent of batch
order, sharding, and device count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def packet_uniforms(base_key: jax.Array, pkt_id: jax.Array,
                    counter: jax.Array, salt: int, n: int) -> jax.Array:
    """[N, n] uniforms in [0, 1), one row per packet.

    pkt_id, counter: int32 [N]. ``salt`` distinguishes call sites within
    one event step so streams never collide.
    """
    def one(pid, cnt):
        k = jax.random.fold_in(base_key, pid)
        k = jax.random.fold_in(k, cnt * 131 + salt)
        return jax.random.uniform(k, (n,), dtype=jnp.float32)

    return jax.vmap(one)(pkt_id, counter)


def uniform_pos(u: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Map U[0,1) to U(0,1] to make -log(u) safe (gsl_rng_uniform_pos
    analogue)."""
    return jnp.maximum(1.0 - u, eps)
