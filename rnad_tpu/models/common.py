"""Shared model utilities: masked policy math and torch-style initializers.

The reference's nets mask logits to legal actions with a masked-exp +
L1-normalize (reference nn/net.py:45-47, 74-77) and compute log-policies as
``logits - log(sum(exp(legal logits)))`` (net.py:76-77).  Here the same
quantities are computed in the numerically stable masked-softmax form, which
is mathematically identical.

Initializers mirror torch's ``nn.Linear``/``nn.Conv2d`` defaults
(uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so that
learning-dynamics comparisons against the reference start from the same
weight distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_logits(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """Sets illegal-action logits to a large negative value."""
    return jnp.where(legal > 0, logits, _NEG_INF)


def masked_policy(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """Softmax over legal actions; zero on illegal actions."""
    ml = masked_logits(logits, legal)
    p = jax.nn.softmax(ml, axis=-1)
    return jnp.where(legal > 0, p, 0.0)


def masked_log_policy(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """log softmax over legal actions; exactly 0 on illegal actions
    (reference net.py:77 stores 0, not -inf, on illegal entries)."""
    ml = masked_logits(logits, legal)
    lp = jax.nn.log_softmax(ml, axis=-1)
    return jnp.where(legal > 0, lp, 0.0)


def masked_policy_minor(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """``masked_policy`` for batch-minor (..., A, B) arrays (action axis
    -2; see learn/vtrace.py's batch-minor section for why this layout)."""
    ml = masked_logits(logits, legal)
    p = jax.nn.softmax(ml, axis=-2)
    return jnp.where(legal > 0, p, 0.0)


def masked_log_policy_minor(logits: jax.Array, legal: jax.Array
                            ) -> jax.Array:
    """``masked_log_policy`` for batch-minor (..., A, B) arrays."""
    ml = masked_logits(logits, legal)
    lp = jax.nn.log_softmax(ml, axis=-2)
    return jnp.where(legal > 0, lp, 0.0)


def sample_actions(key: jax.Array, logits: jax.Array,
                   legal: jax.Array) -> jax.Array:
    """Samples one action per row from the legal-masked policy
    (the reference's ``torch.multinomial(policy, 1)``, net.py:49)."""
    return jax.random.categorical(key, masked_logits(logits, legal), axis=-1)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax Dense kernels are (fan_in, fan_out).
    """
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default; flax Conv kernels are (kh, kw, in, out)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
