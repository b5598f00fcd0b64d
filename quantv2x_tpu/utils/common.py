"""Small shared numeric helpers (pure jnp, jit-safe).

Behavioral parity: /root/reference/opencood/utils/common_utils.py (limit_period).
"""

import jax.numpy as jnp


def limit_period(val, offset: float = 0.5, period: float = 2 * jnp.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``.

    Same contract as the reference's ``common_utils.limit_period``.
    """
    return val - jnp.floor(val / period + offset) * period


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
