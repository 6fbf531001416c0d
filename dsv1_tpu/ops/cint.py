"""C integer semantics as JAX ops.

The DSV1 spec math is defined in terms of C89 integer arithmetic: `/` and `%`
truncate toward zero, `>>` on negatives is arithmetic, and several helpers use
sign-symmetric rounding shifts (reference sbt.c:62-88, hzcc.c:94-135,437-447).
Everything downstream (transforms, quantizers, filters) is built on these, so
they are property-tested against a compiled build of the reference C.

All functions accept/return int32 jnp arrays (or python ints for the static
variants) and are safe inside jit.
"""

import jax.numpy as jnp
from jax import lax


def trunc_div(a, b):
    """C `/`: truncating integer division (rounds toward zero).

    lax.div implements exactly this for signed integer dtypes.
    """
    return lax.div(a, b)


def trunc_mod(a, b):
    """C `%`: remainder with the sign of the dividend."""
    return lax.rem(a, b)


def sym_round_shift(v, add: int, shift: int):
    """Sign-symmetric rounding shift: -((-v + add) >> shift) for v < 0.

    Implements round2/round4/round8 of the reference (sbt.c:62-88).
    """
    a = jnp.abs(v)
    r = (a + add) >> shift
    return jnp.where(v < 0, -r, r)


def round2(v):
    return sym_round_shift(v, 1, 1)


def round4(v):
    return sym_round_shift(v, 2, 2)


def round8(v):
    return sym_round_shift(v, 4, 3)


def lb2(n):
    """dsv_lb2: smallest k such that (1 << k) >= n (hzcc.c:437-447).

    Traced-safe; n must be positive int32.
    """
    n = jnp.asarray(n, jnp.int32)
    y = (n - 1).astype(jnp.uint32)
    k = 32 - lax.clz(y).astype(jnp.int32)
    return jnp.where(n <= 1, 0, k)


def lb2_static(n: int) -> int:
    """Python-int dsv_lb2 for static shapes."""
    k = 0
    i = 1
    while i < n:
        i <<= 1
        k += 1
    return k


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def clamp_u8(v):
    """clamp_u8 (bmc.c:19-23): saturate int to [0, 255], returns int32."""
    return jnp.clip(v, 0, 255)
