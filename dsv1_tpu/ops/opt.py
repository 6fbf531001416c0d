"""XLA/TPU lowering helpers."""

import jax.numpy as jnp
from jax import lax


def runtime(*xs):
    """Mark index arrays as runtime values to defeat constant folding.

    XLA:TPU lowers gathers/scatters whose index operand is a compile-time
    constant through a pathologically slow path (~25ms per dispatch,
    measured on v5e: 27.5ms -> 0.044ms for a 6-window SAD when the block
    coordinates stop being constants). Wrapping the indices in an
    optimization barrier keeps them as materialized runtime values and
    restores the fast dynamic-gather lowering. A barrier on an
    already-runtime value is free, so call sites apply it
    unconditionally.
    """
    out = lax.optimization_barrier(xs)
    return out[0] if len(xs) == 1 else out


def span_gather(flat, row_start, BW: int, S: int):
    """Gather BW contiguous bytes at each flat byte offset in row_start.

    row_start: (nb, BH) flat offsets into a row-structured uint8 buffer
    with row length S. TPU-native lowering: XLA:TPU only runs gathers
    efficiently when the minor dimension is a contiguous slice
    (offset_dims on the lane axis); per-element gathers and
    take_along_axis scalarize (~12ns/element, ~100ms/frame at CIF,
    measured from the compiled HLO). So: (1) outer-dim row gather of two
    consecutive S-byte rows — a span straddles at most one S-boundary
    since |column offset| < S, which also reproduces the reference's
    C-memory row-wrap reads (e.g. the bounds-check-free refine at
    hme.c:526-541) exactly like a clamped flat-index gather — then
    (2) column alignment as a one-hot contraction on the MXU. Exact:
    u8 values and one-hot weights are exact in bf16, products accumulate
    in f32.

    All rows of a span share the same intra-row offset (row_start rows
    differ by multiples of S), so the one-hot is built per span from row
    0; it can only diverge per-row at the r0 clamp, which is unreachable
    for in-border motion vectors (the head/tail margins cover the
    overhang).
    """
    nr = flat.shape[0] // S
    plane2d = flat[:nr * S].reshape(nr, S)
    r0 = jnp.clip(row_start // S, 0, nr - 2)
    slab = jnp.concatenate([plane2d[r0], plane2d[r0 + 1]], axis=-1)
    o = row_start[:, 0] - r0[:, 0] * S            # (nb,), in [0, S)
    sel = (o[:, None, None] + jnp.arange(BW)[None, :, None]
           == jnp.arange(2 * S)[None, None, :])   # (nb, BW, 2S)
    win = jnp.einsum("nrc,nwc->nrw", slab.astype(jnp.bfloat16),
                     sel.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return win.astype(jnp.uint8)
