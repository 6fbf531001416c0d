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


def _chunk_width(S: int) -> int:
    """Largest power-of-two divisor of the row stride, capped at 128.
    Strides are 16-byte aligned (frame.c:63), so this is >= 16; bigger
    chunks mean fewer gather rows with longer contiguous slices."""
    cw = 16
    while cw < 128 and S % (cw * 2) == 0:
        cw *= 2
    return cw


def span_gather(flat, row_start, BW: int, S: int):
    """Gather BW contiguous bytes at each flat byte offset in row_start.

    row_start: (nb, BH) non-negative flat offsets into a row-structured
    uint8 buffer with 16-byte-aligned row length S. TPU-native lowering:
    XLA:TPU only runs gathers efficiently when the minor dimension is a
    contiguous slice (offset_dims on the lane axis); per-element gathers
    and take_along_axis scalarize (~12ns/element, ~100ms/frame at CIF,
    measured from the compiled HLO). So: (1) view the flat buffer as
    16-byte chunks and outer-dim-gather the k chunks covering each span
    (reads cross row boundaries through flat memory exactly like the
    reference's bounds-check-free C reads, e.g. hme.c:526-541), then
    (2) align columns with a small one-hot contraction on the MXU —
    exact, since u8 values and one-hot weights are exact in bf16 with
    f32 accumulation. The k*16 one-hot stays tiny at any resolution
    (a stride-wide variant needs a 2S-column one-hot: 0.5 GB/window at
    1080p).

    All rows of a span share the same intra-chunk offset (row_start rows
    differ by multiples of S, and 16 | S), so the one-hot is built per
    span from row 0.
    """
    CW = _chunk_width(S)
    k = (BW - 1) // CW + 2
    nch = flat.shape[0] // CW
    chunks2d = flat[:nch * CW].reshape(nch, CW)
    c0 = row_start // CW                           # (nb, BH)
    idx = jnp.clip(c0[:, :, None] + jnp.arange(k)[None, None, :],
                   0, nch - 1)
    slab = chunks2d[idx].reshape(row_start.shape[0], row_start.shape[1],
                                 k * CW)           # (nb, BH, k*CW)
    o = row_start[:, 0] % CW                       # (nb,)
    sel = (o[:, None, None] + jnp.arange(BW)[None, :, None]
           == jnp.arange(k * CW)[None, None, :])   # (nb, BW, k*CW)
    win = jnp.einsum("nrc,nwc->nrw", slab.astype(jnp.bfloat16),
                     sel.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    # barrier the result: without it XLA fuses the chunk gather into
    # downstream consumers, which scalarizes it inside the fusion loop
    # (isolated gather ~60x faster than the same gather fused, measured)
    return runtime(win.astype(jnp.uint8))
