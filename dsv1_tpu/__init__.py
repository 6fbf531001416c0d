"""dsv1_tpu — a TPU-native DSV1 video codec framework.

Brand-new implementation (JAX/XLA/Pallas) of the DSV1 subband video codec with
the full capability set of the reference C implementation
(LMP88959/Digital-Subband-Video-1): full-decomposition Haar/B4T wavelet
transforms, hierarchical motion estimation, half-pel block motion compensation,
stability-tracked adaptive quantization with hierarchical zero-coefficient
coding, interleaved exp-Golomb bitstreams, 4:4:4/4:2:2/4:2:0/4:1:1 chroma,
CRF/ABR rate control and scene-change detection.

The decoder is bit-exact against the reference decoder; the encoder emits
spec-valid DSV1 streams. All per-pixel/per-coefficient math runs as
integer-exact JAX ops on TPU; serial byte/bit-level work is vectorized
(prefix-sum bit packing) or handled by a small native C++ layer.
"""

from .constants import (
    SUBSAMP_444, SUBSAMP_422, SUBSAMP_420, SUBSAMP_411,
    MAX_QUALITY, quality_percent,
)
from .models.metadata import Metadata

__all__ = [
    "SUBSAMP_444", "SUBSAMP_422", "SUBSAMP_420", "SUBSAMP_411",
    "MAX_QUALITY", "quality_percent", "Metadata",
]

__version__ = "0.1.0"
