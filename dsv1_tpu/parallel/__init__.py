"""Scale-out layer: GOP-parallel and tile-parallel encode over device meshes.

The reference codec is single-threaded by design (reference README.md:78).
Its closed-GOP bitstream (metadata re-emitted at every GOP start,
dsv_encoder.c:624-628) makes the GOP the natural sharding unit; this package
maps GOPs onto a `jax.sharding.Mesh` axis and keeps each GOP's serial
recon-chain on a single device as a `lax.scan`.
"""

from .decode import build_gop_decoder, decode_stream_gops, iter_decode_gops
from .gop import (build_gop_encoder, build_intra_encoder, gop_mesh,
                  gop_tile_mesh, encode_stream_gops)
from .multihost import (EncodedShard, encode_shard, encode_stream_multihost,
                        mux_shards, shard_ranges)
from .tile import (encode_plane_tiled, fwd_sbt_tiled, inv_sbt_tiled,
                   tile_mesh)

__all__ = ["EncodedShard", "build_gop_decoder", "build_gop_encoder",
           "build_intra_encoder", "decode_stream_gops", "encode_shard",
           "encode_plane_tiled", "encode_stream_gops",
           "encode_stream_multihost", "fwd_sbt_tiled", "gop_mesh",
           "gop_tile_mesh",
           "inv_sbt_tiled", "iter_decode_gops", "mux_shards",
           "shard_ranges", "tile_mesh"]
