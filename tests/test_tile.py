"""Subband-tile sharding (parallel/tile.py): bit-exactness of the
column-sharded transforms + plane core vs the single-device kernels, with
inputs actually laid out across the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dsv1_tpu.ops import hzcc, sbt
from dsv1_tpu.parallel.tile import (encode_plane_tiled, fwd_sbt_tiled,
                                    inv_sbt_tiled, tile_mesh)


def _rand_coefs(h, w, seed, lo=-160, hi=160):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, (h, w)).astype(np.int32)


def _shard(a, mesh):
    return jax.device_put(a, NamedSharding(mesh, P(None, "tile")))


@pytest.mark.parametrize("w,h", [(256, 192), (352, 288), (1920, 1080)])
@pytest.mark.parametrize("is_p", [False, True])
def test_fwd_sbt_tiled_bit_exact(w, h, is_p):
    mesh = tile_mesh()
    a = _rand_coefs(h, w, seed=w + is_p)
    ref = np.asarray(jax.jit(lambda x: sbt.fwd_sbt(x, is_p))(a))
    out = fwd_sbt_tiled(_shard(a, mesh), is_p, mesh)
    # the output really is distributed over the tile axis
    assert len(out.sharding.device_set) == len(mesh.devices)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("w,h", [(256, 192), (1920, 1080)])
@pytest.mark.parametrize("is_p", [False, True])
@pytest.mark.parametrize("quant", [137, 1024])
def test_inv_sbt_tiled_bit_exact(w, h, is_p, quant):
    mesh = tile_mesh()
    a = _rand_coefs(h, w, seed=3 * w + is_p + quant)
    ref = np.asarray(jax.jit(
        lambda x: sbt.inv_sbt(x, jnp.int32(quant), is_p, True))(a))
    out = inv_sbt_tiled(_shard(a, mesh), quant, is_p, True, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("is_p", [False, True])
def test_encode_plane_tiled_matches_core(is_p):
    w, h, nbh, nbv = 352, 288, 22, 18
    mesh = tile_mesh()
    tables = hzcc.build_tables(w, h, nbh, nbv)
    a = _rand_coefs(h, w, seed=9 + is_p, lo=-128, hi=128)
    rng = np.random.default_rng(5)
    stable = rng.integers(0, 4, nbh * nbv).astype(np.uint8)
    q = 512

    def ref_fn(x, qq, st):
        aa = sbt.fwd_sbt(x, is_p)
        qv, wb = hzcc.encode_plane_core(aa, qq, is_p, 0, st, tables)
        rec = sbt.inv_sbt(wb, qq, is_p, is_luma=True)
        return qv, aa[0, 0], rec

    qv_r, dc_r, rec_r = jax.jit(ref_fn)(a, jnp.int32(q), stable)
    qv_t, dc_t, rec_t = encode_plane_tiled(_shard(a, mesh), q, is_p, 0,
                                           stable, nbh, nbv, mesh)
    np.testing.assert_array_equal(np.asarray(qv_t), np.asarray(qv_r))
    assert int(dc_t) == int(dc_r)
    np.testing.assert_array_equal(np.asarray(rec_t), np.asarray(rec_r))
