"""Microbench: alternative formulations of one Haar fwd/inv level at
1080p on the TPU. Finds the fast layout before rewriting ops/sbt.py."""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / "build"
                      / "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from dsv1_tpu.ops.cint import trunc_div  # noqa: E402

H, W = 1080, 1920


def timeit(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label:34s} {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms")
    return out


def fwd_v0(a):
    """Current ops/sbt.py formulation (full-frame level: hs=H, ws=W)."""
    r = a
    x0 = r[0::2, 0::2]
    x1 = r[0::2, 1::2]
    x2 = r[1::2, 0::2]
    x3 = r[1::2, 1::2]
    LL = trunc_div((x0 + x1 + x2 + x3) * 4, 5)
    LH = x0 - x1 + x2 - x3
    HL = x0 + x1 - x2 - x3
    HH = x0 - x1 - x2 + x3
    ch, cw = H // 2, W // 2
    a = a.at[0:ch, 0:cw].set(LL)
    a = a.at[0:ch, cw:].set(LH)
    a = a.at[ch:, 0:cw].set(HL)
    a = a.at[ch:, cw:].set(HH)
    return a


def fwd_v1(a):
    """Concat assembly instead of quadrant scatter."""
    x0 = a[0::2, 0::2]
    x1 = a[0::2, 1::2]
    x2 = a[1::2, 0::2]
    x3 = a[1::2, 1::2]
    LL = trunc_div((x0 + x1 + x2 + x3) * 4, 5)
    LH = x0 - x1 + x2 - x3
    HL = x0 + x1 - x2 - x3
    HH = x0 - x1 - x2 + x3
    return jnp.concatenate([jnp.concatenate([LL, LH], 1),
                            jnp.concatenate([HL, HH], 1)], 0)


def fwd_v2(a):
    """Row pairs first (sublane stride), then lane deinterleave + concat."""
    e = a[0::2, :]
    o = a[1::2, :]
    s = e + o
    d = e - o
    su, sv = s[:, 0::2], s[:, 1::2]
    du, dv = d[:, 0::2], d[:, 1::2]
    LL = trunc_div((su + sv) * 4, 5)
    LH = su - sv
    HL = du + dv
    HH = du - dv
    return jnp.concatenate([jnp.concatenate([LL, LH], 1),
                            jnp.concatenate([HL, HH], 1)], 0)


def fwd_v3(a):
    """Reshape-based deinterleave."""
    r = a.reshape(H // 2, 2, W // 2, 2)
    x0 = r[:, 0, :, 0]
    x1 = r[:, 0, :, 1]
    x2 = r[:, 1, :, 0]
    x3 = r[:, 1, :, 1]
    LL = trunc_div((x0 + x1 + x2 + x3) * 4, 5)
    LH = x0 - x1 + x2 - x3
    HL = x0 + x1 - x2 - x3
    HH = x0 - x1 - x2 + x3
    return jnp.concatenate([jnp.concatenate([LL, LH], 1),
                            jnp.concatenate([HL, HH], 1)], 0)


def fwd_v4(a):
    """Row pairs via reshape on sublanes, lane deinterleave via reshape."""
    r = a.reshape(H // 2, 2, W)
    s = r[:, 0, :] + r[:, 1, :]
    d = r[:, 0, :] - r[:, 1, :]
    s2 = s.reshape(H // 2, W // 2, 2)
    d2 = d.reshape(H // 2, W // 2, 2)
    su, sv = s2[:, :, 0], s2[:, :, 1]
    du, dv = d2[:, :, 0], d2[:, :, 1]
    LL = trunc_div((su + sv) * 4, 5)
    LH = su - sv
    HL = du + dv
    HH = du - dv
    return jnp.concatenate([jnp.concatenate([LL, LH], 1),
                            jnp.concatenate([HL, HH], 1)], 0)


def inv_v0(a):
    ch, cw = H // 2, W // 2
    LL = trunc_div(a[:ch, :cw] * 5, 4)
    LH = a[:ch, cw:]
    HL = a[ch:, :cw]
    HH = a[ch:, cw:]
    a00 = trunc_div(LL + LH + HL + HH, 4)
    a01 = trunc_div(LL - LH + HL - HH, 4)
    a10 = trunc_div(LL + LH - HL - HH, 4)
    a11 = trunc_div(LL - LH - HL + HH, 4)
    out = jnp.zeros((H, W), a.dtype)
    out = out.at[0::2, 0::2].set(a00)
    out = out.at[0::2, 1::2].set(a01)
    out = out.at[1::2, 0::2].set(a10)
    out = out.at[1::2, 1::2].set(a11)
    return out


def inv_v1(a):
    """Interleave via stack+reshape."""
    ch, cw = H // 2, W // 2
    LL = trunc_div(a[:ch, :cw] * 5, 4)
    LH = a[:ch, cw:]
    HL = a[ch:, :cw]
    HH = a[ch:, cw:]
    a00 = trunc_div(LL + LH + HL + HH, 4)
    a01 = trunc_div(LL - LH + HL - HH, 4)
    a10 = trunc_div(LL + LH - HL - HH, 4)
    a11 = trunc_div(LL - LH - HL + HH, 4)
    top = jnp.stack([a00, a01], axis=2).reshape(ch, W)
    bot = jnp.stack([a10, a11], axis=2).reshape(ch, W)
    return jnp.stack([top, bot], axis=1).reshape(H, W)


def main():
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(-256, 256, (H, W)).astype(np.int32))
    o0 = timeit("fwd v0 (current)", jax.jit(fwd_v0), a)
    o1 = timeit("fwd v1 concat", jax.jit(fwd_v1), a)
    o2 = timeit("fwd v2 rowpairs", jax.jit(fwd_v2), a)
    o3 = timeit("fwd v3 reshape", jax.jit(fwd_v3), a)
    o4 = timeit("fwd v4 reshape2", jax.jit(fwd_v4), a)
    for i, o in enumerate((o1, o2, o3, o4), 1):
        assert np.array_equal(np.asarray(o0), np.asarray(o)), i
    i0 = timeit("inv v0 (current)", jax.jit(inv_v0), a)
    i1 = timeit("inv v1 stack", jax.jit(inv_v1), a)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))

    try:
        from dsv1_tpu.ops.pallas_hme import use_pallas
        if use_pallas():
            import jax.experimental.pallas as pl

            TH, TW = 8, 512

            def kern(x_ref, ll_ref, lh_ref, hl_ref, hh_ref):
                x = x_ref[...]
                r = x.reshape(TH // 2, 2, TW)
                s = r[:, 0, :] + r[:, 1, :]
                d = r[:, 0, :] - r[:, 1, :]
                s2 = s.reshape(TH // 2, TW // 2, 2)
                d2 = d.reshape(TH // 2, TW // 2, 2)
                su, sv = s2[:, :, 0], s2[:, :, 1]
                du, dv = d2[:, :, 0], d2[:, :, 1]
                ll = (su + sv) * 4
                ll_ref[...] = jax.lax.div(ll, 5)
                lh_ref[...] = su - sv
                hl_ref[...] = du + dv
                hh_ref[...] = du - dv

            qshape = jax.ShapeDtypeStruct((H // 2, W // 2), jnp.int32)

            def fwd_pl(a):
                ll, lh, hl, hh = pl.pallas_call(
                    kern,
                    grid=(H // TH, W // TW),
                    in_specs=[pl.BlockSpec((TH, TW),
                                           lambda i, j: (i, j))],
                    out_specs=[pl.BlockSpec((TH // 2, TW // 2),
                                            lambda i, j: (i, j))] * 4,
                    out_shape=[qshape] * 4,
                )(a)
                return jnp.concatenate([jnp.concatenate([ll, lh], 1),
                                        jnp.concatenate([hl, hh], 1)], 0)

            op = timeit("fwd pallas+concat", jax.jit(fwd_pl), a)
            assert np.array_equal(np.asarray(o0), np.asarray(op))
    except Exception as e:  # pragma: no cover
        print("pallas variant failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
