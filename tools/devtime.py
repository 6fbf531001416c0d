"""True device-time measurement over the axon tunnel.

Single-dispatch timings through the tunnel are unreliable:
block_until_ready on a remote execution can return optimistically
(~0.04 ms) until a D2H fetch forces synchronization, after which every
blocked dispatch pays a ~40-55 ms round trip (tools/probe_link.py).

Methodology here: run the computation R times INSIDE one jit via
lax.fori_loop with a serial data dependency (the carry perturbs the
next iteration's input so XLA cannot hoist or CSE the body), fetch one
scalar, and difference two R values: per-rep = (t(R2)-t(R1))/(R2-R1).
The fixed tunnel overhead (dispatch + scalar fetch + handshakes)
cancels in the difference.

Usage: devtime(fn, args, r1=4, r2=16) -> seconds per rep.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _tree_mix(tree):
    """Cheap scalar mixing of a pytree (sum of int-cast elements)."""
    leaves = jax.tree_util.tree_leaves(tree)
    s = jnp.int32(0)
    for x in leaves:
        if hasattr(x, "dtype"):
            s = s + jnp.sum(x.astype(jnp.int32) if x.dtype != jnp.int32
                            else x, dtype=jnp.int32)
    return s


def make_looped(fn, perturb=None):
    """Build looped(R, *args) running fn R times with a serial chain.

    perturb(args, salt_i32) -> args' injects the carry into the inputs;
    default xors/adds salt into the first array argument (exact math is
    irrelevant — only the data dependency matters).
    """
    def default_perturb(args, salt):
        # (salt & 1) is data-dependent: XLA cannot fold it to 0, so the
        # loop body cannot be hoisted/CSE'd. It changes values by <=1,
        # which does not change the cost of integer math.
        a0 = args[0]
        z = (salt & 1).astype(jnp.int32 if a0.dtype == jnp.bool_
                              else a0.dtype)
        return ((a0 + z).astype(a0.dtype),) + tuple(args[1:])

    pert = perturb or default_perturb

    def looped(R, *args):
        def body(i, carry):
            salt, _ = carry
            out = fn(*pert(args, salt))
            s = _tree_mix(out)
            return (s, s)

        return lax.fori_loop(0, R, body, (jnp.int32(0), jnp.int32(0)))[1]

    return jax.jit(looped, static_argnums=0)


def devtime(fn, args, r1=2, r2=8, perturb=None, verbose=False,
            min_delta=0.25, max_r2=4096):
    """Seconds per rep of fn(*args) on device, tunnel overhead removed.

    r2 doubles until t(r2)-t(r1) exceeds min_delta seconds, so the
    differenced signal dominates the ~1 ms tunnel jitter.
    """
    looped = make_looped(fn, perturb)

    def run(R):
        t0 = time.perf_counter()
        v = looped(R, *args)
        np.asarray(v)  # force a real fetch -> real sync
        return time.perf_counter() - t0

    run(r1)  # compile + first-fetch handshake
    t1 = min(run(r1), run(r1))
    while True:
        run(r2)  # compile (each static R is its own executable)
        t2 = run(r2)
        if t2 - t1 >= min_delta or r2 >= max_r2:
            break
        r2 *= 2
    t2 = min(t2, run(r2))
    per = (t2 - t1) / (r2 - r1)
    if verbose:
        print(f"  t({r1})={t1*1e3:.1f}ms t({r2})={t2*1e3:.1f}ms "
              f"-> {per*1e3:.3f} ms/rep")
    return max(per, 0.0)


def main():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from dsv1_tpu.ops.sbt import fwd_sbt, inv_sbt

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(-12000, 12000, (H, W), np.int32))

    dt = devtime(lambda x: fwd_sbt(x, True), (a,), verbose=True)
    print(f"fwd_sbt P 1080p          {dt*1e3:9.3f} ms")
    dt = devtime(lambda x: inv_sbt(x, jnp.int32(313), True, True), (a,),
                 verbose=True)
    print(f"inv_sbt P luma 1080p     {dt*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
