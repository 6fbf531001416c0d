import time, jax, jax.numpy as jnp, numpy as np
k = jax.jit(lambda x: x + 1)
for sz in (1024, 65536, 1 << 20, 4 << 20, 16 << 20):
    xs = [k(jnp.zeros(sz, jnp.int8)) for _ in range(3)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    for x in xs:
        _ = np.asarray(x)
    dt = (time.perf_counter() - t0) / 3
    print(f"{sz:>9d} B: {dt*1e3:7.2f} ms  ({sz/dt/1e6:8.1f} MB/s)")
