import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
H = W = 512
B, C, N = 16, 16384, 128
pool_u8 = jnp.asarray(rng.integers(0, 255, (B, H, W)).astype(np.uint8))
pool_f32 = pool_u8.astype(jnp.float32)
ix = jnp.asarray(rng.integers(0, W, (B, C, N)).astype(np.int32))
iy = jnp.asarray(rng.integers(0, H, (B, C, N)).astype(np.int32))

@jax.jit
def g_u8(pool, iy, ix):
    v = jax.vmap(lambda p, y, x: p[y, x])(pool, iy, ix)
    return jnp.sum(v.astype(jnp.float32), axis=-1)

@jax.jit
def g_f32(pool, iy, ix):
    v = jax.vmap(lambda p, y, x: p[y, x])(pool, iy, ix)
    return jnp.sum(v, axis=-1)

@jax.jit
def g_flat_u8(pool, iy, ix):
    # flat 1D index gather
    v = jax.vmap(lambda p, y, x: p.reshape(-1)[y * W + x])(pool, iy, ix)
    return jnp.sum(v.astype(jnp.float32), axis=-1)

for name, fn, pool in [("u8 2d", g_u8, pool_u8), ("f32 2d", g_f32, pool_f32), ("u8 flat", g_flat_u8, pool_u8)]:
    out = fn(pool, iy, ix); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(pool, iy, ix)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt*1000:.1f} ms for {B*C*N/1e6:.0f}M gathers -> {B*C*N/dt/1e9:.2f} G/s")

# top_k cost at the same shapes
scores = jnp.asarray(rng.uniform(0, 1, (B, C)).astype(np.float32))
@jax.jit
def tk(s):
    v, i = jax.lax.top_k(s, 4096)
    return v.sum()
out = tk(scores); out.block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    out = tk(scores)
out.block_until_ready()
print(f"top_k 4096 of {C} x{B}: {(time.perf_counter()-t0)/10*1000:.1f} ms")
