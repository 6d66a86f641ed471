"""Bisect bnb_search cost: run the fused search with pieces disabled."""
import time, math
import numpy as np
import jax, jax.numpy as jnp
from cartographer_tpu.ops.scan_matching import fast_correlative_2d as fc2

rng = np.random.default_rng(0)
H = W = 512
depth = 7
B = 16
prob = jnp.asarray(rng.uniform(0.1, 0.9, (H, W)).astype(np.float32))
pyr1 = fc2.compute_pyramid(prob, depth)
pyr = jnp.stack([pyr1] * B)
N = 128
pts = rng.uniform(-8, 8, (B, N, 2)).astype(np.float32)
pmask = np.ones((B, N), bool)
A_real = 295
A = 512
angles_r = np.zeros(A, np.float32)
angles_r[:A_real] = np.linspace(-0.5, 0.5, A_real)
angles = np.tile(angles_r, (B, 1))
initial = np.tile(np.array([12.8, 12.8, 0.0], np.float32), (B, 1))
origin = np.zeros((B, 2), np.float32)
res = np.full((B,), 0.05, np.float32)
num_linear = 140
offs = np.arange(-num_linear, num_linear+1, 64, dtype=np.int32)
a_g, x_g, y_g = np.meshgrid(np.arange(A_real, dtype=np.int32), offs, offs, indexing="ij")
K0 = 1 << int(np.ceil(np.log2(a_g.size)))
a0 = np.zeros((B, K0), np.int32); x0 = np.zeros((B, K0), np.int32); y0 = np.zeros((B, K0), np.int32)
m0 = np.zeros((B, K0), bool)
a0[:, :a_g.size] = a_g.ravel(); x0[:, :a_g.size] = x_g.ravel(); y0[:, :a_g.size] = y_g.ravel()
m0[:, :a_g.size] = True
print("K0:", a_g.size, "padded", K0)

args = (pyr, jnp.asarray(pts), jnp.asarray(pmask), jnp.asarray(angles),
        jnp.asarray(initial), jnp.asarray(origin), jnp.asarray(res),
        jnp.asarray(a0), jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(m0),
        jnp.full((B,), num_linear, np.int32), jnp.full((B,), 0.3, np.float32))

for beam, probe in [(4096, 256), (4096, 8), (1024, 256)]:
    out = fc2.bnb_search_batch(*args, depth, beam, probe)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fc2.bnb_search_batch(*args, depth, beam, probe)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/5
    print(f"beam={beam} probe={probe}: {dt*1000:.1f} ms/batch16 -> {B/dt:.1f} matches/s")
