"""Time the packed BnB search program in a CLEAN process (no frontend)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from cartographer_tpu.ops.scan_matching import fast_correlative_2d as fc2

rng = np.random.default_rng(0)
B, A, K0, N, H = 16, 512, 8192, 256, 512
pyr1 = fc2.compute_pyramid(jnp.asarray(rng.uniform(0.1, 0.9, (H, H)).astype(np.float32)), 7)
pyr = jnp.stack([pyr1] * B)
offs = np.arange(-140, 141, 64, dtype=np.int32)
ag, xg, yg = np.meshgrid(np.arange(295, dtype=np.int32), offs, offs, indexing="ij")
angles = np.zeros((B, A), np.float32)
angles[:, :295] = np.linspace(-0.5, 0.5, 295)
initial = np.tile(np.array([12.8, 12.8, 0.0], np.float32), (B, 1))
origins = np.zeros((B, 2), np.float32)
res = np.full((B,), 0.05, np.float32)
ms = np.full((B,), 0.3, np.float32)
a0 = np.zeros((B, K0), np.int32); x0 = np.zeros((B, K0), np.int32)
y0 = np.zeros((B, K0), np.int32); m0 = np.zeros((B, K0), np.uint8)
a0[:, :ag.size] = ag.ravel(); x0[:, :ag.size] = xg.ravel(); y0[:, :ag.size] = yg.ravel()
m0[:, :ag.size] = 1
nl = np.full((B,), 140, np.int32)
buf = np.concatenate([
    angles.ravel().view(np.uint8), initial.ravel().view(np.uint8),
    origins.ravel().view(np.uint8), res.view(np.uint8), ms.view(np.uint8),
    a0.ravel().view(np.uint8), x0.ravel().view(np.uint8),
    y0.ravel().view(np.uint8), nl.view(np.uint8), m0.ravel()])
pts = jnp.asarray(rng.uniform(-8, 8, (B, N, 2)).astype(np.float32))
pm = jnp.asarray(np.ones((B, N), bool))
out = fc2._bnb_search_batch_packed(pyr, pts, pm, jnp.asarray(buf), B, A, K0, 7, 2048, 64)
jax.block_until_ready(out)  # compile
for t in range(3):
    t0 = time.perf_counter()
    out = fc2._bnb_search_batch_packed(pyr, pts, pm, jnp.asarray(buf), B, A, K0, 7, 2048, 64)
    np.asarray(out)
    t1 = time.perf_counter()
    print(f"trial{t}: packed search e2e (upload+run+fetch) = {t1-t0:.3f}s")
