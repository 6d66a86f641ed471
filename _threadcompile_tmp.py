import concurrent.futures, time
import numpy as np
import jax, jax.numpy as jnp
from cartographer_tpu.ops.scan_matching import fast_correlative_2d as fc2

def synth_args():
    rng = np.random.default_rng(0)
    B, A, K0, N, H = 16, 512, 8192, 128, 512
    pyr1 = fc2.compute_pyramid(jnp.asarray(rng.uniform(0.1,0.9,(H,H)).astype(np.float32)), 7)
    pyr = jnp.stack([pyr1]*B)
    offs = np.arange(-140, 141, 64, dtype=np.int32)
    ag, xg, yg = np.meshgrid(np.arange(295, dtype=np.int32), offs, offs, indexing="ij")
    a0 = np.zeros((B, K0), np.int32); x0 = np.zeros((B, K0), np.int32)
    y0 = np.zeros((B, K0), np.int32); m0 = np.zeros((B, K0), bool)
    a0[:, :ag.size] = ag.ravel(); x0[:, :ag.size] = xg.ravel(); y0[:, :ag.size] = yg.ravel()
    m0[:, :ag.size] = True
    return (pyr, jnp.asarray(rng.uniform(-8,8,(B,N,2)).astype(np.float32)),
        jnp.asarray(np.ones((B,N),bool)),
        jnp.asarray(np.tile(np.linspace(-0.5,0.5,A).astype(np.float32),(B,1))),
        jnp.asarray(np.tile(np.array([12.8,12.8,0.0],np.float32),(B,1))),
        jnp.zeros((B,2),jnp.float32), jnp.full((B,),0.05,jnp.float32),
        jnp.asarray(a0), jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(m0),
        jnp.full((B,),140,jnp.int32), jnp.full((B,),0.3,jnp.float32))

def bench(label, args):
    out = fc2.bnb_search_batch(*args, 7, 4096, 256)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3): out = fc2.bnb_search_batch(*args, 7, 4096, 256)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter()-t0)/3*1000:.1f} ms", flush=True)

args = synth_args()
bench("before", args)

from cartographer_tpu.common.config import GridOptions2D, SubmapsOptions2D, TrajectoryBuilder2DOptions
from cartographer_tpu.mapping.chunked_frontend_2d import ChunkedLocalTrajectoryBuilder2D
from cartographer_tpu.testing.synthetic import generate_fake_range_measurements
d = np.array([2.0,1.0,0.0]); d/=np.linalg.norm(d)
ms = generate_fake_range_measurements(translation=d*10.0, duration=15.0, time_step=0.05)
b = ChunkedLocalTrajectoryBuilder2D(
    TrajectoryBuilder2DOptions(use_imu_data=False, max_range=10.0,
        submaps=SubmapsOptions2D(num_range_data=40,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512))),
    {"range"}, chunk_size=32)
for m in ms[:64]:
    b.add_range_data("range", m)
b._chain.result()
bench("after 2 chunks dispatched", args)
r = b._collect()
bench("after first collect", args)
r = b._collect()
bench("after second collect", args)

# Executable-size probe: smaller unrolled depth -> proportionally smaller
# program. If per-dispatch cost scales with program size, it's program
# (re)load over the tunnel, not compute.
def bench_d(label, depth):
    out = fc2.bnb_search_batch(*args, depth, 4096, 256)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3): out = fc2.bnb_search_batch(*args, depth, 4096, 256)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter()-t0)/3*1000:.1f} ms", flush=True)
bench_d("depth7 poisoned", 7)
# Which op degrades? u8 gather vs f32 gather vs top_k at search shapes.
rng3 = np.random.default_rng(2)
B2, C2, N2 = 16, 16384, 128
pool_u8 = jnp.asarray(rng3.integers(0, 255, (B2, 512, 512)).astype(np.uint8))
pool_f32 = pool_u8.astype(jnp.float32)
ixg = jnp.asarray(rng3.integers(0, 512, (B2, C2, N2)).astype(np.int32))
iyg = jnp.asarray(rng3.integers(0, 512, (B2, C2, N2)).astype(np.int32))
@jax.jit
def g_u8(pool, iy, ix):
    v = jax.vmap(lambda p, y, x: p[y, x])(pool, iy, ix)
    return jnp.sum(v.astype(jnp.float32), axis=-1)
@jax.jit
def g_f32(pool, iy, ix):
    v = jax.vmap(lambda p, y, x: p[y, x])(pool, iy, ix)
    return jnp.sum(v, axis=-1)
@jax.jit
def tk(sc):
    v, i = jax.lax.top_k(sc, 4096)
    return v.sum()
sc = jnp.asarray(rng3.uniform(0, 1, (B2, C2)).astype(np.float32))
for name, fn, a_ in [("gather u8", g_u8, (pool_u8, iyg, ixg)),
                     ("gather f32", g_f32, (pool_f32, iyg, ixg)),
                     ("top_k", tk, (sc,))]:
    out = fn(*a_); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5): out = fn(*a_)
    jax.block_until_ready(out)
    print(f"poisoned {name}: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)
