import time
import numpy as np
import jax, jax.numpy as jnp
from cartographer_tpu.common.config import GridOptions2D, SubmapsOptions2D, TrajectoryBuilder2DOptions
from cartographer_tpu.mapping.chunked_frontend_2d import ChunkedLocalTrajectoryBuilder2D
from cartographer_tpu.testing.synthetic import generate_fake_range_measurements

def gather_bench(label):
    rng = np.random.default_rng(2)
    B, C, N = 16, 16384, 128
    pool = jnp.asarray(rng.integers(0, 255, (B, 512, 512)).astype(np.uint8))
    ix = jnp.asarray(rng.integers(0, 512, (B, C, N)).astype(np.int32))
    iy = jnp.asarray(rng.integers(0, 512, (B, C, N)).astype(np.int32))
    @jax.jit
    def g(pool, iy, ix):
        v = jax.vmap(lambda p, y, x: p[y, x])(pool, iy, ix)
        return jnp.sum(v.astype(jnp.float32), axis=-1)
    out = g(pool, iy, ix); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5): out = g(pool, iy, ix)
    jax.block_until_ready(out)
    print(f"{label}: gather {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)

gather_bench("clean")
d = np.array([2.0,1.0,0.0]); d/=np.linalg.norm(d)
ms = generate_fake_range_measurements(translation=d*10.0, duration=15.0, time_step=0.05)
b = ChunkedLocalTrajectoryBuilder2D(
    TrajectoryBuilder2DOptions(use_imu_data=False, max_range=10.0,
        submaps=SubmapsOptions2D(num_range_data=40,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512))),
    {"range"}, chunk_size=32, serialize_dispatch=True)
for m in ms:
    b.add_range_data("range", m)
b.flush()
gather_bench("after serialized frontend")
