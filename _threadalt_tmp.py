import concurrent.futures, dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
import cartographer_tpu.ops.frontend_2d as f2
import cartographer_tpu.mapping.probability_values as pv

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
C, N, G = 32, 2048, 512
cfg = dataclasses.replace(f2.FrontendConfig2D(
    grid_size=G, resolution=0.05, num_range_data=40,
    hit_log_odds=pv.hit_update_log_odds(0.55),
    miss_log_odds=pv.miss_update_log_odds(0.49),
    insert_free_space=True, min_range=0.0, max_range=10.0,
    missing_data_ray_length=5.0, min_z=-0.8, max_z=2.0,
    voxel_filter_size=0.025, avf_max_length=0.5, avf_min_num_points=100,
    avf_max_range=50.0, occupied_space_weight=1.0, translation_weight=10.0,
    rotation_weight=40.0, gn_iterations=20, mf_max_time=5.0,
    mf_max_distance=0.2, mf_max_angle=np.radians(1.0),
    pose_queue_duration=0.001, num_steps=256, has_misses=False,
), chunk_size=C, num_points=N)
st = f2.init_state(G, 0.0)
o_points, o_times, o_meta, o_imu, o_odom, total = f2.input_layout(cfg)
buf = np.zeros(total, np.uint8)
sm = buf[o_meta:o_imu].view(np.float32).reshape(C, 8)
sm[:, 0] = np.arange(C) * 0.1
sm[:, 4] = 100
sm[:, 5] = np.arange(C) * 0.1
state = st
for i in range(6):
    s2, fin, op, po = f2.run_chunk(cfg, state, np.float32(0.0), buf)
    jax.block_until_ready(po)
    state = s2
    _ = np.asarray(po)
gather_bench("after 6 main-thread chunks with fetches")
