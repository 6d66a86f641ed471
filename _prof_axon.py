import time
import numpy as np
import jax, jax.numpy as jnp

x = jnp.ones((256,), jnp.float32)
jax.block_until_ready(x + 1)  # warm

# 20 tiny chained ops, no fetch: is submission itself slow?
t0 = time.perf_counter()
y = x
for i in range(20):
    y = y + 1.0
t1 = time.perf_counter()
jax.block_until_ready(y)
t2 = time.perf_counter()
print(f"20 tiny op submissions: {t1-t0:.3f}s, block: {t2-t1:.3f}s")

# jitted single op, repeated calls (cached executable)
f = jax.jit(lambda a: a * 2.0)
jax.block_until_ready(f(x))
t0 = time.perf_counter()
z = x
for i in range(20):
    z = f(z)
t1 = time.perf_counter()
jax.block_until_ready(z)
t2 = time.perf_counter()
print(f"20 cached jit submissions: {t1-t0:.3f}s, block: {t2-t1:.3f}s")

# device_put of ~2MB
buf = np.zeros(2_000_000, np.uint8)
t0 = time.perf_counter()
d = jax.device_put(buf)
t1 = time.perf_counter()
jax.block_until_ready(d)
t2 = time.perf_counter()
print(f"device_put 2MB: submit {t1-t0:.3f}s, block {t2-t1:.3f}s")

# .at[].set row splice pattern (16 separate updates)
big = jnp.zeros((16, 1024, 2), jnp.float32)
row = jnp.ones((1024, 2), jnp.float32)
jax.block_until_ready(big.at[0].set(row))
t0 = time.perf_counter()
b = big
for i in range(16):
    b = b.at[i, :1000, :].set(row[:1000])
t1 = time.perf_counter()
jax.block_until_ready(b)
t2 = time.perf_counter()
print(f"16 row splices: submit {t1-t0:.3f}s, block {t2-t1:.3f}s")
