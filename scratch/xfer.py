import time
import numpy as np, jax, jax.numpy as jnp
x = np.zeros((10_000_000,), np.float32)  # 40MB
t0=time.time(); d = jnp.asarray(x); jax.block_until_ready(d)
print(f"up 40MB: {time.time()-t0:.2f}s")
t0=time.time(); d2 = jnp.asarray(x); jax.block_until_ready(d2)
print(f"up 40MB again: {time.time()-t0:.2f}s")
y = jnp.ones((260,260,5))
jax.block_until_ready(y)
t0=time.time(); h = np.asarray(y)
print(f"down 1.3MB: {time.time()-t0:.2f}s")
b = jnp.ones((2048,2048))  # 16MB
jax.block_until_ready(b)
t0=time.time(); h = np.asarray(b)
print(f"down 16MB: {time.time()-t0:.2f}s")
