import time, os, resource
import numpy as np, jax, jax.numpy as jnp
from nart_tpu import film
table = jnp.asarray(film.filter_table())
n = 256*256
jit2 = jnp.zeros((n,2), jnp.float32); la = jnp.zeros((n,4), jnp.float32)
buf = jnp.zeros((260,260,5), jnp.float32)
f = jax.jit(lambda b,j,l: film.splat_grid(b,j,l,2.0,table,256,256,2))
t0=time.time(); c0=resource.getrusage(resource.RUSAGE_SELF).ru_utime
jax.block_until_ready(f(buf,jit2,la))
t1=time.time(); c1=resource.getrusage(resource.RUSAGE_SELF).ru_utime
print(f"splat_grid x1: wall {t1-t0:.1f}s cpu {c1-c0:.1f}s")
