import time
import numpy as np, jax, jax.numpy as jnp
from nart_tpu import film

n = 256*256
rw = rh = 256
fb = 2
table = jnp.asarray(film.filter_table())
jit2 = jnp.zeros((n,2), jnp.float32)
la = jnp.zeros((n,4), jnp.float32)
buf = jnp.zeros((260,260,5), jnp.float32)

def t(name, f, *a):
    t0=time.time(); r = f(*a); jax.block_until_ready(r)
    c = time.time()-t0
    t0=time.time(); r = f(*a); jax.block_until_ready(r)
    print(f"{name}: compile {c:.1f}s run {(time.time()-t0)*1e3:.1f}ms", flush=True)

t("tap_weights", jax.jit(lambda j: film.tap_weights(j, 2.0, table, fb)), jit2)
w = film.tap_weights(jit2, 2.0, table, fb)
vals = jnp.concatenate([la[:,None,None,:]*w[...,None], w[...,None]], -1)
t("window_sum", jax.jit(lambda v: film.window_sum(v, rw, rh)), vals)
t("splat_grid x1", jax.jit(lambda b,j,l: film.splat_grid(b,j,l,2.0,table,rw,rh,fb)), buf, jit2, la)
