import math, time, functools
import jax, jax.numpy as jnp, numpy as np
from detail_tts_tpu.ops.pallas.attention import attention_train_padded

b, h, t, d = 8, 16, 496, 48
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0,1,(b,h,t,d)).astype(np.float32))
k = jnp.asarray(rng.normal(0,1,(b,h,t,d)).astype(np.float32))
v = jnp.asarray(rng.normal(0,1,(b,h,t,d)).astype(np.float32))
bias = jnp.asarray(rng.normal(0,1,(h,t,t)).astype(np.float32))
sm = 1.0/math.sqrt(d)

def loss_ker(q,k,v,bias):
    return jnp.sum(attention_train_padded(q,k,v,bias,sm_scale=sm,block_q=256)**2)

def loss_ref(q,k,v,bias):
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k)*sm + bias[None]
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(jnp.einsum("bhts,bhsd->bhtd", w, v)**2)

gk = jax.jit(jax.grad(loss_ker, argnums=(0,1,2,3)))
gr = jax.jit(jax.grad(loss_ref, argnums=(0,1,2,3)))
t0=time.perf_counter(); a = gk(q,k,v,bias); jax.device_get(a[0].ravel()[0]); print("kernel compile+1", time.perf_counter()-t0)
t0=time.perf_counter(); r = gr(q,k,v,bias); jax.device_get(r[0].ravel()[0]); print("ref compile+1", time.perf_counter()-t0)
for name, x, y in zip(("dq","dk","dv","db"), a, r):
    x, y = np.asarray(x), np.asarray(y)
    print(name, "maxabs", float(np.abs(x-y).max()), "rel", float(np.abs(x-y).max()/ (np.abs(y).max()+1e-9)))
N=20
t0=time.perf_counter()
for i in range(N): a = gk(q,k,v,bias)
jax.device_get(a[0].ravel()[0]); print("kernel", (time.perf_counter()-t0)/N*1e3, "ms")
t0=time.perf_counter()
for i in range(N): r = gr(q,k,v,bias)
jax.device_get(r[0].ravel()[0]); print("xla   ", (time.perf_counter()-t0)/N*1e3, "ms")
