import time, numpy as np, jax, jax.numpy as jnp
from markovflow_tpu.ops import kalman as K
from markovflow_tpu.ops.pallas_scan import pallas_filter_scan
from markovflow_tpu.ops.scans import scan_tl

T = 1_000_000
rng = np.random.default_rng(0)
d = 2
def mk(*shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.01)
elems = (mk(d,d,T)*0.1 + jnp.eye(d)[...,None]*0.9, mk(d,1,T), jnp.abs(mk(d,d,T))*0.01 + jnp.eye(d)[...,None]*0.01, jnp.abs(mk(d,d,T))*0.01, mk(d,1,T))

xla_fn = jax.jit(lambda el: scan_tl(K._combine_filter_tl, K._filter_identity_like, el))
pl_fn = jax.jit(lambda el: pallas_filter_scan(el))

def bench(name, fn):
    out = fn(elems); jax.block_until_ready(out)
    ts=[]
    for _ in range(10):
        t0=time.perf_counter(); jax.block_until_ready(fn(elems)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {np.median(ts)*1e3:.3f} ms", flush=True)
    return out

o1 = bench("xla scan_tl fwd", xla_fn)
o2 = bench("pallas scan fwd", pl_fn)
err_m = float(jnp.max(jnp.abs(o1[1] - o2[0])))
err_p = float(jnp.max(jnp.abs(o1[2] - o2[1])))
print(f"max diff: m={err_m:.2e} P={err_p:.2e}", flush=True)
