import time, sys
import jax, jax.numpy as jnp, numpy as np
from dpde_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from dpde_tpu.models import Denoiser, EDMUNet

h=w=64
for b in [128, 256, 512]:
    net = EDMUNet(img_channels=2, label_dim=2, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1,h,w,2), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, jnp.ones((1,)), jnp.zeros((1,2)), None)
    def apply_fn(p,xx,ss,ll,oo,train=False,rngs=None):
        return net.apply(p,xx,ss,ll,oo,train=train)
    den = Denoiser(apply_fn, params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b,h,w,2)), jnp.float32)
    s = jnp.ones((b,), jnp.float32); l = jnp.zeros((b,2), jnp.float32)
    f = jax.jit(lambda x,s,l: den(x,s,l))
    f(x,s,l).block_until_ready()
    t0=time.perf_counter(); R=20
    for _ in range(R): o=f(x,s,l)
    o.block_until_ready()
    dt=(time.perf_counter()-t0)/R
    print(f"b={b}: fwd {dt*1e3:.2f} ms -> {b/dt:.0f} samples/s", file=sys.stderr)
