import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.sharding import Mesh

from tiberate_tpu.config.toy import toy_config
from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.parallel.rns_sharded import make_rns_sharded_switcher

# C_ord=4, C_sp=6 at level 0 -> divisible by D=2
cfg = toy_config(logN=7, num_scales=3, num_special_primes=2, scale_bits=30)
eng = CkksEngine(cfg, seed=5, nonce=2)
evk = eng.evk

rng = np.random.default_rng(0)
C = eng.params.P  # level 0 ordinary channels
a = np.stack([rng.integers(0, q, eng.params.N)
              for q in eng.params.q[:C]]).astype(np.int64)

# unsharded reference
c0_ref, c1_ref = eng.create_switcher(jnp.asarray(a), evk, level=0)

# sharded over a 2-device rns mesh
mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("rns",))
switcher = make_rns_sharded_switcher(eng, 0, mesh, axis="rns")
c0_s, c1_s = jax.jit(lambda x: switcher(x, tuple(evk.data)))(jnp.asarray(a))

ok0 = (np.asarray(c0_ref) == np.asarray(c0_s)).all()
ok1 = (np.asarray(c1_ref) == np.asarray(c1_s)).all()
print("rns-sharded keyswitch bit-exact:", bool(ok0 and ok1))
print("shardings:", c0_s.sharding)
