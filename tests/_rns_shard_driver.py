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

# sharded over 2- and 4-device rns meshes (C_ord=4 -> ro=2 and ro=1)
ok = True
for D in (2, 4):
    mesh = Mesh(np.array(jax.devices()[:D]), axis_names=("rns",))
    switcher = make_rns_sharded_switcher(eng, 0, mesh, axis="rns")
    fn = jax.jit(lambda x: switcher(x, tuple(evk.data)))
    c0_s, c1_s = fn(jnp.asarray(a))
    ok0 = (np.asarray(c0_ref) == np.asarray(c0_s)).all()
    ok1 = (np.asarray(c1_ref) == np.asarray(c1_s)).all()
    ok = ok and ok0 and ok1
    if D == 2:
        sharding = c0_s.sharding

# the epilogue is fully local: exactly ONE all-gather (the input state
# broadcast), no other collective, in the compiled module
hlo = fn.lower(jnp.asarray(a)).compile().as_text()
n_ag = hlo.count("all-gather")
n_other = sum(hlo.count(c) for c in
              ("all-reduce", "reduce-scatter", "collective-permute",
               "all-to-all"))
print("rns-sharded keyswitch bit-exact:", bool(ok))
print("collectives: all_gather=%d other=%d" % (n_ag, n_other))
print("single-gather epilogue:", n_ag <= 2 and n_other == 0)
print("shardings:", sharding)

# scatter_special: special rows round-robined over the shards (near-
# perfect work scaling, one extra tiny all_gather) — still bit-exact
ok_sc = True
for D in (2, 4):
    mesh = Mesh(np.array(jax.devices()[:D]), axis_names=("rns",))
    switcher = make_rns_sharded_switcher(eng, 0, mesh, axis="rns",
                                         scatter_special=True)
    fn_sc = jax.jit(lambda x: switcher(x, tuple(evk.data)))
    c0_s, c1_s = fn_sc(jnp.asarray(a))
    ok_sc = (ok_sc
             and (np.asarray(c0_ref) == np.asarray(c0_s)).all()
             and (np.asarray(c1_ref) == np.asarray(c1_s)).all())
print("scatter_special bit-exact:", bool(ok_sc))
