import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize("localhost:29876", num_processes=2, process_id=pid)
import jax.numpy as jnp
print(f"proc {pid}: local={len(jax.local_devices())} global={len(jax.devices())}", flush=True)
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
import numpy as np
mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
f = shard_map(lambda a: jax.lax.psum(a.sum(), "x")[None], mesh=mesh,
              in_specs=P("x"), out_specs=P())
arr = jnp.arange(64, dtype=jnp.int32)
out = f(arr)
print(f"proc {pid}: psum={int(out[0])} want={64*63//2}", flush=True)
assert int(out[0]) == 64*63//2
print(f"proc {pid}: OK", flush=True)
