

def honor_jax_platforms():
    """Apply the JAX_PLATFORMS env var via jax.config.

    The axon sitecustomize pins the TPU plugin and ignores the env var,
    so scripts that want `JAX_PLATFORMS=cpu python script.py` to work
    must call this before touching any device.  Returns the value (or
    None when unset)."""
    import os

    val = os.environ.get("JAX_PLATFORMS")
    if val:
        import jax

        jax.config.update("jax_platforms", val)
    return val
