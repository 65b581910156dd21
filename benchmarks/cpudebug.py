"""Helper for debug scripts: force CPU backend. Import FIRST."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
