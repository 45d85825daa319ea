import os
import sys

# Force the virtual CPU mesh for sharding tests and keep unit tests off the
# (single) real TPU chip unless a test opts in explicitly.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend via config
# so unit tests get the 8-device virtual mesh and stay off the real chip.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "src"))
sys.path.insert(0, os.path.join(_ROOT, "tools", "refshim"))
