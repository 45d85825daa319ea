import os
import sys

# Force the virtual CPU mesh for sharding tests and keep unit tests off the
# (single) real TPU chip. The ambient environment may carry
# JAX_PLATFORMS=axon and a PJRT plugin that routes EVERYTHING (including
# compiles) through a remote tunnel — a setdefault is not enough; tests must
# override unconditionally or the whole suite silently runs over the tunnel.
if os.environ.get("CAIRO_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
else:
    # TPU-marked tests (test_pallas_tpu.py) run against the real chip:
    #   CAIRO_TPU_TESTS=1 python -m pytest -m tpu
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "src"))
sys.path.insert(0, os.path.join(_ROOT, "tools", "refshim"))
