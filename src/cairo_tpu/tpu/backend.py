"""Backend dispatch for the hot kernels.

The dense motion search (and other VMEM-resident kernels) have two
implementations with identical selection semantics:

  * a Pallas/Mosaic kernel (pallas_motion.py) — the TPU production path;
  * a pure-XLA formulation (motion.py) — the portable anchor, used on CPU
    (tests, the virtual 8-device mesh, dryruns) and as the differential
    reference for the kernel.

`use_pallas()` picks the Pallas path exactly when running on a real TPU
backend; CAIRO_TPU_PALLAS=0/1 overrides for A/B benchmarking.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=None)
def use_pallas() -> bool:
    env = os.environ.get("CAIRO_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"
