"""cairo-tpu: a TPU-native (JAX/XLA/Pallas) evx1 video codec.

Public surface (evx1.h:66-122 parity, plus TPU engines):
  Evx1Encoder / Evx1Decoder   -- conformance-mode numpy engine (bit-exact
                                 with the reference encoder).
  TpuEncoder / TpuDecoder     -- fast-mode JAX/Pallas engine (format-
                                 conformant streams, parallel pipeline);
                                 imported lazily (pulls in jax).
  checkpoint / metrics        -- session save/resume, per-frame stats.
"""

from . import checkpoint, metrics, tables
from .blocktypes import BlockTable
from .cpuref.api import Evx1Encoder, Evx1Decoder

__version__ = "0.2.0"
__all__ = ["Evx1Encoder", "Evx1Decoder", "TpuEncoder", "TpuDecoder",
           "BlockTable", "checkpoint", "metrics", "tables"]


def __getattr__(name):
    if name in ("TpuEncoder", "TpuDecoder"):
        from .tpu import api as tpu_api
        return getattr(tpu_api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
