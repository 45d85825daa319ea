"""Runtime codec configuration (the reference's compile-time feature matrix,
config.h:36-54, as a frozen dataclass).

The reference bakes every knob in at compile time; here they are runtime
options with the reference defaults as conformance mode. Several fields
change the wire format or the reconstruction and must therefore match
between encoder and decoder (the header carries reference_frame_count and
is verified at decode, common.cpp:25-43; the rest is out-of-band, exactly
as in the reference where both ends are compiled with the same config.h).

Engine support: the numpy conformance engine (cpuref) implements the full
matrix. The TPU fast path supports the production subset — quality,
periodic intra, inter on/off, deblocking, adaptive quantization and the
reference frame count; the exotic combinations (linear/H.263 quantization,
unrounded quantization, quantization off, grayscale) run on the cpuref
engine and raise on the TPU API.
"""

from __future__ import annotations

import dataclasses

from . import tables


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    # wire-format fields (header-checked / stream-visible)
    reference_frame_count: int = tables.REFERENCE_FRAME_COUNT  # config.h:39
    enable_chroma: bool = True                                 # config.h:42

    # behavioral fields (must match on both ends, like config.h)
    default_quality: int = tables.DEFAULT_QUALITY              # config.h:40
    periodic_intra_rate: int = tables.PERIODIC_INTRA_RATE      # config.h:41
    enable_inter_frames: bool = True                           # config.h:38
    quantization_enabled: bool = True                          # config.h:47
    linear_quantization: bool = False                          # config.h:48
    rounded_quantization: bool = True                          # config.h:49
    adaptive_quantization: bool = True                         # config.h:50
    enable_deblocking: bool = True                             # config.h:53

    def __post_init__(self):
        if not 1 <= self.reference_frame_count <= 4:
            raise ValueError("reference_frame_count must be 1..4")
        if not 1 <= self.default_quality <= 31:
            raise ValueError("default_quality must be 1..31")
        if self.periodic_intra_rate < 0:
            raise ValueError("periodic_intra_rate must be >= 0")

    @property
    def is_conformance(self) -> bool:
        return self == CONFORMANCE

    @property
    def tpu_supported(self) -> bool:
        """True if the TPU fast path implements this combination."""
        return (self.enable_chroma and self.quantization_enabled
                and not self.linear_quantization
                and self.rounded_quantization)


#: Reference defaults — bit-exact conformance mode.
CONFORMANCE = CodecConfig()
