"""TPU-native engine (JAX/XLA/Pallas).

Fast-mode pipeline (docs/FORMAT.md §7): every per-frame decision depends only
on completed previous frames, so classification, transform, reconstruction
and band-scan deblocking run fully data-parallel on the device; the serial
slice entropy coding runs on host in C++ (cairo_tpu.native).
"""
