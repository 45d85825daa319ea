"""Per-stage timing at 1080p q16: device encode step, host entropy encode,
host entropy decode, device decode step. Run: python bench/profile_stages.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import importlib.util

import jax
import numpy as np

# load repo-root bench.py explicitly (the bench/ directory would otherwise
# shadow it if it ever grows an __init__.py)
_spec = importlib.util.spec_from_file_location(
    "_root_bench", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "bench.py"))
_root_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_root_bench)
synth_frames = _root_bench.synth_frames


def main():
    from cairo_tpu import native
    from cairo_tpu.blocktypes import BlockTable
    from cairo_tpu.tpu import engine
    from cairo_tpu.tpu.api import TpuEncoder

    width, height = 1920, 1080
    frames = synth_frames(width, height, 8)

    enc = TpuEncoder()
    enc.set_quality(16)
    chunks = []
    stats = []
    for f in frames:
        chunks.append(enc.encode(f))
        stats.append(enc.last_stats)

    for i, s in enumerate(stats):
        print(f"enc frame {i}: {s['stage_ms']}")

    # decode stages, measured separately
    from cairo_tpu.cpuref.api import FRAME_DESC_SIZE, HEADER_SIZE
    import struct
    from cairo_tpu.cpuref.api import _FRAME_FMT

    aw = (width + 15) // 16 * 16
    ah = (height + 15) // 16 * 16
    n = (aw // 16) * (ah // 16)
    bt = BlockTable.zeros(n)
    coef_y = np.zeros((ah, aw), np.int16)
    coef_u = np.zeros((ah // 2, aw // 2), np.int16)
    coef_v = np.zeros((ah // 2, aw // 2), np.int16)
    state = engine.init_state(aw, ah)

    for i, chunk in enumerate(chunks):
        offset = HEADER_SIZE if i == 0 else 0
        _, index, _ = struct.unpack(
            _FRAME_FMT, chunk[offset:offset + FRAME_DESC_SIZE])
        offset += FRAME_DESC_SIZE
        t0 = time.perf_counter()
        native.decode_slice(chunk, offset * 8, bt, coef_y, coef_u, coef_v)
        t1 = time.perf_counter()
        table = dict(block_type=bt.block_type,
                     prediction_target=bt.prediction_target,
                     motion_x=bt.motion_x, motion_y=bt.motion_y,
                     sp_pred=bt.sp_pred, sp_amount=bt.sp_amount,
                     sp_index=bt.sp_index, q_index=bt.q_index)
        coef = dict(coef_y=coef_y, coef_u=coef_u, coef_v=coef_v)
        t2 = time.perf_counter()
        state, rgb = engine.decode_step(table, coef, state, index,
                                        width=width, height=height,
                                        aligned_w=aw, aligned_h=ah)
        jax.block_until_ready(rgb)
        t3 = time.perf_counter()
        rgb_host = np.asarray(jax.device_get(rgb))
        t4 = time.perf_counter()
        print(f"dec frame {i}: entropy={1e3*(t1-t0):.1f}ms "
              f"h2d_prep={1e3*(t2-t1):.1f}ms device={1e3*(t3-t2):.1f}ms "
              f"d2h={1e3*(t4-t3):.1f}ms")
    del rgb_host


if __name__ == "__main__":
    main()
