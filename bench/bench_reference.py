"""Measures the reference C++ encoder/decoder throughput on this host's CPU.

This sets the concrete single-chip bar from BASELINE.md: 1080p encode fps/chip
must beat this number. Content is a synthetic game-stream-like sequence
(scrolling gradient + moving blocks + noise) so inter prediction has real work.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "refshim"))
from oracle import OracleEncoder, OracleDecoder


def synth_sequence(width, height, n_frames, seed=7):
    """Scrolling background + moving sprites + light noise, RGB24."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    background = (128 + 80 * np.sin(xx * 0.02) * np.cos(yy * 0.03)).astype(np.int16)
    frames = []
    for t in range(n_frames):
        frame = np.roll(background, t * 4, axis=1).copy()
        for s in range(8):
            sx = int((s * 97 + t * (5 + s)) % max(1, width - 40))
            sy = int((s * 61 + t * (3 + s)) % max(1, height - 40))
            frame[sy:sy + 40, sx:sx + 40] = 40 + 25 * s
        noise = rng.integers(-4, 5, size=frame.shape, dtype=np.int16)
        luma = np.clip(frame + noise, 0, 255).astype(np.uint8)
        rgb = np.stack([luma, np.roll(luma, 1, axis=0), 255 - luma], axis=-1)
        frames.append(np.ascontiguousarray(rgb))
    return frames


def bench(width, height, n_frames=12, quality=16):
    frames = synth_sequence(width, height, n_frames)
    enc = OracleEncoder(capacity_bytes=256 << 20)
    enc.set_quality(quality)
    dec = OracleDecoder()

    # warm-up frame (lazy init) excluded from timing
    chunk0, _ = enc.encode(frames[0])
    dec.decode(chunk0, width, height)

    t0 = time.perf_counter()
    chunks = [enc.encode(f)[0] for f in frames[1:]]
    t1 = time.perf_counter()
    for c in chunks:
        dec.decode(c, width, height)
    t2 = time.perf_counter()

    n = len(chunks)
    enc_fps = n / (t1 - t0)
    dec_fps = n / (t2 - t1)
    total_fps = n / (t2 - t0)
    kbps = sum(len(c) for c in chunks) * 8 * 30 / n / 1000
    return enc_fps, dec_fps, total_fps, kbps


if __name__ == "__main__":
    for name, w, h, n in [("CIF 352x288", 352, 288, 30),
                          ("720p", 1280, 720, 12),
                          ("1080p", 1920, 1080, 8)]:
        enc_fps, dec_fps, total_fps, kbps = bench(w, h, n)
        print(f"{name}: encode {enc_fps:.2f} fps, decode {dec_fps:.2f} fps, "
              f"encode+decode {total_fps:.2f} fps, {kbps:.0f} kbit/s @30fps")
