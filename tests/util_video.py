"""Shared synthetic test content + stream comparison helpers."""

import numpy as np


def synth_frames(width, height, n_frames, seed=7, noise=4):
    """Game-stream-like content: scrolling gradient + moving sprites."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    background = (128 + 80 * np.sin(xx * 0.05) * np.cos(yy * 0.07)).astype(np.int16)
    frames = []
    for t in range(n_frames):
        frame = np.roll(background, t * 3, axis=1).copy()
        for s in range(4):
            sx = int((s * 37 + t * (3 + s)) % max(1, width - 20))
            sy = int((s * 23 + t * (2 + s)) % max(1, height - 20))
            frame[sy:sy + 20, sx:sx + 20] = 30 + 40 * s
        if noise:
            frame = frame + rng.integers(-noise, noise + 1, frame.shape)
        luma = np.clip(frame, 0, 255).astype(np.uint8)
        rgb = np.stack([luma, np.roll(luma, 1, axis=0), 255 - luma], axis=-1)
        frames.append(np.ascontiguousarray(rgb))
    return frames


def assert_streams_equal(ours: bytes, ref: bytes, ref_bits: int, frame_no: int,
                         first_chunk: bool):
    """Byte-exact comparison masking the oracle's uninitialized bits:
    header byte 7 (pack(2) padding) and unused tail-byte high bits."""
    full, rem = ref_bits // 8, ref_bits % 8
    a = bytearray(ours)
    b = bytearray(ref)
    assert len(a) == len(b) == full + (1 if rem else 0), \
        f"frame {frame_no}: length {len(a)} != {len(b)} (bits {ref_bits})"
    if first_chunk:
        a[7] = b[7] = 0
    if rem:
        mask = (1 << rem) - 1
        a[full] &= mask
        b[full] &= mask
    if a != b:
        diff = next(i for i in range(len(a)) if a[i] != b[i])
        raise AssertionError(
            f"frame {frame_no}: first mismatch at byte {diff}/{len(a)}: "
            f"ours={a[max(0,diff-2):diff+3].hex()} ref={b[max(0,diff-2):diff+3].hex()}")
