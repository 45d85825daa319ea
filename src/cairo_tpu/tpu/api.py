"""Host-side encoder/decoder wrapping the TPU pipeline + native entropy.

TpuEncoder produces format-conformant evx1 streams in fast mode (FORMAT.md
§7). TpuDecoder reconstructs any fast-mode stream on device; streams that
contain intra-motion blocks (e.g. from the reference encoder) fall back to
the sequential cpuref reconstruction for that frame.
"""

from __future__ import annotations

import struct

import jax
import numpy as np

from .. import native, tables
from ..blocktypes import (BlockTable, FRAME_INTER, FRAME_INTRA, INTRA_BIT,
                          MOTION_BIT)
from ..cpuref.api import (FRAME_DESC_SIZE, HEADER_SIZE, _FRAME_FMT,
                          pack_header, parse_header)
from ..xmath import clip_range
from . import engine

MB = tables.MACROBLOCK_SIZE


def _align(v):
    return (v + MB - 1) // MB * MB


class TpuEncoder:
    def __init__(self):
        self._state = None
        self.frame_type = FRAME_INTRA
        self.frame_index = 0
        self.quality = tables.DEFAULT_QUALITY
        self.width = self.height = 0

    def set_quality(self, quality: int):
        self.quality = int(clip_range(quality, 1, 31))

    def insert_intra(self):
        self.frame_type = FRAME_INTRA

    def encode(self, rgb: np.ndarray) -> bytes:
        height, width = rgb.shape[:2]
        header = b""
        if self._state is None:
            self.width, self.height = width, height
            self._aw, self._ah = _align(width), _align(height)
            self._state = engine.init_state(self._aw, self._ah)
            header = pack_header(width, height)
        if (width, height) != (self.width, self.height):
            raise ValueError("frame dimensions changed mid-stream")

        frame_desc = struct.pack(_FRAME_FMT, self.frame_type,
                                 self.frame_index, self.quality)

        self._state, out = engine.encode_step(
            rgb, self._state, self.frame_index, self.quality,
            width=width, height=height, aligned_w=self._aw,
            aligned_h=self._ah, is_inter=self.frame_type == FRAME_INTER)
        out = jax.device_get(out)

        bt = BlockTable(
            block_type=out["block_type"],
            prediction_target=out["prediction_target"],
            motion_x=out["motion_x"], motion_y=out["motion_y"],
            sp_pred=out["sp_pred"], sp_amount=out["sp_amount"],
            sp_index=out["sp_index"], q_index=out["q_index"],
            variance=np.zeros_like(out["motion_x"]))
        slice_bytes, _ = native.encode_slice(
            bt, out["coef_y"], out["coef_u"], out["coef_v"])

        self.frame_type = FRAME_INTER
        if tables.PERIODIC_INTRA_RATE and \
                (self.frame_index + 1) % tables.PERIODIC_INTRA_RATE == 0:
            self.insert_intra()
        self.frame_index += 1
        return header + frame_desc + slice_bytes


class TpuDecoder:
    def __init__(self):
        self._state = None
        self._cpu_fallback = None
        self.frame_index = 0
        self.width = self.height = 0

    def _init(self, width, height):
        self.width, self.height = width, height
        self._aw, self._ah = _align(width), _align(height)
        self._state = engine.init_state(self._aw, self._ah)
        n = (self._aw // MB) * (self._ah // MB)
        self._bt = BlockTable.zeros(n)
        self._coef_y = np.zeros((self._ah, self._aw), np.int16)
        self._coef_u = np.zeros((self._ah // 2, self._aw // 2), np.int16)
        self._coef_v = np.zeros((self._ah // 2, self._aw // 2), np.int16)

    def decode(self, chunk: bytes) -> np.ndarray:
        offset = 0
        if self._state is None:
            width, height = parse_header(chunk[:HEADER_SIZE])
            self._init(width, height)
            offset = HEADER_SIZE
        ftype, index, quality = struct.unpack(
            _FRAME_FMT, chunk[offset:offset + FRAME_DESC_SIZE])
        if index != self.frame_index:
            raise ValueError("out-of-order frame")
        offset += FRAME_DESC_SIZE

        native.decode_slice(chunk, offset * 8, self._bt, self._coef_y,
                            self._coef_u, self._coef_v)

        has_intra_motion = bool(np.any(
            (self._bt.block_type & INTRA_BIT).astype(bool)
            & (self._bt.block_type & MOTION_BIT).astype(bool)))
        is_motion_blk = (self._bt.block_type & MOTION_BIT).astype(bool)
        mv_in_range = bool(np.all(
            (np.abs(self._bt.motion_x[is_motion_blk]) <= 16)
            & (np.abs(self._bt.motion_y[is_motion_blk]) <= 16)))
        if has_intra_motion or not mv_in_range:
            rgb = self._decode_sequential(index)
        else:
            table = dict(
                block_type=self._bt.block_type,
                prediction_target=self._bt.prediction_target,
                motion_x=self._bt.motion_x, motion_y=self._bt.motion_y,
                sp_pred=self._bt.sp_pred, sp_amount=self._bt.sp_amount,
                sp_index=self._bt.sp_index, q_index=self._bt.q_index)
            coef = dict(coef_y=self._coef_y, coef_u=self._coef_u,
                        coef_v=self._coef_v)
            self._state, rgb = engine.decode_step(
                table, coef, self._state, index, width=self.width,
                height=self.height, aligned_w=self._aw, aligned_h=self._ah)
            rgb = np.asarray(jax.device_get(rgb))
        self.frame_index += 1
        return rgb

    def _decode_sequential(self, index: int) -> np.ndarray:
        """cpuref fallback for frames with intra-motion blocks: reconstruct
        sequentially on host, then sync the device ring."""
        import jax.numpy as jnp

        from ..cpuref import engine as cpu_engine

        ring_y = np.asarray(jax.device_get(self._state["ring_y"]))
        ring_u = np.asarray(jax.device_get(self._state["ring_u"]))
        ring_v = np.asarray(jax.device_get(self._state["ring_v"]))

        ctx = cpu_engine.CodecContext(self.width, self.height)
        for s in range(tables.REFERENCE_FRAME_COUNT):
            ctx.recon[s].y[:] = ring_y[s]
            ctx.recon[s].u[:] = ring_u[s]
            ctx.recon[s].v[:] = ring_v[s]
        ctx.block_table = self._bt
        ctx.input.y[:] = self._coef_y
        ctx.input.u[:] = self._coef_u
        ctx.input.v[:] = self._coef_v
        cpu_engine.decode_slice(ctx, index)
        cpu_engine.deblock_recon(ctx, index)
        slot = ctx.ring_slot(index, 0)
        rec = (jnp.asarray(ctx.recon[slot].y), jnp.asarray(ctx.recon[slot].u),
               jnp.asarray(ctx.recon[slot].v))
        from . import motion as motion_mod
        nwy, nwu, nwv = motion_mod.pred_windows(rec)
        self._state = dict(
            self._state,
            ring_y=self._state["ring_y"].at[slot].set(rec[0]),
            ring_u=self._state["ring_u"].at[slot].set(rec[1]),
            ring_v=self._state["ring_v"].at[slot].set(rec[2]),
            win_y=self._state["win_y"].at[slot].set(nwy.astype(jnp.int16)),
            win_u=self._state["win_u"].at[slot].set(nwu.astype(jnp.int16)),
            win_v=self._state["win_v"].at[slot].set(nwv.astype(jnp.int16)),
        )
        return cpu_engine.recon_to_rgb(ctx, index, self.width, self.height)
