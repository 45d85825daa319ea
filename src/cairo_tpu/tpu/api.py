"""Host-side encoder/decoder wrapping the TPU pipeline + native entropy.

TpuEncoder produces format-conformant evx1 streams in fast mode (FORMAT.md
§7); ConformanceTpuEncoder produces byte-exact reference-encoder streams
via the wavefront schedule. TpuDecoder reconstructs any fast-mode stream
on device; streams with intra-motion blocks (e.g. from the reference
encoder) switch to the native C++ sequential decoder (native/decoder.cpp).
"""

from __future__ import annotations

import struct
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics, native, tables
from ..blocktypes import (BlockTable, COPY_BIT, FRAME_INTER, FRAME_INTRA,
                          INTRA_BIT, MOTION_BIT)
from ..cpuref.api import (FRAME_DESC_SIZE, HEADER_SIZE, _FRAME_FMT,
                          pack_header, parse_header)
from ..cpuref import imaging as cpu_imaging
from ..xmath import clip_range
from . import engine
from . import wire as wire_mod

MB = tables.MACROBLOCK_SIZE


def _align(v):
    return (v + MB - 1) // MB * MB


def _ring_to_arrays(state):
    return {k: np.asarray(jax.device_get(state[k]))
            for k in ("ring_y", "ring_u", "ring_v",
                      "coef_y", "coef_u", "coef_v")}


def _state_from_arrays(arrays):
    """Rebuilds the device pytree; on the XLA anchor path the per-slot
    prediction windows are derived state recomputed from the ring (the
    Pallas path reads the ring directly and carries no windows)."""
    from . import backend
    from . import motion as motion_mod

    state = {k: jnp.asarray(arrays[k]) for k in
             ("ring_y", "ring_u", "ring_v", "coef_y", "coef_u", "coef_v")}
    if backend.use_pallas():
        return state
    wys, wus, wvs = [], [], []
    for s in range(tables.REFERENCE_FRAME_COUNT):
        wy, wu, wv = motion_mod.pred_windows(
            (state["ring_y"][s].astype(jnp.int32),
             state["ring_u"][s].astype(jnp.int32),
             state["ring_v"][s].astype(jnp.int32)))
        wys.append(wy.astype(jnp.int16))
        wus.append(wu.astype(jnp.int16))
        wvs.append(wv.astype(jnp.int16))
    state["win_y"] = jnp.stack(wys)
    state["win_u"] = jnp.stack(wus)
    state["win_v"] = jnp.stack(wvs)
    return state


class TpuEncoder:
    def __init__(self, config=None):
        from ..config import CONFORMANCE
        self.config = config if config is not None else CONFORMANCE
        if not self.config.tpu_supported:
            raise NotImplementedError(
                "this CodecConfig combination runs on the cpuref engine "
                "(cairo_tpu.cpuref.api.Evx1Encoder)")
        self._state = None
        self._last_out = None
        self._last_rgb = None
        self._stale_q = None
        self._stale_var = None
        self.frame_type = FRAME_INTRA
        self.frame_index = 0
        self.quality = self.config.default_quality
        self.width = self.height = 0
        self.last_stats = None

    def set_quality(self, quality: int):
        self.quality = int(clip_range(quality, 1, 31))

    def insert_intra(self):
        self.frame_type = FRAME_INTRA

    def _begin_frame(self, rgb):
        height, width = rgb.shape[:2]
        header = b""
        if self._state is None:
            self.width, self.height = width, height
            self._aw, self._ah = _align(width), _align(height)
            self._state = engine.init_state(self._aw, self._ah)
            # host mirror of the device-persistent coefficient planes
            # (carries stale copy-block DCs for the serializer's DC chains)
            self._coef_y = np.zeros((self._ah, self._aw), np.int16)
            self._coef_u = np.zeros((self._ah // 2, self._aw // 2), np.int16)
            self._coef_v = np.zeros((self._ah // 2, self._aw // 2), np.int16)
            header = pack_header(width, height,
                                 self.config.reference_frame_count)
        if (width, height) != (self.width, self.height):
            raise ValueError("frame dimensions changed mid-stream")
        return header

    def _dispatch(self, rgb, src_wire=None):
        """Launches one frame's device work; returns everything the host
        entropy stage needs later. JAX dispatch is async, so the caller may
        overlap host entropy coding of a previous frame with this one.
        `src_wire` lets encode_many prefetch the host YUV conversion on a
        worker thread (it must have been built with the frame_index/quality
        this frame will carry)."""
        header = self._begin_frame(rgb)
        frame_desc = struct.pack(_FRAME_FMT, self.frame_type,
                                 self.frame_index, self.quality)
        if src_wire is None:
            with jax.profiler.TraceAnnotation("cairo_tpu.rgb_to_yuv5d"):
                src_wire = native.rgb_to_yuv5d(rgb, self._aw, self._ah,
                                               self.frame_index, self.quality)
        src_fmt, src_buf = src_wire
        with jax.profiler.TraceAnnotation("cairo_tpu.encode_step"):
            self._state, out = engine.encode_step(
                src_buf, self._state, aligned_w=self._aw,
                aligned_h=self._ah, frame_w=self.width,
                frame_h=self.height,
                is_inter=self.frame_type == FRAME_INTER,
                n_refs=self.config.reference_frame_count,
                deblock=self.config.enable_deblocking,
                adaptive=self.config.adaptive_quantization,
                src_fmt=src_fmt)
        out["wire"].copy_to_host_async()  # start the D2H as compute finishes
        pending = dict(header=header, frame_desc=frame_desc, out=out,
                       frame_index=self.frame_index,
                       frame_type=self.frame_type, quality=self.quality,
                       t_dispatch=time.perf_counter())
        self._last_rgb = rgb
        if self.config.enable_inter_frames:
            self.frame_type = FRAME_INTER
        rate = self.config.periodic_intra_rate
        if rate and (self.frame_index + 1) % rate == 0:
            self.insert_intra()
        self.frame_index += 1
        return pending

    def _finish(self, pending) -> bytes:
        # one packed head transfer; the COO tail rides a second transfer
        # only when the frame's nonzero count needs it (intra frames), and
        # the full-size device outputs only on COO overflow / debug paths
        buf = np.asarray(pending["out"]["wire"])
        t_dev = time.perf_counter()
        n = (self._aw // MB) * (self._ah // MB)
        out, count, pos, val = wire_mod.unpack_encode_wire(
            buf, n, tail=lambda: pending["out"]["wire_tail"])
        copy = (out["block_type"].astype(np.int32) & COPY_BIT) != 0
        if count <= wire_mod.COO_K:
            wire_mod.apply_coo_np(self._coef_y, self._coef_u, self._coef_v,
                                  copy, count, pos, val)
        else:  # COO overflow: take the exact planes (rare, heavy content)
            np.copyto(self._coef_y, np.asarray(pending["out"]["coef_y"]))
            np.copyto(self._coef_u, np.asarray(pending["out"]["coef_u"]))
            np.copyto(self._coef_v, np.asarray(pending["out"]["coef_v"]))
        cy, cu, cv = self._coef_y, self._coef_u, self._coef_v
        if pending["frame_index"] == 0:
            # one-time wire self-check (guards device bitcast byte order)
            direct = jax.device_get(pending["out"])
            assert np.array_equal(out["block_type"], direct["block_type"])
            assert np.array_equal(out["variance"], direct["variance"])
            assert np.array_equal(cy, direct["coef_y"])
        # copy blocks keep the table's previous q_index/variance (the
        # reference's clear_block_desc quirk, common.cpp:67-73); peek-only —
        # neither field is serialized for copy blocks
        out = dict(out)
        if self._stale_q is not None:
            out["q_index"] = np.where(copy, self._stale_q, out["q_index"])
            out["variance"] = np.where(copy, self._stale_var, out["variance"])
        self._stale_q = out["q_index"]
        self._stale_var = out["variance"]
        self._last_out = out

        bt = BlockTable(
            block_type=out["block_type"],
            prediction_target=out["prediction_target"],
            motion_x=out["motion_x"], motion_y=out["motion_y"],
            sp_pred=out["sp_pred"], sp_amount=out["sp_amount"],
            sp_index=out["sp_index"], q_index=out["q_index"],
            variance=out["variance"])
        with jax.profiler.TraceAnnotation("cairo_tpu.entropy_encode"):
            slice_bytes, _ = native.encode_slice(bt, cy, cu, cv)
        t_ent = time.perf_counter()

        chunk = pending["header"] + pending["frame_desc"] + slice_bytes
        self.last_stats = metrics.frame_stats(
            pending["frame_index"], pending["frame_type"],
            pending["quality"], len(chunk), out["block_type"],
            out["q_index"],
            stage_ms={"device": (t_dev - pending["t_dispatch"]) * 1e3,
                      "entropy": (t_ent - t_dev) * 1e3})
        return chunk

    def encode(self, rgb: np.ndarray) -> bytes:
        return self._finish(self._dispatch(rgb))

    def encode_many(self, frames):
        """Pipelined encode: device computes frame N+1 while a worker
        thread fetches + entropy-codes frame N, and a ONE-FRAME iterator
        lookahead converts frame N+1's RGB->YUV on a second worker so the
        dispatch never waits behind the host conversion (both the fetch
        and the native converter release the GIL). Yields one byte chunk
        per input frame."""
        from concurrent.futures import ThreadPoolExecutor

        it = iter(frames)
        with ThreadPoolExecutor(2) as pool:
            fin = None
            pre = None            # (future, frame_index, quality)
            cur = next(it, None)
            while cur is not None:
                wire = None
                if pre is not None:
                    fut, exp_index, exp_q = pre
                    w = fut.result()
                    # a set_quality between yields invalidates the header
                    if exp_index == self.frame_index and \
                            exp_q == self.quality:
                        wire = w
                    pre = None
                pending = self._dispatch(cur, src_wire=wire)
                cur = next(it, None)
                if cur is not None and self._state is not None:
                    # self.frame_index was advanced by _dispatch: it is
                    # the NEXT frame's index
                    pre = (pool.submit(native.rgb_to_yuv5d, cur, self._aw,
                                       self._ah, self.frame_index,
                                       self.quality),
                           self.frame_index, self.quality)
                if fin is not None:
                    yield fin.result()
                fin = pool.submit(self._finish, pending)
            if fin is not None:
                yield fin.result()

    # -- debug/peek views (evx1enc.cpp:170-305 parity) ---------------------

    def peek_source(self) -> np.ndarray:
        """Input frame round-tripped through YUV 4:2:0."""
        y, u, v = cpu_imaging.rgb_to_yuv420(self._last_rgb)
        return cpu_imaging.yuv420_to_rgb(y, u, v, self.width, self.height)

    def peek_destination(self) -> np.ndarray:
        slot = (self.frame_index - 1) % tables.REFERENCE_FRAME_COUNT
        y = np.asarray(jax.device_get(self._state["ring_y"][slot]))
        u = np.asarray(jax.device_get(self._state["ring_u"][slot]))
        v = np.asarray(jax.device_get(self._state["ring_v"][slot]))
        return cpu_imaging.yuv420_to_rgb(y, u, v, self.width, self.height)

    def _block_map(self, colors: np.ndarray) -> np.ndarray:
        wb = self._aw // MB
        hb = self._ah // MB
        img = colors.reshape(hb, wb, 3).astype(np.uint8)
        img = img.repeat(MB, axis=0).repeat(MB, axis=1)
        return img[:self.height, :self.width]

    def peek_block_table(self) -> np.ndarray:
        bt = self._last_out["block_type"].astype(np.int32)
        colors = np.stack([255 * (bt & 1), 255 * ((bt >> 1) & 1),
                           255 * ((bt >> 2) & 1)], axis=-1)
        return self._block_map(colors)

    def peek_quant_table(self) -> np.ndarray:
        bt = self._last_out["block_type"].astype(np.int32)
        qp = self._last_out["q_index"].astype(np.int32)
        level = (255 - 15 * qp).astype(np.uint8)
        colors = np.stack([level, level, level], axis=-1)
        colors[(bt & COPY_BIT) != 0] = (255, 0, 0)
        return self._block_map(colors)

    def peek_block_variance(self) -> np.ndarray:
        """Grayscale per-MB variance map; copy blocks red (evx1enc.cpp:248)."""
        bt = self._last_out["block_type"].astype(np.int32)
        var = self._last_out["variance"].astype(np.int32)
        level = np.clip(var // 30, 0, 255).astype(np.uint8)
        colors = np.stack([level, level, level], axis=-1)
        colors[(bt & COPY_BIT) != 0] = (255, 0, 0)
        return self._block_map(colors)

    def peek_spmp_table(self) -> np.ndarray:
        """Sub-pel motion map: blue=half, green=quarter (evx1enc.cpp:274)."""
        sp_pred = self._last_out["sp_pred"].astype(bool)
        sp_amount = self._last_out["sp_amount"].astype(bool)
        colors = np.zeros(sp_pred.shape + (3,), np.int32)
        colors[sp_pred & sp_amount] = (0, 255, 0)
        colors[sp_pred & ~sp_amount] = (0, 0, 255)
        return self._block_map(colors)

    # -- checkpoint / resume (cairo_tpu.checkpoint) ------------------------

    def state_dict(self):
        meta = dict(kind="tpu_encoder", width=self.width, height=self.height,
                    frame_index=self.frame_index, frame_type=self.frame_type,
                    quality=self.quality, init=self._state is not None)
        arrays = _ring_to_arrays(self._state) if self._state is not None else {}
        return meta, arrays

    def load_state_dict(self, meta, arrays):
        self.frame_index = meta["frame_index"]
        self.frame_type = meta["frame_type"]
        self.quality = meta["quality"]
        if meta["init"]:
            self.width, self.height = meta["width"], meta["height"]
            self._aw, self._ah = _align(self.width), _align(self.height)
            self._state = _state_from_arrays(arrays)
            self._coef_y = np.array(arrays["coef_y"], np.int16)
            self._coef_u = np.array(arrays["coef_u"], np.int16)
            self._coef_v = np.array(arrays["coef_v"], np.int16)


class ConformanceTpuEncoder:
    """Bit-exact-vs-the-reference-encoder encoding on device (wavefront
    anti-diagonal schedule, tpu.wavefront). Produces the same bytes as the
    cpuref Evx1Encoder / the compiled reference at device speed."""

    def __init__(self):
        from . import wavefront
        self._wavefront = wavefront
        self._state = None
        self.frame_type = FRAME_INTRA
        self.frame_index = 0
        self.quality = tables.DEFAULT_QUALITY
        self.width = self.height = 0
        self.last_stats = None

    def set_quality(self, quality: int):
        self.quality = int(clip_range(quality, 1, 31))

    def insert_intra(self):
        self.frame_type = FRAME_INTRA

    def _dispatch(self, rgb, src_wire=None):
        height, width = rgb.shape[:2]
        header = b""
        if self._state is None:
            self.width, self.height = width, height
            self._aw, self._ah = _align(width), _align(height)
            self._state = self._wavefront.init_state(self._aw, self._ah)
            header = pack_header(width, height)
        if (width, height) != (self.width, self.height):
            raise ValueError("frame dimensions changed mid-stream")
        frame_desc = struct.pack(_FRAME_FMT, self.frame_type,
                                 self.frame_index, self.quality)
        if src_wire is None:
            src_wire = native.rgb_to_yuv5d(rgb, self._aw, self._ah,
                                           self.frame_index, self.quality)
        src_fmt, src_buf = src_wire
        with jax.profiler.TraceAnnotation("cairo_tpu.wavefront_encode"):
            self._state, out = self._wavefront.conformance_encode_step(
                src_buf, self._state, aligned_w=self._aw,
                aligned_h=self._ah, frame_w=self.width,
                frame_h=self.height,
                is_inter=self.frame_type == FRAME_INTER,
                src_fmt=src_fmt)
        for v in out.values():
            v.copy_to_host_async()
        pending = dict(header=header, frame_desc=frame_desc, out=out,
                       frame_index=self.frame_index,
                       frame_type=self.frame_type, quality=self.quality)
        self.frame_type = FRAME_INTER
        if tables.PERIODIC_INTRA_RATE and \
                (self.frame_index + 1) % tables.PERIODIC_INTRA_RATE == 0:
            self.insert_intra()
        self.frame_index += 1
        return pending

    def _finish(self, pending) -> bytes:
        out = jax.device_get(pending["out"])
        bt = BlockTable(
            block_type=out["block_type"],
            prediction_target=out["prediction_target"],
            motion_x=out["motion_x"], motion_y=out["motion_y"],
            sp_pred=out["sp_pred"], sp_amount=out["sp_amount"],
            sp_index=out["sp_index"], q_index=out["q_index"],
            variance=out["variance"])
        slice_bytes, _ = native.encode_slice(
            bt, out["coef_y"], out["coef_u"], out["coef_v"])
        chunk = pending["header"] + pending["frame_desc"] + slice_bytes
        self.last_stats = metrics.frame_stats(
            pending["frame_index"], pending["frame_type"],
            pending["quality"], len(chunk), out["block_type"],
            out["q_index"])
        return chunk

    def encode(self, rgb: np.ndarray) -> bytes:
        return self._finish(self._dispatch(rgb))

    def encode_many(self, frames):
        """Pipelined conformance encode: device wave pass of frame N+1
        overlaps frame N's output fetch + host entropy coding, with a
        one-frame RGB->YUV conversion lookahead (same scheme as
        TpuEncoder.encode_many)."""
        from concurrent.futures import ThreadPoolExecutor

        it = iter(frames)
        with ThreadPoolExecutor(2) as pool:
            fin = None
            pre = None
            cur = next(it, None)
            while cur is not None:
                wire = None
                if pre is not None:
                    fut, exp_index, exp_q = pre
                    w = fut.result()
                    if exp_index == self.frame_index and \
                            exp_q == self.quality:
                        wire = w
                    pre = None
                pending = self._dispatch(cur, src_wire=wire)
                cur = next(it, None)
                if cur is not None and self._state is not None:
                    pre = (pool.submit(native.rgb_to_yuv5d, cur, self._aw,
                                       self._ah, self.frame_index,
                                       self.quality),
                           self.frame_index, self.quality)
                if fin is not None:
                    yield fin.result()
                fin = pool.submit(self._finish, pending)
            if fin is not None:
                yield fin.result()

    # -- checkpoint / resume (cairo_tpu.checkpoint) ------------------------

    def state_dict(self):
        meta = dict(kind="conformance_tpu_encoder", width=self.width,
                    height=self.height, frame_index=self.frame_index,
                    frame_type=self.frame_type, quality=self.quality,
                    init=self._state is not None)
        arrays = {}
        if self._state is not None:
            arrays = {k: np.asarray(jax.device_get(v))
                      for k, v in self._state.items()}
        return meta, arrays

    def load_state_dict(self, meta, arrays):
        self.frame_index = meta["frame_index"]
        self.frame_type = meta["frame_type"]
        self.quality = meta["quality"]
        if meta["init"]:
            self.width, self.height = meta["width"], meta["height"]
            self._aw, self._ah = _align(self.width), _align(self.height)
            self._state = {k: jnp.asarray(v) for k, v in arrays.items()}


class TpuDecoder:
    def __init__(self, config=None):
        from ..config import CONFORMANCE
        self.config = config if config is not None else CONFORMANCE
        if not self.config.tpu_supported:
            raise NotImplementedError(
                "this CodecConfig combination runs on the cpuref engine "
                "(cairo_tpu.cpuref.api.Evx1Decoder)")
        self._state = None
        self._native = None  # sequential C++ decoder once a stream needs it
        # intra-motion (reference-origin) frames decode on device via the
        # wavefront schedule; set False to force the native C++ path
        self.use_wavefront_decode = True
        self.frame_index = 0
        self.width = self.height = 0
        self.last_stats = None

    def _init(self, width, height):
        self.width, self.height = width, height
        self._aw, self._ah = _align(width), _align(height)
        self._state = engine.init_state(self._aw, self._ah)
        n = (self._aw // MB) * (self._ah // MB)
        self._bt = BlockTable.zeros(n)
        self._coef_y = np.zeros((self._ah, self._aw), np.int16)
        self._coef_u = np.zeros((self._ah // 2, self._aw // 2), np.int16)
        self._coef_v = np.zeros((self._ah // 2, self._aw // 2), np.int16)
        # scratch for the 5-bit-delta downlink unpack (the convert lane
        # is a single worker, so one buffer suffices)
        total = self._ah * self._aw + 2 * (self._ah // 2) * (self._aw // 2)
        self._yuv_tmp = np.empty(total, np.int16)
        # the delta wire only wins once the packed savings beat its fixed
        # exception section (~96 KB); tiny frames keep the 8-bit wire
        self._out_fmt = ("yuv5d"
                         if wire_mod.yuv5d_wire_nbytes(self._ah, self._aw)
                         < wire_mod.yuv_wire_nbytes(self._ah, self._aw)
                         else "yuv8")

    def _dispatch_decode(self, chunk: bytes) -> dict:
        """Parses one chunk and launches its device work (async). Returns a
        pending record for _finish_decode. Frames that need the sequential
        fallback are reconstructed synchronously here."""
        offset = 0
        if self._state is None:
            width, height = parse_header(
                chunk[:HEADER_SIZE], self.config.reference_frame_count)
            self._init(width, height)
            offset = HEADER_SIZE
        ftype, index, quality = struct.unpack(
            _FRAME_FMT, chunk[offset:offset + FRAME_DESC_SIZE])
        if index != self.frame_index:
            raise ValueError("out-of-order frame")
        offset += FRAME_DESC_SIZE
        t0 = time.perf_counter()

        native.decode_slice(chunk, offset * 8, self._bt, self._coef_y,
                            self._coef_u, self._coef_v)
        t_ent = time.perf_counter()

        bt_type = self._bt.block_type
        im_mask = ((bt_type & INTRA_BIT).astype(bool)
                   & (bt_type & MOTION_BIT).astype(bool))
        has_intra_motion = bool(np.any(im_mask))
        is_motion_blk = (bt_type & MOTION_BIT).astype(bool)
        inter_motion = is_motion_blk & ~im_mask
        # fast-mode streams keep |mv| <= 16; the reference's inter search
        # reaches +-31 (+1 sub-pel) and takes the wide wavefront gather
        fast_mv = bool(np.all(
            (np.abs(self._bt.motion_x[inter_motion]) <= 16)
            & (np.abs(self._bt.motion_y[inter_motion]) <= 16)))
        wide_mv = fast_mv or bool(np.all(
            (np.abs(self._bt.motion_x[inter_motion]) <= 32)
            & (np.abs(self._bt.motion_y[inter_motion]) <= 32)))
        # intra-motion vectors a conforming encoder can emit (the wave
        # window reach, tpu/wavefront.py); anything wilder goes to the
        # validating native decoder
        im_reach_ok = bool(np.all(
            (self._bt.motion_x[im_mask] >= -32)
            & (self._bt.motion_x[im_mask] <= 32)
            & (self._bt.motion_y[im_mask] >= -48)
            & (self._bt.motion_y[im_mask] <= 16)))
        needs_wave = has_intra_motion or not fast_mv
        self.frame_index += 1
        if self._native is not None or not wide_mv or not im_reach_ok or \
                (needs_wave and not self.use_wavefront_decode):
            return dict(kind="host", rgb=self._decode_sequential(index))

        pos, val, count = native.extract_coo(
            self._bt.block_type, self._aw // MB, self._coef_y, self._coef_u,
            self._coef_v, wire_mod.COO_K)
        # upload capacity bucket: typical inter frames carry a few
        # thousand nonzeros — shipping the small bucket saves ~600 KB of
        # link time per frame; heavy (intra) frames take the full one
        small = min(wire_mod.COO_SMALL, wire_mod.COO_K)
        coo_k = small if count <= small else wire_mod.COO_K
        if count <= wire_mod.COO_K and needs_wave:
            # wavefront device decode (reference-origin streams)
            from . import wavefront
            wb, hb = self._aw // MB, self._ah // MB
            bi, bj, n_active = wavefront.build_compact_schedule(
                bt_type, wb, hb)
            in_wire = np.concatenate([
                np.array([index, n_active], np.int32).view(np.uint8),
                pos[:coo_k].view(np.uint8), val[:coo_k].view(np.uint8),
                wire_mod.pack_table_np(self._bt),
                bi.view(np.uint8).reshape(-1),
                bj.view(np.uint8).reshape(-1)])
            with jax.profiler.TraceAnnotation("cairo_tpu.wavefront_decode"):
                self._state, yuv = wavefront.conformance_decode_step(
                    in_wire, self._state,
                    aligned_w=self._aw, aligned_h=self._ah,
                    frame_w=self.width, frame_h=self.height,
                    deblock=self.config.enable_deblocking, coo_k=coo_k,
                    out_fmt=self._out_fmt)
            yuv.copy_to_host_async()
            return dict(kind="wire", yuv=yuv, index=index,
                        ring=self._ring_slot_refs(index),
                        t0=t0, t_ent=t_ent, t_dispatch=time.perf_counter())
        if count <= wire_mod.COO_K:
            in_wire = np.concatenate([
                np.array([index, 0], np.int32).view(np.uint8),
                pos[:coo_k].view(np.uint8), val[:coo_k].view(np.uint8),
                wire_mod.pack_table_np(self._bt)])
            with jax.profiler.TraceAnnotation("cairo_tpu.decode_step"):
                self._state, yuv = engine.decode_step_coo(
                    in_wire, self._state,
                    aligned_w=self._aw, aligned_h=self._ah,
                    frame_w=self.width, frame_h=self.height,
                    deblock=self.config.enable_deblocking, coo_k=coo_k,
                    out_fmt=self._out_fmt)
            yuv.copy_to_host_async()
            return dict(kind="wire", yuv=yuv, index=index,
                        ring=self._ring_slot_refs(index),
                        t0=t0, t_ent=t_ent, t_dispatch=time.perf_counter())
        if needs_wave:
            # COO overflow on a wave-path frame: ship the DENSE coefficient
            # planes and decode on the device wave path anyway — every
            # conformant stream (down to q=1 intra refreshes) stays at
            # device speed, matching decode.cpp:146-170's universality.
            # The plane COPIES guard against decode_many's next-frame
            # parser mutating the persistent buffers mid-read.
            from . import wavefront
            wb, hb = self._aw // MB, self._ah // MB
            bi, bj, n_active = wavefront.build_compact_schedule(
                bt_type, wb, hb)
            in_wire = np.concatenate([
                np.array([index, n_active], np.int32).view(np.uint8),
                wire_mod.pack_table_np(self._bt),
                bi.view(np.uint8).reshape(-1),
                bj.view(np.uint8).reshape(-1)])
            with jax.profiler.TraceAnnotation("cairo_tpu.wavefront_dense"):
                self._state, yuv = wavefront.conformance_decode_step_dense(
                    in_wire, self._coef_y.copy(), self._coef_u.copy(),
                    self._coef_v.copy(), self._state,
                    aligned_w=self._aw, aligned_h=self._ah,
                    frame_w=self.width, frame_h=self.height,
                    deblock=self.config.enable_deblocking,
                    out_fmt=self._out_fmt)
            yuv.copy_to_host_async()
            return dict(kind="wire", yuv=yuv, index=index,
                        ring=self._ring_slot_refs(index),
                        t0=t0, t_ent=t_ent, t_dispatch=time.perf_counter())
        # dense fallback (residual volume beyond COO capacity). The
        # arguments are COPIES: the CPU backend zero-copy aliases numpy
        # inputs into the jit, and under decode_many the NEXT frame's
        # slice parser mutates these persistent buffers in place while
        # this (async) computation may still be reading them.
        table = dict(
            block_type=self._bt.block_type.copy(),
            prediction_target=self._bt.prediction_target.copy(),
            motion_x=self._bt.motion_x.copy(),
            motion_y=self._bt.motion_y.copy(),
            sp_pred=self._bt.sp_pred.copy(),
            sp_amount=self._bt.sp_amount.copy(),
            sp_index=self._bt.sp_index.copy(),
            q_index=self._bt.q_index.copy())
        coef = dict(coef_y=self._coef_y.copy(), coef_u=self._coef_u.copy(),
                    coef_v=self._coef_v.copy())
        self._state, rgb = engine.decode_step(
            table, coef, self._state, index, width=self.width,
            height=self.height, aligned_w=self._aw, aligned_h=self._ah,
            deblock=self.config.enable_deblocking)
        return dict(kind="dense", rgb=rgb)

    def _ring_slot_refs(self, index):
        """Materialized slices of the just-written ring slot, captured at
        dispatch time: the next frame's decode step DONATES the state
        buffers, so a worker thread finishing this frame (decode_many)
        must never read live self._state — only these separate arrays."""
        slot = index % tables.REFERENCE_FRAME_COUNT
        return tuple(self._state[k][slot]
                     for k in ("ring_y", "ring_u", "ring_v"))

    def _fetch_decode(self, pending):
        """Stage 1 of finish: the (link-bound) device fetch."""
        if pending["kind"] == "wire":
            pending["buf"] = np.asarray(pending["yuv"])
            pending["t_fetch1"] = time.perf_counter()
        return pending

    def _finish_decode(self, pending) -> np.ndarray:
        if pending["kind"] == "host":
            return pending["rgb"]
        if pending["kind"] == "dense":
            return np.asarray(pending["rgb"])
        if "buf" in pending:
            buf = pending["buf"]
            t_fetch1 = pending["t_fetch1"]
        else:
            buf = np.asarray(pending["yuv"])
            t_fetch1 = time.perf_counter()
        with jax.profiler.TraceAnnotation("cairo_tpu.yuv_to_rgb"):
            if self._out_fmt == "yuv5d":
                rgb, exc_count = native.yuv5d_wire_to_rgb(
                    buf, self._aw, self._ah, self.width, self.height,
                    wire_mod.DEXC_K, self._yuv_tmp)
                exc_cap = wire_mod.DEXC_K
            else:
                rgb, exc_count = native.yuv_wire_to_rgb(
                    buf, self._aw, self._ah, self.width, self.height,
                    wire_mod.EXC_K)
                exc_cap = wire_mod.EXC_K
        self.last_stats = dict(stage_ms=dict(
            entropy=(pending["t_ent"] - pending["t0"]) * 1e3,
            device_and_fetch=(t_fetch1 - pending["t_dispatch"]) * 1e3,
            convert=(time.perf_counter() - t_fetch1) * 1e3))
        if exc_count > exc_cap:
            # wire was lossy: refetch the exact recon from the ring-slot
            # refs captured at dispatch (never live state: decode_many's
            # worker would race the next frame's donation otherwise)
            y, u, v = (np.asarray(p) for p in pending["ring"])
            rgb = cpu_imaging.yuv420_to_rgb(y, u, v, self.width, self.height)
        return rgb

    def decode(self, chunk: bytes) -> np.ndarray:
        return self._finish_decode(self._dispatch_decode(chunk))

    def decode_many(self, chunks):
        """Pipelined decode across three lanes: the device reconstructs
        frame N+1 while one worker drains frame N's (link-bound) YUV fetch
        and a second converts frame N-1 to RGB — the fetch and the native
        converter both release the GIL, so steady state costs
        max(device+upload, fetch, convert) per frame. Yields one RGB
        frame per chunk."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(1) as fetch_pool, \
                ThreadPoolExecutor(1) as conv_pool:
            fut = None
            for chunk in chunks:
                nxt = self._dispatch_decode(chunk)
                if fut is not None:
                    yield fut.result()
                ffut = fetch_pool.submit(self._fetch_decode, nxt)
                fut = conv_pool.submit(
                    lambda f=ffut: self._finish_decode(f.result()))
            if fut is not None:
                yield fut.result()

    # -- checkpoint / resume (cairo_tpu.checkpoint) ------------------------

    def state_dict(self):
        meta = dict(kind="tpu_decoder", width=self.width, height=self.height,
                    frame_index=self.frame_index,
                    init=self._state is not None)
        arrays = {}
        if self._state is not None:
            arrays = _ring_to_arrays(self._state)
            if self._native is not None:
                # host-side state is authoritative in sequential mode
                rings = [self._native.get_ring(s)
                         for s in range(tables.REFERENCE_FRAME_COUNT)]
                arrays["ring_y"] = np.stack([r[0] for r in rings])
                arrays["ring_u"] = np.stack([r[1] for r in rings])
                arrays["ring_v"] = np.stack([r[2] for r in rings])
                arrays["coef_y"] = self._coef_y.copy()
                arrays["coef_u"] = self._coef_u.copy()
                arrays["coef_v"] = self._coef_v.copy()
            arrays.update(
                host_coef_y=self._coef_y, host_coef_u=self._coef_u,
                host_coef_v=self._coef_v,
                **{f"bt_{k}": getattr(self._bt, k)
                   for k in ("block_type", "prediction_target", "motion_x",
                             "motion_y", "sp_pred", "sp_amount", "sp_index",
                             "q_index", "variance")})
        return meta, arrays

    def load_state_dict(self, meta, arrays):
        self.frame_index = meta["frame_index"]
        self._native = None  # resume on the device path until needed again
        if meta["init"]:
            self._init(meta["width"], meta["height"])
            self._state = _state_from_arrays(arrays)
            self._coef_y[:] = arrays["host_coef_y"]
            self._coef_u[:] = arrays["host_coef_u"]
            self._coef_v[:] = arrays["host_coef_v"]
            for k in ("block_type", "prediction_target", "motion_x",
                      "motion_y", "sp_pred", "sp_amount", "sp_index",
                      "q_index", "variance"):
                getattr(self._bt, k)[:] = arrays[f"bt_{k}"]

    def _decode_sequential(self, index: int) -> np.ndarray:
        """Native C++ fallback for streams the parallel path cannot batch
        (intra-motion blocks read the current frame's partially-decoded
        pixels in raster order — reference-encoder streams). On first use
        the ring state moves host-side and the decoder STAYS sequential:
        the native path decodes any conformant stream, and ping-ponging
        full ring syncs over the device link would cost more than it
        saves."""
        if self._native is None:
            if not self.config.is_conformance:
                raise NotImplementedError(
                    "sequential fallback (intra-motion streams) supports "
                    "the conformance config only")
            self._native = native.NativeDecoder(self._aw, self._ah)
            ring_y = np.asarray(jax.device_get(self._state["ring_y"]))
            ring_u = np.asarray(jax.device_get(self._state["ring_u"]))
            ring_v = np.asarray(jax.device_get(self._state["ring_v"]))
            for s in range(tables.REFERENCE_FRAME_COUNT):
                self._native.set_ring(s, ring_y[s], ring_u[s], ring_v[s])
        with jax.profiler.TraceAnnotation("cairo_tpu.native_decode"):
            return self._native.decode_frame(
                self._bt, self._coef_y, self._coef_u, self._coef_v,
                index, self.width, self.height)
