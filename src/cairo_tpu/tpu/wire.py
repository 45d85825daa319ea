"""Compact device<->host transfer wire.

The host<->device link (axon tunnel / PCIe) is the throughput bottleneck of
the 1080p pipeline: ~45 MB/s with ~5-15 ms per-transfer latency (measured,
bench/bench_link.py), against a ~116 ms/frame budget. Every per-frame
exchange is therefore packed into ONE uint8 buffer per direction (frame
header included — no per-frame scalar transfers), with int16 data squeezed
to the fewest bits that stay exact:

- encoder source wire: 8-bit YUV (y-16 fits a byte; the +16 shift is
  re-applied on the static in-frame mask), converted host-side in native
  code (native.rgb_to_yuv8).
- encoder output wire: block table (SoA, fixed offsets) + the nonzero
  residuals of non-copy macroblocks as a COO list — a frame's nonzeros
  track the bitrate (~tens of KB) vs 6.3 MB of dense int16 planes. On
  capacity overflow the host refetches the exact planes (separate,
  normally-untouched jit outputs cost nothing to keep). Both ends carry
  persistent coefficient planes so copy blocks keep their stale content.
- decoder input: the parsed block table packed the same way + the COO
  list the native parser extracts.
- decoder output wire: the reconstruction as 8-bit YUV (Y stored minus
  its +16 luma offset so the legal [16, 271] range fits a byte; chroma
  as-is) plus an exception list for values outside the window —
  DCT/deblock ringing overshoots by a handful of pixels per frame even
  on noise content (measured < ~2k at 1080p q31 vs the 4096 capacity;
  overflow falls back to an exact ring fetch). The host converts
  YUV->RGB in native code.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Y_SHIFT = 16          # yuv wire: Y stored as value-16 (legal [16, 271])
EXC_K = 4096          # yuv wire exception capacity (values off the window)
COO_K = 1 << 17       # residual COO capacity (pow-2 keeps 1 compile)
# Typical INTER frames at 1080p q16 carry ~5-13k nonzeros; intra frames
# ~120k (measured). The encode wire ships a COO_SMALL head always and a
# tail buffer only when the count needs it, and the decode upload picks
# the matching capacity bucket — the link is the pipeline bottleneck and
# a fixed 131072-entry wire wastes ~600 KB/frame on inter frames.
COO_SMALL = 1 << 14


def _compact(vals, mask, k, val_dtype=jnp.int16, split=None):
    """Stream compaction: (positions, values, count) of the first k True
    elements of a flat mask. A direct scatter of n updates into k slots
    lowers to a global sort plus n random gathers (~35 ms at n=3M on
    v5e); instead sort each 512-chunk locally (vectorized along the minor
    axis) and build the k outputs with gathers — 24x fewer random
    accesses. With `split`, slots [split:k] are only gathered when the
    true count exceeds `split` (lax.cond), so head-only frames skip the
    tail's gather cost entirely."""
    chunk = 512
    n = mask.shape[0]
    npad = -n % chunk
    m = jnp.pad(mask, (0, npad)).reshape(-1, chunk)
    counts = m.sum(axis=1, dtype=jnp.int32)
    base = jnp.cumsum(counts) - counts
    idx2 = jnp.arange(n + npad, dtype=jnp.int32).reshape(-1, chunk)
    val2 = jnp.pad(vals, (0, npad)).reshape(-1, chunk)
    key = (~m).astype(jnp.int32)
    _, idx_s, val_s = jax.lax.sort((key, idx2, val2), dimension=1,
                                   is_stable=True, num_keys=1)
    total = counts.sum()
    j = jnp.arange(k, dtype=jnp.int32)
    # c[j] = searchsorted(base, j, 'right') - 1, computed as a histogram +
    # cumsum instead: 131k binary searches lower to ~12 ms of serial-gather
    # work on TPU, the scatter-add of ~6k chunk bases is ~0.1 ms. Chunks
    # whose base >= k can never supply an output slot j < k (mode=drop).
    hist = jnp.zeros(k, jnp.int32).at[base].add(1, mode="drop")
    c = jnp.cumsum(hist) - 1
    local = j - base[c]
    ok = j < total
    # flat = c*chunk + local is strictly increasing in j (a +1 jump of c
    # adds `chunk` while local drops by at most chunk-1), so the gather can
    # carry the sorted-indices hint; the j >= total tail clips in-bounds
    # and is masked by `ok` either way.
    flat = jnp.minimum(c * chunk + local, idx_s.size - 1)
    idx_f = idx_s.reshape(-1)
    val_f = val_s.reshape(-1)

    def gather_range(lo, hi):
        p = jnp.where(ok[lo:hi],
                      jnp.take(idx_f, flat[lo:hi], indices_are_sorted=True),
                      0)
        v = jnp.where(ok[lo:hi],
                      jnp.take(val_f, flat[lo:hi], indices_are_sorted=True),
                      0).astype(val_dtype)
        return p, v

    if split is None or split >= k:
        pos, val = gather_range(0, k)
        return pos, val, total
    # Two-tier gather: the head (<= split slots) is always materialized;
    # the tail gather — 7/8 of the random-access work at the default
    # capacities — only runs when the frame actually overflows the head
    # (intra/scene-change frames; typical inter frames carry ~5-13k
    # nonzeros vs the 16k head). lax.cond executes one branch at runtime,
    # so the common path skips ~6 ms of XLA gather time at 1080p.
    head_pos, head_val = gather_range(0, split)
    tail_pos, tail_val = jax.lax.cond(
        total > split,
        lambda: gather_range(split, k),
        lambda: (jnp.zeros(k - split, jnp.int32),
                 jnp.zeros(k - split, val_dtype)))
    return (jnp.concatenate([head_pos, tail_pos]),
            jnp.concatenate([head_val, tail_val]), total)


def _u8(x16):
    """int16/int32 array -> flat uint8 little-endian byte stream."""
    return jax.lax.bitcast_convert_type(x16, jnp.uint8).reshape(-1)


# --------------------------------------------------------------------------
# encoder output wire: block table + residual COO

def pack_encode_wire(table, coef_y, coef_u, coef_v, copy_mb):
    """Device side. table: dict of (N,) arrays; coef planes int16-valued;
    copy_mb: (N,) bool. The wire carries the table plus the nonzero
    residuals of non-copy macroblocks as a COO list (copy blocks are never
    serialized, and their stale plane content persists on both ends).
    Returns one uint8 wire (layout mirrored by unpack_encode_wire)."""
    parts = [
        _u8(table["motion_x"].astype(jnp.int16)),
        _u8(table["motion_y"].astype(jnp.int16)),
        _u8(table["variance"].astype(jnp.int16)),
        table["block_type"].astype(jnp.uint8),
        table["prediction_target"].astype(jnp.uint8),
        table["sp_pred"].astype(jnp.uint8),
        table["sp_amount"].astype(jnp.uint8),
        table["sp_index"].astype(jnp.uint8),
        table["q_index"].astype(jnp.uint8),
    ]
    ah, aw = coef_y.shape
    hb, wb = ah // 16, aw // 16
    copy_map = copy_mb.reshape(hb, wb)
    ymask = jnp.repeat(jnp.repeat(copy_map, 16, axis=0), 16, axis=1)
    cmask = ymask[::2, ::2]
    flat = jnp.concatenate([
        jnp.where(ymask, 0, coef_y.astype(jnp.int32)).reshape(-1),
        jnp.where(cmask, 0, coef_u.astype(jnp.int32)).reshape(-1),
        jnp.where(cmask, 0, coef_v.astype(jnp.int32)).reshape(-1)])
    pos, val, count = _compact(flat, flat != 0, COO_K, split=COO_SMALL)
    parts += [_u8(count[None]), _u8(pos[:COO_SMALL]), _u8(val[:COO_SMALL])]
    tail = jnp.concatenate([_u8(pos[COO_SMALL:]), _u8(val[COO_SMALL:])])
    return jnp.concatenate(parts), tail


def unpack_encode_wire(buf, n, tail=None):
    """Host side (numpy). Returns (table dict, count, coo_pos, coo_val).
    `buf` is the head wire (table + count + the first COO_SMALL entries);
    `tail` is a callable returning the tail buffer bytes, invoked ONLY
    when count exceeds the head capacity (so the extra transfer is paid
    exactly on the frames that need it). The COO list is exact iff
    count <= COO_K."""
    buf = np.asarray(buf)
    o = 0

    def take(count, dtype):
        nonlocal o
        nbytes = count * np.dtype(dtype).itemsize
        out = buf[o:o + nbytes].view(dtype)
        o += nbytes
        return out

    table = dict(
        motion_x=take(n, np.int16), motion_y=take(n, np.int16),
        variance=take(n, np.int16), block_type=take(n, np.uint8),
        prediction_target=take(n, np.uint8),
        sp_pred=take(n, np.uint8).astype(bool),
        sp_amount=take(n, np.uint8).astype(bool),
        sp_index=take(n, np.uint8), q_index=take(n, np.uint8))
    count = int(take(1, np.int32)[0])
    small = min(COO_SMALL, COO_K)
    pos = take(small, np.int32)
    val = take(small, np.int16)
    if count > small and count <= COO_K and tail is not None:
        rest = np.asarray(tail())
        nrest = COO_K - small
        pos = np.concatenate([pos, rest[:4 * nrest].view(np.int32)])
        val = np.concatenate([val, rest[4 * nrest:].view(np.int16)])
    return table, count, pos, val


def apply_coo_np(coef_y, coef_u, coef_v, copy_mb, count, pos, val):
    """Host side: updates persistent int16 planes in place — zeroes all
    non-copy macroblocks, then scatters the COO values (exact mirror of the
    device-side coefficient persistence)."""
    ah, aw = coef_y.shape
    hb, wb = ah // 16, aw // 16
    copy_map = copy_mb.reshape(hb, wb)
    ymask = np.repeat(np.repeat(copy_map, 16, axis=0), 16, axis=1)
    cmask = ymask[::2, ::2]
    coef_y *= ymask
    coef_u *= cmask
    coef_v *= cmask
    k = min(count, COO_K)
    pos, val = pos[:k], val[:k]
    ys, cs = ah * aw, (ah // 2) * (aw // 2)
    sel = pos < ys
    coef_y.reshape(-1)[pos[sel]] = val[sel]
    sel = (pos >= ys) & (pos < ys + cs)
    coef_u.reshape(-1)[pos[sel] - ys] = val[sel]
    sel = pos >= ys + cs
    coef_v.reshape(-1)[pos[sel] - ys - cs] = val[sel]


# --------------------------------------------------------------------------
# 8-bit YUV source wire (host rgb->yuv conversion, device upload).
# Legal source values fit 8 bits exactly: the wire stores y-16 for
# in-frame cells (and 0 for the static MB-alignment pad, which the device
# knows by position), chroma as-is.

def yuv8_nbytes(ah, aw):
    return ah * aw + 2 * (ah // 2) * (aw // 2)


def pack_yuv8_np(y, u, v, frame_w, frame_h):
    """Host-side numpy reference for the source wire (production uses the
    native C++ converter evxn_rgb_to_yuv8)."""
    ah, aw = y.shape
    mask = (np.arange(ah)[:, None] < frame_h) & (np.arange(aw)[None, :]
                                                 < frame_w)
    y8 = np.where(mask, y.astype(np.int32) - 16, 0).astype(np.uint8)
    return np.concatenate([y8.reshape(-1),
                           u.reshape(-1).astype(np.uint8),
                           v.reshape(-1).astype(np.uint8)])


def unpack_yuv8(buf, ah, aw, frame_w, frame_h):
    """Device side: source wire -> (y, u, v) int32 planes. Re-applies the
    +16 luma shift on in-frame cells (static mask)."""
    ys, cs = ah * aw, (ah // 2) * (aw // 2)
    y = buf[:ys].astype(jnp.int32).reshape(ah, aw)
    mask = ((jnp.arange(ah)[:, None] < frame_h)
            & (jnp.arange(aw)[None, :] < frame_w))
    y = jnp.where(mask, y + 16, 0)
    u = buf[ys:ys + cs].astype(jnp.int32).reshape(ah // 2, aw // 2)
    v = buf[ys + cs:ys + 2 * cs].astype(jnp.int32).reshape(ah // 2, aw // 2)
    return y, u, v


# 5-bit-delta uplink wire (native.rgb_to_yuv5d / evxn_pack_yuv5d): the
# source upload is the encode leg's link floor (~3.1 MB of 8-bit YUV at
# 1080p on a ~45 MB/s tunnel), and horizontal neighbour deltas of game
# content fit 5 bits for >99.8% of pixels (measured) — the packed wire is
# 5/8 the size plus a fixed exception section, and stays bit-exact for
# any content because clipped deltas ride the exception list (the host
# falls back to the 8-bit wire beyond UP_EXC_K exceptions).
UP_EXC_K = 8192


def yuv5d_nbytes(ah, aw):
    total = ah * aw + 2 * (ah // 2) * (aw // 2)
    return 6 * UP_EXC_K + total * 5 // 8


def unpack_yuv5d(buf, ah, aw, frame_w, frame_h):
    """Device side: 5-bit-delta source wire -> (y, u, v) int32 planes
    (same output contract as unpack_yuv8).

    Layout: [UP_EXC_K int32 exc_pos | UP_EXC_K int16 exc_val | packed
    5-bit fields]. Field g holds clip(delta, -16, 15) at stream bits
    [5g, 5g+5); exceptions carry (flat position, true delta) with
    out-of-range sentinel padding (scatter mode="drop" ignores them).
    Reconstruction: scatter-set true deltas, per-plane col-0 vertical
    cumsum, then a horizontal cumsum."""
    ys, cs = ah * aw, (ah // 2) * (aw // 2)
    total = ys + 2 * cs
    exc_pos = jax.lax.bitcast_convert_type(
        buf[:4 * UP_EXC_K].reshape(UP_EXC_K, 4), jnp.int32)
    exc_val = jax.lax.bitcast_convert_type(
        buf[4 * UP_EXC_K:6 * UP_EXC_K].reshape(UP_EXC_K, 2), jnp.int16)
    words = jax.lax.bitcast_convert_type(
        buf[6 * UP_EXC_K:].reshape(-1, 5, 4), jnp.uint32)  # (G, 5)
    # 32 fields per 5-word group; each field spans <= 2 words
    fields = []
    for i in range(32):
        b = 5 * i
        k, s = b >> 5, b & 31
        raw = words[:, k] >> np.uint32(s)
        if s > 27:
            raw = raw | (words[:, k + 1] << np.uint32(32 - s))
        fields.append((raw & np.uint32(31)).astype(jnp.int32))
    d = jnp.stack(fields, axis=1).reshape(-1)
    d = (d ^ 16) - 16  # sign-extend 5-bit
    d = d.at[exc_pos].set(exc_val.astype(jnp.int32), mode="drop")

    def plane(dflat, h, w):
        g = dflat.reshape(h, w)
        c0 = jnp.cumsum(g[:, :1], axis=0)  # col 0 chains vertically
        return jnp.cumsum(jnp.concatenate([c0, g[:, 1:]], axis=1), axis=1)

    y = plane(d[:ys], ah, aw)
    mask = ((jnp.arange(ah)[:, None] < frame_h)
            & (jnp.arange(aw)[None, :] < frame_w))
    y = jnp.where(mask, y + 16, 0)
    u = plane(d[ys:ys + cs], ah // 2, aw // 2)
    v = plane(d[ys + cs:], ah // 2, aw // 2)
    return y, u, v


# --------------------------------------------------------------------------
# decoder input: packed block table + residual COO

def pack_table_np(bt):
    """Host side: BlockTable -> one uint8 buffer (10N bytes)."""
    return np.concatenate([
        np.ascontiguousarray(bt.motion_x, np.int16).view(np.uint8),
        np.ascontiguousarray(bt.motion_y, np.int16).view(np.uint8),
        np.ascontiguousarray(bt.block_type, np.uint8),
        np.ascontiguousarray(bt.prediction_target, np.uint8),
        bt.sp_pred.astype(np.uint8), bt.sp_amount.astype(np.uint8),
        np.ascontiguousarray(bt.sp_index, np.uint8),
        np.ascontiguousarray(bt.q_index, np.uint8)])


def unpack_table_wire(buf, n):
    """Device side: uint8 (10N,) -> dict of (N,) arrays."""
    def i16(off):
        return jax.lax.bitcast_convert_type(
            buf[off:off + 2 * n].reshape(n, 2), jnp.int16)

    return dict(
        motion_x=i16(0), motion_y=i16(2 * n),
        block_type=buf[4 * n:5 * n],
        prediction_target=buf[5 * n:6 * n],
        sp_pred=buf[6 * n:7 * n].astype(bool),
        sp_amount=buf[7 * n:8 * n].astype(bool),
        sp_index=buf[8 * n:9 * n],
        q_index=buf[9 * n:10 * n])


# --------------------------------------------------------------------------
# decoder output wire: 8-bit YUV + out-of-range count

def pack_yuv_wire(y, u, v, frame_w, frame_h):
    """Device side. y/u/v: int32 reconstruction planes (aligned dims).
    Returns one uint8 wire: the planes as bytes (Y minus its +16 offset,
    chroma as-is) + an exception list carrying the exact value of every
    IN-FRAME pixel outside the byte window (the MB-alignment pad region
    reconstructs near 0 — below the Y window — but is never read by the
    converter, so it must not eat exception capacity). count > EXC_K
    makes the caller refetch the exact ring planes instead."""
    ah, aw = y.shape
    yin = ((jnp.arange(ah)[:, None] < frame_h)
           & (jnp.arange(aw)[None, :] < frame_w))
    ch, cw = u.shape
    cin = ((jnp.arange(ch)[:, None] < (frame_h + 1) // 2)
           & (jnp.arange(cw)[None, :] < (frame_w + 1) // 2))
    cat = jnp.concatenate([p.reshape(-1) for p in (y, u, v)])
    in_frame = jnp.concatenate([yin.reshape(-1), cin.reshape(-1),
                                cin.reshape(-1)])
    ys = y.size
    shifted = cat - jnp.where(jnp.arange(cat.shape[0]) < ys, Y_SHIFT, 0)
    lo = jnp.clip(shifted, 0, 255).astype(jnp.uint8)
    mask = ((shifted < 0) | (shifted > 255)) & in_frame
    exc_pos, exc_val, count = _compact(cat, mask, EXC_K)
    return jnp.concatenate([lo, _u8(count[None]), _u8(exc_pos),
                            _u8(exc_val)])


# 5-bit-delta downlink wire: the decoder's YUV output is the decode
# leg's link floor, and recon content (quantizer-smoothed) has even
# tighter neighbour deltas than the source. Same field scheme as the
# uplink (clip(delta,-16,15) at bits [5g,5g+5)), but exceptions carry
# the exact ABSOLUTE value (int16, like pack_yuv_wire's list): the host
# unpack is a sequential prefix scan that substitutes them in place, so
# one list covers both clipped deltas and out-of-window values. Overflow
# (count > DEXC_K) makes the caller refetch the exact ring planes.
DEXC_K = 16384


def yuv5d_wire_nbytes(ah, aw):
    total = ah * aw + 2 * (ah // 2) * (aw // 2)
    return 4 + 6 * DEXC_K + total * 5 // 8


def pack_yuv5d_wire(y, u, v, frame_w, frame_h):
    """Device side. y/u/v int32 recon planes (aligned dims) -> one uint8
    wire: [count i32 | DEXC_K exc_pos i32 | DEXC_K exc_val i16 | packed
    fields]. Values are in the shifted space (Y minus its +16 offset,
    chroma as-is); exceptions are limited to in-frame cells (the pad
    region is never read and every in-frame prefix path stays in-frame,
    so clipped pad deltas cannot corrupt in-frame reconstruction)."""
    ah, aw = y.shape
    yin = ((jnp.arange(ah)[:, None] < frame_h)
           & (jnp.arange(aw)[None, :] < frame_w))
    ch, cw = u.shape
    cin = ((jnp.arange(ch)[:, None] < (frame_h + 1) // 2)
           & (jnp.arange(cw)[None, :] < (frame_w + 1) // 2))

    def deltas(g):
        h, w = g.shape
        left = g - jnp.pad(g, ((0, 0), (1, 0)))[:, :w]
        d0 = g[:, :1] - jnp.pad(g[:, :1], ((1, 0), (0, 0)))[:h]
        return jnp.concatenate([d0, left[:, 1:]], axis=1)

    ys = y.size
    y_sh = y - Y_SHIFT
    d = jnp.concatenate([deltas(p).reshape(-1)
                         for p in (y_sh, u, v)])
    st = jnp.clip(d, -16, 15)
    cat = jnp.concatenate([p.reshape(-1) for p in (y_sh, u, v)])
    in_frame = jnp.concatenate([yin.reshape(-1), cin.reshape(-1),
                                cin.reshape(-1)])
    mask = (st != d) & in_frame
    exc_pos, exc_val, count = _compact(cat, mask, DEXC_K, split=EXC_K)

    f = (st & 31).astype(jnp.uint32).reshape(-1, 32)
    g_ = f.shape[0]
    words = [jnp.zeros((g_,), jnp.uint32) for _ in range(5)]
    for i in range(32):
        b = 5 * i
        k, s = b >> 5, b & 31
        words[k] = words[k] | (f[:, i] << np.uint32(s))
        if s > 27:
            words[k + 1] = words[k + 1] | (f[:, i] >> np.uint32(32 - s))
    packed = jnp.stack(words, axis=1).reshape(-1)
    return jnp.concatenate([_u8(count[None]), _u8(exc_pos), _u8(exc_val),
                            _u8(packed)])


def yuv_wire_nbytes(ah, aw):
    total = ah * aw + 2 * (ah // 2) * (aw // 2)
    return total + 4 + 6 * EXC_K


def unpack_yuv_wire_np(buf, ah, aw):
    """Host-side reference unpack (numpy; production uses the native C++
    converter). Returns (y, u, v int16 planes, oob_count)."""
    buf = np.asarray(buf)
    total = ah * aw + 2 * (ah // 2) * (aw // 2)
    vals = buf[:total].astype(np.int32)
    vals[:ah * aw] += Y_SHIFT
    o = total
    count = int(buf[o:o + 4].view(np.int32)[0])
    exc_pos = buf[o + 4:o + 4 + 4 * EXC_K].view(np.int32)
    exc_val = buf[o + 4 + 4 * EXC_K:o + 4 + 6 * EXC_K].view(np.int16)
    if count > 0:
        k = min(count, EXC_K)
        vals[exc_pos[:k]] = exc_val[:k]
    y = vals[:ah * aw].reshape(ah, aw).astype(np.int16)
    cs = (ah // 2) * (aw // 2)
    u = vals[ah * aw:ah * aw + cs].reshape(ah // 2, aw // 2).astype(np.int16)
    v = vals[ah * aw + cs:].reshape(ah // 2, aw // 2).astype(np.int16)
    return y, u, v, count
