"""Wire capacity-overflow fallbacks (tpu.wire): when a frame's residual
COO list exceeds capacity, the encoder must fall back to exact-plane
fetch and the decoder to the dense upload path, keeping streams
conformant."""

import numpy as np
import pytest

from cairo_tpu.tpu import wire


def test_coo_overflow_roundtrip(monkeypatch):
    # shrink the capacity so ordinary noise content overflows it. The
    # frame size (32x32) is unique to this test: the engine's jit traces
    # bake the capacity in, so reusing a shape another test compiled with
    # the production capacity would mix executables.
    monkeypatch.setattr(wire, "COO_K", 256)

    from cairo_tpu.cpuref.api import Evx1Decoder
    from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder

    rng = np.random.default_rng(0)
    w = h = 32
    frames = [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
              for _ in range(3)]  # dense noise at q1 -> huge residuals
    enc = TpuEncoder()
    enc.set_quality(1)
    cdec = Evx1Decoder()
    tdec = TpuDecoder()
    for t, f in enumerate(frames):
        chunk = enc.encode(f)
        a = cdec.decode(chunk)
        b = tdec.decode(chunk)
        np.testing.assert_array_equal(b, a, err_msg=f"frame {t}")
    # the content must actually have exercised the overflow path
    assert int((enc._coef_y != 0).sum()) > wire.COO_K


def test_yuv_wire_exceptions_convert_exactly():
    """Values outside the 8-bit window (Y [16, 271], chroma [0, 255])
    ride the exception list; the native converter must reproduce the
    exact RGB for the affected pixels."""
    import jax.numpy as jnp

    from cairo_tpu import native
    from cairo_tpu.cpuref import imaging

    rng = np.random.default_rng(1)
    ah, aw, w, h = 32, 64, 60, 30
    y = rng.integers(16, 272, (ah, aw)).astype(np.int32)
    u = rng.integers(0, 256, (ah // 2, aw // 2)).astype(np.int32)
    v = rng.integers(0, 256, (ah // 2, aw // 2)).astype(np.int32)
    # out-of-window values (ringing-style overshoot), incl. chroma
    y[3, 5] = -60
    y[10, 50] = 500
    u[4, 7] = -40
    v[9, 2] = 505
    buf = np.asarray(wire.pack_yuv_wire(jnp.asarray(y), jnp.asarray(u),
                                        jnp.asarray(v), w, h))
    rgb, count = native.yuv_wire_to_rgb(buf, aw, ah, w, h, wire.EXC_K)
    assert count == 4
    want = imaging.yuv420_to_rgb(y.astype(np.int16), u.astype(np.int16),
                                 v.astype(np.int16), w, h)
    np.testing.assert_array_equal(rgb, want)


def test_compact_matches_numpy():
    """_compact (chunked sort + histogram chunk-lookup) vs a direct numpy
    nonzero, across counts below/at/above capacity and empty masks."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for n, k, density in ((1000, 64, 0.02), (5000, 64, 0.5),
                          (4096, 128, 0.0), (3000, 4096, 1.0),
                          (700, 16, 0.03)):
        vals = rng.integers(-300, 300, n).astype(np.int32)
        mask = rng.random(n) < density
        vals = np.where(mask & (vals == 0), 1, vals)
        pos, val, total = wire._compact(jnp.asarray(vals * mask),
                                        jnp.asarray(mask), k)
        pos, val, total = np.asarray(pos), np.asarray(val), int(total)
        want_pos = np.flatnonzero(mask)
        assert total == len(want_pos)
        m = min(total, k)
        np.testing.assert_array_equal(pos[:m], want_pos[:m])
        np.testing.assert_array_equal(val[:m], (vals * mask)[want_pos[:m]])
        np.testing.assert_array_equal(pos[m:], 0)
        np.testing.assert_array_equal(val[m:], 0)


def test_yuv_wire_pad_region_not_excepted():
    """The MB-alignment pad reconstructs near 0 — below the Y window —
    but is never read by the converter: it must not consume exception
    capacity (at 1080p the 8 pad rows alone would overflow EXC_K and
    force a full ring refetch every frame)."""
    import jax.numpy as jnp

    ah, aw, w, h = 32, 64, 60, 30
    y = np.full((ah, aw), 100, np.int32)
    y[h:, :] = 0
    y[:, w:] = 0
    u = np.full((ah // 2, aw // 2), 90, np.int32)
    v = np.full((ah // 2, aw // 2), 90, np.int32)
    u[(h + 1) // 2:, :] = -5
    v[:, (w + 1) // 2:] = 300
    buf = np.asarray(wire.pack_yuv_wire(jnp.asarray(y), jnp.asarray(u),
                                        jnp.asarray(v), w, h))
    _, _, _, count = wire.unpack_yuv_wire_np(buf, ah, aw)
    assert count == 0


def test_sustained_overflow_pipelined(monkeypatch):
    """Heavy content overflowing the COO capacity EVERY frame, through
    the pipelined encode_many/decode_many paths: the encoder's exact-plane
    refetch and the decoder's dense fallback must stay conformant under
    worker-thread overlap (VERDICT r3 weakness 7)."""
    monkeypatch.setattr(wire, "COO_K", 256)

    from cairo_tpu.cpuref.api import Evx1Decoder
    from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder

    rng = np.random.default_rng(2)
    w = h = 48  # unique dims: COO_K is baked into the jit trace
    frames = [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
              for _ in range(6)]
    enc = TpuEncoder()
    enc.set_quality(1)
    chunks = list(enc.encode_many(frames))
    assert int((enc._coef_y != 0).sum()) > wire.COO_K  # really overflowed

    cdec = Evx1Decoder()
    want = [cdec.decode(c) for c in chunks]
    tdec = TpuDecoder()
    got = list(tdec.decode_many(chunks))
    for t, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_array_equal(b, a, err_msg=f"frame {t}")


def test_exception_overflow_refetch_pipelined(monkeypatch):
    """YUV-wire exception overflow under decode_many: the worker-thread
    refetch must read the dispatch-time ring-slot captures (the next
    frame's decode step donates the live state buffers — ADVICE r3
    item 2), and the refetched pixels must be exact."""
    monkeypatch.setattr(wire, "EXC_K", 2)

    from cairo_tpu.cpuref.api import Evx1Decoder
    from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder

    rng = np.random.default_rng(3)
    w = h = 64  # unique dims (EXC_K baked into the jit trace)
    frames = [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
              for _ in range(5)]
    enc = TpuEncoder()
    enc.set_quality(31)  # coarse quant -> ringing -> window overshoots
    chunks = list(enc.encode_many(frames))

    cdec = Evx1Decoder()
    want = [cdec.decode(c) for c in chunks]
    tdec = TpuDecoder()
    got = list(tdec.decode_many(chunks))
    for t, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_array_equal(b, a, err_msg=f"frame {t}")
