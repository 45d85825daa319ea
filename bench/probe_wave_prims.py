"""On-chip probes for the Mosaic wave-kernel primitives (round-5 memo).

Each probe is a tiny pallas_call checked against numpy. Run:
  JAX_PLATFORMS=axon python bench/probe_wave_prims.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, ok, extra=""):
    print(f"  [{'OK' if ok else 'FAIL'}] {name} {extra}")


# --------------------------------------------------------------------------
# 1. dynamic sublane load at 8-aligned traced offset + dynamic 2-axis rolls
def probe_dyn_roll():
    def kern(off_ref, x_ref, out_ref):
        base = off_ref[0]          # traced, 8-aligned
        resid = off_ref[1]         # traced sublane residue
        lroll = off_ref[2]         # traced lane roll
        win = x_ref[pl.ds(pl.multiple_of(base, 8), 24)]
        w = pltpu.roll(win, 24 - resid, 0)      # rows start at base+resid
        w = pltpu.roll(w, 128 - lroll, 1)       # lanes start at lroll
        out_ref[...] = w[0:16]

    x = np.arange(64 * 128, dtype=np.int32).reshape(64, 128)
    off = np.asarray([16, 5, 37], np.int32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
    )(off, x)
    want = np.roll(x[16:40], -37, axis=1)[5:21]
    report("dyn sublane load + 2-axis dyn roll", np.array_equal(out, want))


# --------------------------------------------------------------------------
# 2. dynamic sublane STORE at 8-aligned traced offset
def probe_dyn_store():
    def kern(off_ref, x_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[pl.ds(pl.multiple_of(off_ref[0], 8), 16)] = x_ref[...]

    x = np.arange(16 * 128, dtype=np.int32).reshape(16, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )(np.asarray([24], np.int32), x)
    want = np.zeros((64, 128), np.int32)
    want[24:40] = x
    report("dyn 8-aligned sublane store", np.array_equal(out, want))


# --------------------------------------------------------------------------
# 3. scratch persistence across grid steps + pl.when init/final
def probe_scratch_persist():
    def kern(x_ref, out_ref, acc):
        w = pl.program_id(0)

        @pl.when(w == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        acc[...] += x_ref[...]

        @pl.when(w == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    x = np.arange(8 * 16 * 128, dtype=np.int32).reshape(8, 16, 128)
    out = pl.pallas_call(
        kern,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, 16, 128), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda w: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 16, 128), jnp.int32)],
    )(x)
    report("scratch persists across grid", np.array_equal(out, x.sum(0)))


# --------------------------------------------------------------------------
# 4. big VMEM scratch (10 MB) + 3D middle-dim dynamic slice
def probe_big_scratch():
    def kern(off_ref, x_ref, out_ref, big):
        big[0:64] = x_ref[...].reshape(64, 16, 128)
        b = off_ref[0]
        sl = big[0:32, pl.ds(b, 2), :]          # (32, 2, 128)
        out_ref[...] = sl.reshape(32, 256)

    x = np.arange(64 * 2048, dtype=np.int32).reshape(64, 2048) % 997
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1184, 16, 128), jnp.int16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(np.asarray([5], np.int32), x.astype(np.int32))
    want = x.reshape(64, 16, 128)[0:32, 5:7].reshape(32, 256)
    ok = np.array_equal(out, want)
    report("10MB int16 scratch + 3D dyn mid slice", ok)


# --------------------------------------------------------------------------
# 5. transpose cost: (640, 128) int32 -> (128, 640)
def probe_transpose():
    def kern(x_ref, out_ref):
        out_ref[...] = x_ref[...].T

    x = (np.arange(640 * 128, dtype=np.int32) % 1999).reshape(640, 128)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 640), jnp.int32),
    )
    out = f(x)
    report("(640,128) int32 transpose", np.array_equal(out, x.T))
    xj = jnp.asarray(x)
    jf = jax.jit(f)
    jf(xj).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(100):
        o = jf(xj)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / 100 * 1e6
    print(f"        transpose wall: {dt:.1f} us/call (incl dispatch)")


# --------------------------------------------------------------------------
# 6. segment roll-tree + one-hot row extraction, timed composite:
#    per-"ring" work shape: d=(640,128) abs-diff, lane tree16, sublane
#    tree16, extract rows 16m via one-hot matmul
def probe_ring_cost():
    P = 40

    def tree(m, group, axis, op):
        n = m.shape[axis]
        shift = 1
        while shift < group:
            m = op(m, pltpu.roll(m, n - shift, axis))
            shift *= 2
        return m

    def kern(src_ref, strip_ref, oh_ref, sad_ref, mad_ref):
        for oj in range(3):
            d = jnp.abs(src_ref[...] - strip_ref[pl.ds(oj * 640, 640)])
            lo = (d & 255).astype(jnp.bfloat16)
            hi = (d >> 8).astype(jnp.bfloat16)
            rs_lo = jax.lax.dot_general(
                oh_ref[...], lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rs_hi = jax.lax.dot_general(
                oh_ref[...], hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rs = rs_lo.astype(jnp.int32) + (rs_hi.astype(jnp.int32) << 8)
            swin = tree(rs, 16, 1, jnp.add)
            sad_ref[pl.ds(oj * 40, 40), :] = swin
            m1 = tree(d, 16, 1, jnp.maximum)
            m2 = tree(m1, 16, 0, jnp.maximum)
            mad_ref[pl.ds(oj * 640, 640), :] = m2

    rng = np.random.default_rng(0)
    src = rng.integers(0, 60000, (640, 128)).astype(np.int32)
    strips = rng.integers(0, 60000, (3 * 640, 128)).astype(np.int32)
    oh = np.zeros((P, 640), np.float32)
    for m in range(P):
        oh[m, 16 * m:16 * m + 16] = 1.0
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((120, 128), jnp.int32),
                   jax.ShapeDtypeStruct((3 * 640, 128), jnp.int32)],
    ))
    sad, mad = f(src, strips, oh.astype(jnp.bfloat16))
    # numpy check for oj=0
    d = np.abs(src - strips[:640])
    seg = d.reshape(P, 16, 128).sum(1)
    want_sad = np.zeros((P, 128), np.int64)
    for l in range(128):
        for k in range(16):
            want_sad[:, l] += seg[:, (l + k) % 128]
    ok = np.array_equal(np.asarray(sad[:40], np.int64), want_sad)
    report("ring composite (sad tree+matmul)", ok)
    t0 = time.perf_counter()
    for _ in range(100):
        o = f(src, strips, oh.astype(jnp.bfloat16))
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 100 * 1e6
    print(f"        3x(d+sadmm+tree16lane+tree16sub) wall: {dt:.1f} us/call")


# --------------------------------------------------------------------------
# 7. block-diag (640,640) left matmul cost (the DCT sublane pass)
def probe_blockdiag():
    def kern(l_ref, x_ref, out_ref):
        lo = (x_ref[...] & 255).astype(jnp.bfloat16)
        hi = ((x_ref[...] >> 8) & 255).astype(jnp.bfloat16)
        a = jax.lax.dot_general(l_ref[...], lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        b = jax.lax.dot_general(l_ref[...], hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[...] = a.astype(jnp.int32) + (b.astype(jnp.int32) << 8)

    rng = np.random.default_rng(1)
    c8 = rng.integers(-128, 128, (8, 8)).astype(np.float32)
    L = np.kron(np.eye(80, dtype=np.float32), c8)
    x = rng.integers(0, 65536, (640, 128)).astype(np.int32)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((640, 128), jnp.int32),
    ))
    out = f(L.astype(jnp.bfloat16), x)
    want = (L.astype(np.int64) @ (x & 255)) + \
        ((L.astype(np.int64) @ (x >> 8)) * 256)
    ok = np.array_equal(np.asarray(out, np.int64), want.astype(np.int64))
    report("blockdiag 640x640 left matmul hi/lo", ok)
    t0 = time.perf_counter()
    for _ in range(100):
        o = f(L.astype(jnp.bfloat16), x)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 100 * 1e6
    print(f"        wall: {dt:.1f} us/call")


# --------------------------------------------------------------------------
# 8. unrolled member loop cost: 40 x (dyn load + 2 rolls + 3 static stores)
def probe_member_loop():
    P = 40

    def kern(offs_ref, win_ref, s0_ref, s1_ref, s2_ref):
        for m in range(P):
            by = offs_ref[m]
            bx = offs_ref[P + m]
            a = 80 * m + 48 + by - 8
            al = (a >> 3) << 3
            w = win_ref[pl.ds(pl.multiple_of(al, 8), 40)]
            w = pltpu.roll(w, 40 - (a - al), 0)
            w = pltpu.roll(w, 128 - bx, 1)
            s0_ref[pl.ds(16 * m, 16)] = w[0:16]
            s1_ref[pl.ds(16 * m, 16)] = w[8:24]
            s2_ref[pl.ds(16 * m, 16)] = w[16:32]

    rng = np.random.default_rng(2)
    win = rng.integers(0, 65536, (80 * P + 64, 128)).astype(np.int32)
    offs = np.concatenate([rng.integers(0, 8, P), rng.integers(0, 48, P)]) \
        .astype(np.int32)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((16 * P, 128), jnp.int32)] * 3,
    ))
    s0, s1, s2 = f(offs, win)
    m = 7
    a = 80 * m + 48 + int(offs[m]) - 8
    want = np.roll(win[a:a + 16], -int(offs[P + m]), axis=1)
    report("member loop strips", np.array_equal(s0[16 * m:16 * m + 16], want))
    t0 = time.perf_counter()
    for _ in range(100):
        o = f(offs, win)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 100 * 1e6
    print(f"        40x(load+2rolls+3stores) wall: {dt:.1f} us/call")


if __name__ == "__main__":
    for p in (probe_dyn_roll, probe_dyn_store, probe_scratch_persist,
              probe_big_scratch, probe_transpose, probe_ring_cost,
              probe_blockdiag, probe_member_loop):
        try:
            p()
        except Exception as e:  # noqa: BLE001
            report(p.__name__, False, f"({type(e).__name__}: {str(e)[:200]})")
