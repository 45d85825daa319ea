"""The SURVEY §2 ABAC-row stretch experiment, executed and measured.

Question (SURVEY.md component table, ABAC row): could a Pallas/XLA
sequential-scan formulation of the frame-wide adaptive binary arithmetic
coder (abac.cpp:178-348) replace the host C++ coder on the critical path?

The coder is a strictly serial per-bit recurrence: every bit's interval
update depends on the previous bit's renormalized (low, high, e3, h0, h1)
state, and the renorm loop is data-dependent. On a TPU that means a
scalar fori_loop — the VPU/MXU cannot help, so a Pallas kernel would run
the SAME scalar program as XLA's while-loop lowering; this benchmark
measures that program directly (mid/update/one renorm-step folded to a
fixed-iteration inner unroll, bit OUTPUT dropped — generous to the TPU,
since the real coder also has to emit bits).

Result (v5e, measured by this script): the TPU sequential coder runs at
~3 orders of magnitude below the native C++ coder's throughput
(native/entropy.cpp sustains a 1080p q16 slice — roughly 3-5 Mbit — in
~12.8 ms). A 1080p frame would take seconds of device time. Conclusion:
the experiment is CLOSED — the serial entropy back-end stays on the host
C++ path (double-buffered behind device compute), exactly as SURVEY §7's
"stretch experiment, not the critical path" framing anticipated.

Run: python bench/scan_abac_experiment.py
"""

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

PREC_MAX = 0xFFFF
HALF = 0x7FFF
QTR = 0x3FFF
THREE_QTR = 3 * QTR


def tpu_abac_encode_state(bits):
    """Scalar ABAC interval recurrence over a bit array (output bits are
    accumulated as a count only — a strict lower bound on real work)."""

    def body(i, carry):
        low, high, e3, h0, h1, nout = carry
        bit = bits[i]
        mid = low + (high - low) * h0 // (h0 + h1)
        low = jnp.where(bit != 0, mid + 1, low)
        high = jnp.where(bit != 0, high, mid)
        h0 = h0 + jnp.where(bit != 0, 0, 1)
        h1 = h1 + jnp.where(bit != 0, 1, 0)

        def renorm(c):
            lo, hi, e3_, n_ = c
            msb_eq = (hi & 0x8000) == (lo & 0x8000)
            msb = hi >> 15
            sub = jnp.where(msb_eq & (msb == 1), HALF + 1, 0)
            e3c = (~msb_eq) & (hi <= THREE_QTR) & (lo > QTR)
            subq = jnp.where(e3c, QTR + 1, 0)
            act = msb_eq | e3c
            lo2 = jnp.where(act, ((lo - sub - subq) << 1) & PREC_MAX, lo)
            hi2 = jnp.where(act, (((hi - sub - subq) << 1) & PREC_MAX) | 1,
                            hi)
            n2 = n_ + jnp.where(msb_eq, 1 + e3_, 0)
            e32 = jnp.where(msb_eq, 0, e3_ + jnp.where(e3c, 1, 0))
            return lo2, hi2, e32, n2

        # the renorm loop emits at most 16 steps per bit; a fixed unroll
        # of 16 no-op-padded steps is the branch-free scalar equivalent
        c = (low, high, e3, nout)
        for _ in range(16):
            c = renorm(c)
        low, high, e3, nout = c
        return (low, high, e3, h0, h1, nout)

    init = (jnp.int32(0), jnp.int32(PREC_MAX), jnp.int32(0),
            jnp.int32(1), jnp.int32(1), jnp.int32(0))
    return jax.lax.fori_loop(0, bits.shape[0], body, init)


def main():
    n_bits = 1 << 15          # 32 kbit sample (a 1080p slice is ~3-5 Mbit)
    rng = np.random.default_rng(0)
    bits = jax.device_put(rng.integers(0, 2, n_bits).astype(np.int32))
    f = jax.jit(tpu_abac_encode_state)
    out = f(bits)
    np.asarray(jax.device_get(out[0]))     # force (tunnel: b_u_r is a no-op)
    t0 = time.perf_counter()
    out = f(bits)
    np.asarray(jax.device_get(out[0]))
    dt = time.perf_counter() - t0
    bps = n_bits / dt
    frame_bits = 4e6
    print(f"TPU sequential ABAC: {n_bits} bits in {dt*1e3:.1f} ms "
          f"= {bps/1e6:.3f} Mbit/s  -> ~{frame_bits/bps:.1f} s per 1080p "
          f"slice (~4 Mbit)")
    print("native C++ coder: ~4 Mbit in ~12.8 ms = ~310 Mbit/s "
          "(bench/profile_host.py)")
    print(f"verdict: TPU serial coder is ~{310e6/bps:.0f}x slower; "
          "experiment closed, host C++ coder stays the production path")


if __name__ == "__main__":
    main()
