"""Layout + batching effects on the axon link."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    dev = jax.devices()[0]

    # d2h layouts
    make = jax.jit(lambda x: (x + 1).astype(jnp.uint8))
    hwc = make(jnp.zeros((1080, 1920, 3), jnp.uint8))
    hwc.block_until_ready()
    flat = make(jnp.zeros((1080, 1920 * 3), jnp.uint8))
    flat.block_until_ready()
    chw = make(jnp.zeros((3, 1080, 1920), jnp.uint8))
    chw.block_until_ready()
    i16 = make(jnp.zeros((1088, 1920), jnp.uint8)).astype(jnp.int16)
    i16.block_until_ready()
    print("d2h (1080,1920,3)u8 :", timeit(lambda: np.asarray(hwc)), "ms")
    print("d2h (1080,5760)u8   :", timeit(lambda: np.asarray(flat)), "ms")
    print("d2h (3,1080,1920)u8 :", timeit(lambda: np.asarray(chw)), "ms")
    print("d2h (1088,1920)i16  :", timeit(lambda: np.asarray(i16)), "ms")

    # d2h many small arrays vs one
    small = [make(jnp.zeros((8160,), jnp.uint8)) for _ in range(8)]
    jax.block_until_ready(small)
    print("d2h 8 x 8KB arrays  :", timeit(lambda: [np.asarray(s) for s in small]), "ms")
    one = make(jnp.zeros((8 * 8160,), jnp.uint8))
    one.block_until_ready()
    print("d2h 1 x 64KB array  :", timeit(lambda: np.asarray(one)), "ms")

    # h2d: many arrays vs packed, and int16 vs int8
    coefs16 = [np.zeros((1088, 1920), np.int16),
               np.zeros((544, 960), np.int16), np.zeros((544, 960), np.int16)]
    packed = np.zeros(sum(a.size for a in coefs16), np.int16)
    table = [np.zeros(8160, d) for d in
             (np.uint8, np.uint8, np.int16, np.int16, bool, bool, np.uint8,
              np.uint8)]

    def put_many():
        xs = [jax.device_put(a, dev) for a in coefs16 + table]
        jax.block_until_ready(xs)
    def put_packed():
        x = jax.device_put(packed, dev)
        x.block_until_ready()
    print("h2d 3 coef i16 + 8 table:", timeit(put_many), "ms")
    print("h2d packed 6.3MB i16    :", timeit(put_packed), "ms")
    packed8 = np.zeros(packed.size, np.int8)
    def put_packed8():
        x = jax.device_put(packed8, dev)
        x.block_until_ready()
    print("h2d packed 3.1MB i8     :", timeit(put_packed8), "ms")


if __name__ == "__main__":
    main()
