"""Host<->device link microbench (axon tunnel characterization).

Measures h2d and d2h bandwidth at several sizes and whether
copy_to_host_async overlaps with device compute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    for mb in (0.25, 1, 3, 6, 12):
        nbytes = int(mb * 1e6)
        host = np.random.randint(0, 255, nbytes, dtype=np.uint8)
        # h2d
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            d = jax.device_put(host, dev)
            d.block_until_ready()
        t1 = time.perf_counter()
        # d2h
        t2 = time.perf_counter()
        for _ in range(reps):
            h = np.asarray(d)
        t3 = time.perf_counter()
        print(f"{mb:5.2f} MB: h2d {(t1-t0)/reps*1e3:7.1f} ms "
              f"({mb*reps/(t1-t0):6.1f} MB/s)  d2h {(t3-t2)/reps*1e3:7.1f} ms "
              f"({mb*reps/(t3-t2):6.1f} MB/s)")

    # overlap test: does copy_to_host_async overlap device compute?
    a = jnp.ones((2048, 2048), jnp.float32)
    matmul = jax.jit(lambda x: x @ x)
    for _ in range(3):
        matmul(a).block_until_ready()
    big = jax.device_put(np.zeros(6_000_000, np.uint8), dev)
    big.block_until_ready()

    t0 = time.perf_counter()
    r = matmul(a)
    big.copy_to_host_async()
    r.block_until_ready()
    h = np.asarray(big)
    t1 = time.perf_counter()
    print(f"compute+async d2h 6MB: {(t1-t0)*1e3:.1f} ms")

    t0 = time.perf_counter()
    r = matmul(a)
    r.block_until_ready()
    h = np.asarray(big)
    t1 = time.perf_counter()
    print(f"compute then sync d2h 6MB: {(t1-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
