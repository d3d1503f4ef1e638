"""Does the TPU-tunnel enqueue cost scale with the number of kernels in
an executable, or per dispatch?

Times jitted chains of n dependent tiny kernels (alternating matmul +
elementwise-on-odd-elements so XLA cannot fuse the chain into one
fusion) for n in {1, 8, 32, 128}.  If dispatch wall-clock grows ~linearly
with n, the tunnel streams per-kernel launches (then: fuse/merge kernels
to speed decode).  If it is flat, enqueue is per-executable (then: pack
multiple decode steps into one dispatch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    dim = 256  # small enough that device time per kernel is ~us

    def chain(n):
        @jax.jit
        def f(x, w):
            for i in range(n):
                x = jnp.dot(x, w, preferred_element_type=jnp.float32)
                x = jnp.tanh(x) * 1.0001  # breaks dot-dot fusion
            return x

        return f

    x = jnp.ones((8, dim), jnp.float32)
    w = jnp.eye(dim, dtype=jnp.float32) * 0.999

    for n in (1, 8, 32, 128):
        f = chain(n)
        y = f(x, w)
        float(y.sum())  # compile + drain
        reps = max(4, 256 // n)
        # dispatch-only loop, then drained
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(y, w)
        t_loop = time.perf_counter() - t0
        float(y.sum())
        t_total = time.perf_counter() - t0
        print(
            f"n={n:4d}: dispatch {t_loop/reps*1e3:7.3f} ms/call  "
            f"drained {t_total/reps*1e3:7.3f} ms/call  "
            f"per-kernel {t_total/reps/n*1e6:7.1f} us"
        )


if __name__ == "__main__":
    main()
