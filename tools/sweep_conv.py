#!/usr/bin/env python
"""Conv MFU vs batch/layout: is (B=3, H) really 2x slower than (1, 3H)?

Trace attribution showed recon-trunk convs (B=1) at ~29.7 TMAC/s while the
same 64->64 3x3 conv at B=3 runs ~13.3 TMAC/s.  Measures candidate
layouts for the front-end convs (fori differential methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep_dcn import measure  # noqa: E402  (same methodology)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.1, jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    shapes = [(3, 512, 1024), (1, 1536, 1024), (1, 1542, 1024),
              (3, 514, 1024), (6, 512, 1024), (1, 512, 3072)]
    for b, h, ww in shapes:
        x = jnp.asarray(rng.normal(size=(b, h, ww, 64)), jnp.bfloat16)
        dt = measure(conv, x, w)
        mac = b * h * ww * 64 * 64 * 9
        print(f"({b},{h},{ww}): {dt*1e3:7.3f} ms  {mac/dt/1e12:6.1f} TMAC/s",
              flush=True)


if __name__ == "__main__":
    main()
