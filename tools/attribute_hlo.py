#!/usr/bin/env python
"""Dump compiled HLO for the bench forward and map hot trace ops to source.

Used with tools/profile_inference.py: take the op names the profiler ranked
hot, find their HLO definitions, and print the op shapes + metadata so the
glue can be attributed line by line.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops.deform_conv import set_default_impl

    h, w = 512, 1024
    set_default_impl("frame", block_max_offset=4, block_chunk=128)
    model = EDVRNoUp(nf=64, nc=3, nframes=3, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False,
                     dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 64, 64, 3), jnp.float32))["params"]
    x = jnp.zeros((1, 3, h, w, 3), jnp.bfloat16)

    @jax.jit
    def fwd(p, inp):
        return jnp.sum(model.apply({"params": p}, inp).astype(jnp.float32))

    txt = fwd.lower(params, x).compile().as_text()
    out = "/tmp/edvr_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    names = sys.argv[1:]
    if not names:
        return
    for name in names:
        pat = re.compile(r"^\s*(?:ROOT )?%?" + re.escape(name)
                         + r"(?:\.clone)?\s*=.*$", re.M)
        m = pat.search(txt)
        if not m:
            print(f"\n### {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"\n### {name}:")
        print(line[:500])
        meta = re.search(r'metadata=\{([^}]*)\}', line)
        if meta:
            print("  meta:", meta.group(1)[:400])
        # if it's a fusion, show the fused computation root
        fc = re.search(r"calls=(%?[\w.\-]+)", line)
        if fc:
            comp = fc.group(1).lstrip("%")
            cpat = re.compile(r"^%?" + re.escape(comp) + r"\s*\([^)]*\).*?\{.*?^\}",
                              re.M | re.S)
            cm = cpat.search(txt)
            if cm:
                body = cm.group(0)
                print(f"  fused computation ({comp}), "
                      f"{body.count(chr(10))} lines; key ops:")
                for ln in body.splitlines():
                    if re.search(r"= (f32|bf16|s32|pred)\[[^\]]{0,60}\]"
                                 r"\s*(convolution|dot|gather|transpose|copy|"
                                 r"reduce|concatenate|pad|iota|scatter)", ln):
                        print("   ", ln.strip()[:240])


if __name__ == "__main__":
    main()
