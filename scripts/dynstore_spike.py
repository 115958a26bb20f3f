"""Mosaic capability bisect for the persistent packet kernel.

Variants (run one per process; a faulting kernel kills the TPU worker):
  A: fori loop + dynamic-row STORE to output from a register value
  B: A + dynamic-row store to VMEM scratch + dyn->dyn row copy
  C: B + while loop whose trip count comes from an SMEM queue counter
     (cond reads loop CARRY, not the ref)
  D: C but cond reads the SMEM ref directly (the round-1 spike form)

Usage: python -u scripts/dynstore_spike.py A|B|C|D [interpret]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "A"
    interpret = len(sys.argv) > 2 and sys.argv[2] == "interpret"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 32

    def kernel_A(src_ref, out_ref, q_ref, scr_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            row = src_ref[pl.ds(i, 1), :] * 2.0 + 1.0
            out_ref[pl.ds(i, 1), :] = row
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    def kernel_B(src_ref, out_ref, q_ref, scr_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            dst = jax.lax.rem(i, 8)
            scr_ref[pl.ds(dst, 1), :] = src_ref[pl.ds(i, 1), :] * 2.0
            out_ref[pl.ds(i, 1), :] = scr_ref[pl.ds(dst, 1), :] + 1.0
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    def kernel_C(src_ref, out_ref, q_ref, scr_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        q_ref[0] = 0

        def body(q):
            dst = jax.lax.rem(q, 8)
            scr_ref[pl.ds(dst, 1), :] = src_ref[pl.ds(q, 1), :] * 2.0
            out_ref[pl.ds(q, 1), :] = scr_ref[pl.ds(dst, 1), :] + 1.0
            nq = q_ref[0] + 1
            q_ref[0] = nq
            return nq

        jax.lax.while_loop(lambda q: q < N, body, jnp.int32(0))

    def kernel_D(src_ref, out_ref, q_ref, scr_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        q_ref[0] = 0

        def body(it):
            q = q_ref[0]
            dst = jax.lax.rem(q, 8)
            scr_ref[pl.ds(dst, 1), :] = src_ref[pl.ds(q, 1), :] * 2.0
            out_ref[pl.ds(q, 1), :] = scr_ref[pl.ds(dst, 1), :] + 1.0
            q_ref[0] = q + 1
            return it + 1

        jax.lax.while_loop(lambda it: q_ref[0] < N, body, jnp.int32(0))

    kern = {"A": kernel_A, "B": kernel_B, "C": kernel_C, "D": kernel_D}[variant]
    src = jnp.arange(N * 128, dtype=jnp.float32).reshape(N, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32), pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(src)
    expect = np.asarray(src) * 2.0 + 1.0
    got = np.asarray(out)
    ok = np.allclose(got, expect)
    print(f"variant {variant}:", "OK" if ok else "MISMATCH", flush=True)
    if not ok:
        print(got[:2, :4], expect[:2, :4])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
