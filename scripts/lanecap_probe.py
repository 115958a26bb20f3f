"""Mosaic capability probe for the slot-lane kernel design (round 5).

The slot-lane layout (slots on lanes, a packet's rays on sublanes) needs a
way to REFILL one slot's column from a transposed (S, n_packets) ray table
when its packet retires. Candidate lowerings, each tried here on the real
toolchain:

  a) dyncol   — dst[:, k] <- src[:, pl.ds(q, 1)] (dynamic lane-dim slice)
  b) dynroll  — pltpu.roll(block, shift=dyn, axis=1) (dynamic lane rotate)
  c) winfill  — dst[:, :] <- src[:, pl.ds(q0, K)] (dynamic aligned window,
                whole-group refill — the grid/group-barrier fallback)
  d) maskfill — one-hot masked write of a broadcast column

Whichever compiles AND is cheap decides between the persistent work-queue
form (needs a/b/d) and the group-barrier form (only needs c).
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, K, NP = 256, 128, 512


def try_case(name, kernel, *args):
    try:
        out = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, K), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )(*args)
        out.block_until_ready()
        print(f"lanecap[{name:8s}]: OK   sum={float(jnp.sum(out)):.1f}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"lanecap[{name:8s}]: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    src = jnp.arange(S * NP, dtype=jnp.float32).reshape(S, NP)
    qv = jnp.array([[3]], dtype=jnp.int32)

    def k_dyncol(src_ref, q_ref, o_ref):
        q = q_ref[0, 0]
        o_ref[:] = jnp.zeros((S, K), jnp.float32)
        o_ref[:, pl.ds(5, 1)] = src_ref[:, pl.ds(q, 1)]

    def k_dynroll(src_ref, q_ref, o_ref):
        q = q_ref[0, 0]
        blk = src_ref[:, 0:K]
        o_ref[:] = pltpu.roll(blk, shift=q, axis=1)

    def k_winfill(src_ref, q_ref, o_ref):
        q = q_ref[0, 0] * K  # 128-aligned dynamic start
        o_ref[:] = src_ref[:, pl.ds(q, K)]

    def k_maskfill(src_ref, q_ref, o_ref):
        q = q_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
        col = jnp.broadcast_to(src_ref[:, 0:1], (S, K))
        o_ref[:] = jnp.where(lane == q, col, 0.0)

    try_case("dyncol", k_dyncol, src, qv)
    try_case("dynroll", k_dynroll, src, qv)
    try_case("winfill", k_winfill, src, qv)
    try_case("maskfill", k_maskfill, src, qv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
