"""Spike: measure Pallas per-step costs for a shared-stack packet traversal
on the real v5e chip, before committing to the kernel architecture.

Questions:
  A. cost of a bare while_loop iteration with scalar control (SMEM)
  B. + dynamic (1,16) row fetch from a VMEM-resident node table + static
     lane extracts + slab math on an (8,128) packet + any() reduction
     feeding scalar control
  C. + mask-stack push/pop (VMEM (DEPTH,8,128) dynamic-dim0 access)

Run: python scripts/pallas_spike.py
"""
import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_SUB, P_LANE = 8, 128  # packet = 1024 rays


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- kernel A
def kernel_a(steps_ref, x_ref, out_ref):
    steps = steps_ref[0]

    def body(state):
        i, acc = state
        return i + 1, acc * 1.0001 + 0.5

    def cond(state):
        return state[0] < steps

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
    out_ref[:] = acc


@jax.jit
def run_a(steps, x):
    return pl.pallas_call(
        kernel_a,
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(steps, x)


# ---------------------------------------------------------------- kernel B
def kernel_b(steps_ref, nodes_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref, out_ref):
    steps = steps_ref[0]
    n_nodes = nodes_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    ix, iy, iz = ix_ref[:], iy_ref[:], iz_ref[:]

    def body(state):
        i, cur, acc = state
        row = nodes_ref[pl.ds(cur, 1), :]  # (1, 16) dynamic fetch

        def slab(c):
            tx0 = (row[0, c + 0] - ox) * ix
            tx1 = (row[0, c + 3] - ox) * ix
            ty0 = (row[0, c + 1] - oy) * iy
            ty1 = (row[0, c + 4] - oy) * iy
            tz0 = (row[0, c + 2] - oz) * iz
            tz1 = (row[0, c + 5] - oz) * iz
            entry = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            return entry <= exit_, entry

        lhit, lt = slab(0)
        rhit, rt = slab(6)
        any_l = jnp.any(lhit)
        any_r = jnp.any(rhit)
        nxt = jnp.where(any_l, (cur * 5 + 1) % n_nodes, (cur * 3 + 2) % n_nodes)
        acc = acc + jnp.where(lhit, lt, 0.0) + jnp.where(rhit, rt, 0.0)
        nxt = jnp.where(any_r, nxt, (nxt + 7) % n_nodes)
        return i + 1, nxt, acc

    def cond(state):
        return state[0] < steps

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.zeros((P_SUB, P_LANE), jnp.float32))
    )
    out_ref[:] = acc


@jax.jit
def run_b(steps, nodes, ox, oy, oz, ix, iy, iz):
    return pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(steps, nodes, ox, oy, oz, ix, iy, iz)


# ---------------------------------------------------------------- kernel C
DEPTH = 32


def kernel_c(steps_ref, nodes_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref, out_ref):
    steps = steps_ref[0]
    n_nodes = nodes_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    ix, iy, iz = ix_ref[:], iy_ref[:], iz_ref[:]

    def scoped(stack_ref, tstack_ref):
        def body(state):
            i, cur, sp, acc = state
            row = nodes_ref[pl.ds(cur, 1), :]

            def slab(c):
                tx0 = (row[0, c + 0] - ox) * ix
                tx1 = (row[0, c + 3] - ox) * ix
                ty0 = (row[0, c + 1] - oy) * iy
                ty1 = (row[0, c + 4] - oy) * iy
                tz0 = (row[0, c + 2] - oz) * iz
                tz1 = (row[0, c + 5] - oz) * iz
                entry = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                exit_ = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1),
                )
                return entry <= exit_, entry

            lhit, lt = slab(0)
            rhit, rt = slab(6)
            any_l = jnp.any(lhit)
            any_r = jnp.any(rhit)

            # push "far" mask to VMEM tstack + node to SMEM stack
            push = jnp.logical_and(any_l, any_r)
            spp = jnp.minimum(sp, DEPTH - 1)

            @pl.when(push)
            def _():
                stack_ref[spp] = (cur * 3 + 2) % n_nodes
                tstack_ref[pl.ds(spp, 1), :, :] = jnp.where(rhit, rt, 1e30)[None]

            sp2 = jnp.where(push, spp + 1, sp)
            # pop
            do_pop = jnp.logical_not(any_l)
            spm = jnp.maximum(sp2 - 1, 0)
            popped = stack_ref[spm]
            pop_t = tstack_ref[pl.ds(spm, 1), :, :][0]
            acc = acc + jnp.where(do_pop, pop_t * 1e-30, 0.0)
            nxt = jnp.where(do_pop, popped, (cur * 5 + 1) % n_nodes)
            sp3 = jnp.where(do_pop, spm, sp2)
            return i + 1, nxt, sp3, acc

        def cond(state):
            return state[0] < steps

        _, _, _, acc = jax.lax.while_loop(
            cond,
            body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.zeros((P_SUB, P_LANE), jnp.float32)),
        )
        out_ref[:] = acc

    pl.run_scoped(
        scoped,
        stack_ref=pltpu.SMEM((DEPTH,), jnp.int32),
        tstack_ref=pltpu.VMEM((DEPTH, P_SUB, P_LANE), jnp.float32),
    )


@jax.jit
def run_c(steps, nodes, ox, oy, oz, ix, iy, iz):
    return pl.pallas_call(
        kernel_c,
        out_shape=jax.ShapeDtypeStruct((P_SUB, P_LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(steps, nodes, ox, oy, oz, ix, iy, iz)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (P_SUB, P_LANE), jnp.float32)
    nodes = jax.random.normal(key, (4096, 16), jnp.float32)
    ox, oy, oz = (jax.random.normal(jax.random.fold_in(key, i), (P_SUB, P_LANE)) for i in range(3))
    ix, iy, iz = (jax.random.normal(jax.random.fold_in(key, i + 3), (P_SUB, P_LANE)) for i in range(3))

    for name, fn, args in (
        ("A bare loop", run_a, (x,)),
        ("B node fetch+slab+any", run_b, (nodes, ox, oy, oz, ix, iy, iz)),
        ("C + stack push/pop", run_c, (nodes, ox, oy, oz, ix, iy, iz)),
    ):
        try:
            for steps in (1000, 11000):
                s = jnp.array([steps], jnp.int32)
                t = timeit(fn, s, *args)
                print(f"{name:28s} steps={steps:6d}  {t*1e3:8.3f} ms")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:500]}")
            continue
        # per-step from the delta
        s1 = jnp.array([1000], jnp.int32)
        s2 = jnp.array([11000], jnp.int32)
        t1, t2 = timeit(fn, s1, *args), timeit(fn, s2, *args)
        print(f"{name:28s} per-step = {(t2-t1)/10000*1e9:8.1f} ns")


if __name__ == "__main__":
    main()
