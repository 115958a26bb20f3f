"""Spike D: batched K-packet traversal iteration — K packets advance one
node each per while iteration. Measures per-packet-step cost and validates
the Mosaic forms: per-k dynamic row fetch into scratch, cross-packet
broadcast via pltpu.repeat, joint slab math on (K*8,128), per-packet any()
reduction, static lane extracts feeding SMEM stack updates.

Run: python scripts/pallas_spike2.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 64          # resident packets
P_SUB, P_LANE = 8, 128   # rays per packet = 1024
DEPTH = 32


def kernel_d(steps_ref, nodes_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
             out_ref, rows_scr, stack_ref, cur_ref, sp_ref):
    steps = steps_ref[0]
    n_nodes = nodes_ref.shape[0]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]   # (K*8, 128)
    ix, iy, iz = ix_ref[:], iy_ref[:], iz_ref[:]

    # init scalar state
    for k in range(K):
        cur_ref[k] = 0
        sp_ref[k] = 0

    def body(state):
        i, acc = state

        # ---- fetch K node rows into scratch (K,16)
        for k in range(K):
            rows_scr[pl.ds(k, 1), :] = nodes_ref[pl.ds(cur_ref[k], 1), :]

        rows = rows_scr[:]  # (K, 16)

        # ---- broadcast node columns over each packet's (8,128) block
        def bcol(c):
            col = rows[:, c:c + 1]                      # (K,1)
            rep = pltpu.repeat(col, P_SUB, axis=0)      # (K*8,1) packet-major
            return jnp.broadcast_to(rep, (K * P_SUB, P_LANE))

        def slab(c):
            tx0 = (bcol(c + 0) - ox) * ix
            tx1 = (bcol(c + 3) - ox) * ix
            ty0 = (bcol(c + 1) - oy) * iy
            ty1 = (bcol(c + 4) - oy) * iy
            tz0 = (bcol(c + 2) - oz) * iz
            tz1 = (bcol(c + 5) - oz) * iz
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
        acc = acc + jnp.where(lhit, lt, 0.0) + jnp.where(rhit, rt, 0.0)

        # ---- per-packet any(): (K*8,128) -> (K,)
        both = lhit.astype(jnp.float32) * 2.0 + rhit.astype(jnp.float32)
        lanes = jnp.max(both, axis=1, keepdims=True)        # (K*8,1)
        code = jnp.max(lanes.reshape(K, P_SUB), axis=1)     # (K,) 0..3

        # ---- scalar stack updates per packet (static unroll)
        for k in range(K):
            c = code[k]
            cur_k = cur_ref[k]
            sp_k = sp_ref[k]
            push = c >= 3.0
            spp = jnp.minimum(sp_k, DEPTH - 1)

            @pl.when(push)
            def _():
                stack_ref[k, spp] = (cur_k * 3 + 2) % n_nodes

            sp2 = jnp.where(push, spp + 1, sp_k)
            do_pop = c < 1.0
            spm = jnp.maximum(sp2 - 1, 0)
            popped = stack_ref[k, spm]
            cur_ref[k] = jnp.where(do_pop, popped, (cur_k * 5 + 1) % n_nodes)
            sp_ref[k] = jnp.where(do_pop, spm, sp2)

        return i + 1, acc

    def cond(state):
        return state[0] < steps

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((K * P_SUB, P_LANE), jnp.float32))
    )
    out_ref[:] = acc


@jax.jit
def run_d(steps, nodes, ox, oy, oz, ix, iy, iz):
    return pl.pallas_call(
        kernel_d,
        out_shape=jax.ShapeDtypeStruct((K * P_SUB, P_LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, 16), jnp.float32),
            pltpu.SMEM((K, DEPTH), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
        ],
    )(steps, nodes, ox, oy, oz, ix, iy, iz)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    nodes = jax.random.normal(key, (4096, 16), jnp.float32)
    shape = (K * P_SUB, P_LANE)
    ox, oy, oz = (jax.random.normal(jax.random.fold_in(key, i), shape) for i in range(3))
    ix, iy, iz = (jax.random.normal(jax.random.fold_in(key, i + 3), shape) for i in range(3))

    def t(fn, *args, n=5):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = np.asarray(fn(*args))
        return (time.perf_counter() - t0) / n

    try:
        ts = {}
        for steps in (1000, 2000, 4000):
            s = jnp.array([steps], jnp.int32)
            ts[steps] = t(run_d, s, nodes, ox, oy, oz, ix, iy, iz)
            print(f"D batched steps={steps:6d}  {ts[steps]*1e3:9.3f} ms")
        per_iter = (ts[4000] - ts[1000]) / 3000
        print(f"D per-iteration: {per_iter*1e6:8.2f} us  -> per packet-step: "
              f"{per_iter/K*1e9:7.1f} ns  -> per ray-step: {per_iter/(K*1024)*1e12:7.1f} ps")
    except Exception as e:
        print(f"D FAILED: {type(e).__name__}: {str(e)[:2000]}")


if __name__ == "__main__":
    main()
