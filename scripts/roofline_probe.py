"""Roofline decomposition of the persistent packet-traversal kernel (VERDICT
r3 demand #1): what does an iteration COST vs what it MUST cost.

Pieces measured on the real chip:
  peak     - VPU throughput in exactly our code shape: fma chains on a
             (128,128)/(256,128)/(512,128) f32 block inside a fori_loop
             pallas kernel. Slope of time vs chain length = ns/op/block.
  fetch    - the serialized K scalar-indexed row-copy loop (the per-slot
             node/leaf fetch): ns per K-row fetch block vs reps.
  gather   - SPIKE: can Mosaic lower a (K,) row gather of a VMEM table as
             ONE op (jnp.take on a loaded value)? If yes, the fetch loop
             collapses. Run LAST (fault risk wedges the process).
  hall     - the real workload: persistent closest/any on the hall bench
             wavefronts (coherent b0, incoherent b1) with iteration counts
             -> ns/iteration; p_sub sweep isolates the vector-math share
             (slab/MT scale with p_sub, fetch+stepping don't), kk sweep
             isolates fixed-cost amortization.

Usage: python -u scripts/roofline_probe.py peak|fetch|gather|hall [subdiv]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401

import functools
import time

import numpy as np


def bench(fn, n=5):
    out = fn()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def cmd_peak() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 200_000

    def make(rows, chain, dtype):
        def kernel(x_ref, o_ref):
            def body(i, x):
                for _ in range(chain):
                    x = x * 1.0000001 + 0.0000001
                return x

            o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        return run

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for rows in (128, 256, 512):
            x = jnp.ones((rows, 128), dtype)
            t8 = bench(lambda f=make(rows, 8, dtype): f(x))
            t32 = bench(lambda f=make(rows, 32, dtype): f(x))
            ns_op = (t32 - t8) / (24 * ITERS) * 1e9
            lanes = rows * 128
            print(
                f"peak {name} ({rows},128): {ns_op:6.2f} ns per fma-op "
                f"-> {lanes / ns_op / 1e3:7.1f} Gflop-lane/s "
                f"(t8={t8*1e3:.1f}ms t32={t32*1e3:.1f}ms)",
                flush=True,
            )
    return 0


def cmd_fetch() -> int:
    """Decompose the per-slot fetch chain: where do the ~55 ns/slot of the
    production kernels' iteration go? Variants (all fetch K rows per
    fori_loop step, reps doubles the work for a slope):
      smem  - indices live in SMEM (the original microbench; scalar-unit
              native reads)
      vmem  - indices live in a (K, 1) VMEM int32 ref, read as
              cur_ref[k, 0] scalars — EXACTLY the production kernels'
              address chain (vectorized stepping keeps slot state in VMEM)
      mirror- indices in VMEM, but one async copy mirrors the (K, 1)
              column into SMEM per step and the fetch loop reads SMEM
      read  - the K VMEM scalar reads alone, no row copies (isolates the
              scalar-read latency from the copy issue)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 100_000
    N, C, K = 60_000, 32, 64

    def make(reps, cols, mode):
        def kernel(tab_ref, o_ref, scr_ref, idx_ref, vidx_ref, midx_ref, sem):
            for k in range(K):
                idx_ref[k] = (k * 977) % N
            vidx_ref[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) * 977) % N

            def body(i, s):
                for rp in range(reps):
                    if mode == "mirror":
                        cp = pltpu.make_async_copy(
                            vidx_ref.at[:, 0], midx_ref, sem
                        )
                        cp.start()
                        cp.wait()
                    if mode == "vmemlive":
                        # vector update each step (the production stepping
                        # writes cur_ref as a vector) -> the K scalar reads
                        # below CANNOT be hoisted out of the loop
                        vidx_ref[:] = jax.lax.rem(
                            vidx_ref[:] + (i + rp), N
                        )
                    if mode == "smemlive":
                        for k in range(K):
                            idx_ref[k] = jax.lax.rem(idx_ref[k] + i + rp, N)
                    for k in range(K):
                        if mode in ("smem", "smemlive"):
                            c = idx_ref[k]
                        elif mode == "mirror":
                            c = midx_ref[k]
                        else:
                            c = vidx_ref[k, 0]
                        r = jax.lax.rem(c + i + rp * 13, N)
                        if mode == "read":
                            idx_ref[k] = r  # keep the read live, no copy
                        else:
                            scr_ref[pl.ds(k, 1), :] = tab_ref[pl.ds(r, 1), :]
                return s + scr_ref[0, 0] + jnp.float32(idx_ref[0])

            acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, cols), jnp.float32),
                    pltpu.SMEM((K,), jnp.int32),
                    pltpu.VMEM((K, 1), jnp.int32),
                    pltpu.SMEM((K,), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
            )(tab)

        return run

    tab = jnp.ones((N, C), jnp.float32)
    for mode in ("vmemlive", "smemlive", "smem", "vmem", "read"):
        try:
            t1 = bench(lambda f=make(1, C, mode): f(tab))
            t2 = bench(lambda f=make(2, C, mode): f(tab))
            ns_fetch = (t2 - t1) / ITERS * 1e9
            print(
                f"fetch[{mode:6s}] K={K}: {ns_fetch:7.1f} ns per {K}-slot block "
                f"({ns_fetch/K:5.2f} ns/slot; t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"fetch[{mode}] FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
    return 0


def cmd_gather() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, K = 60_000, 32, 64
    ITERS = 20_000

    def make(form, reps):
        def kernel(tab_ref, o_ref, idx_ref):
            idx_ref[:] = (jax.lax.broadcasted_iota(jnp.int32, (8, K), 1)[0:1] * 977) % N

            def body(i, s):
                rows = None
                for r in range(reps):
                    idx = (idx_ref[0, :] + i + r) % N
                    if form == "take":
                        rows = jnp.take(tab_ref[:], idx, axis=0)
                    elif form == "bracket":
                        rows = tab_ref[:][idx]
                return s + rows[0, 0]

            acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, K), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
            )(tab)

        return run

    tab = jnp.ones((N, C), jnp.float32)
    for form in ("take", "bracket"):
        try:
            t1 = bench(lambda f=make(form, 1): f(tab))
            t2 = bench(lambda f=make(form, 2): f(tab))
            ns = (t2 - t1) / ITERS * 1e9
            print(
                f"gather[{form}] K={K} rows from ({N},{C}): {ns:7.1f} ns per "
                f"gather ({ns/K:.2f} ns/row)",
                flush=True,
            )
        except Exception as e:
            print(f"gather[{form}] FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    return 0


def cmd_step() -> int:
    """Cost of the node-iteration building blocks at production shapes
    (K=64, p_sub=2, depth=48): which term carries the measured ~36 ns/slot
    K-proportional iteration cost? Each variant ADDS one block to the
    previous, so deltas are per-block costs:
      base    - vmemlive fetch loop only (addresses live in a (K,1) ref)
      bcast   - + 24 per-child column broadcasts (K,1)->(K*ps,128)
      slab    - + 4 child slab tests (the b*K*ps math)
      reduce  - + 8 packet reduces (K*ps,128)->(K,1)
      sortnet - + the 5-swap (K,1) sorting network + code wheres
      stack   - + 3 masked (K,depth) pushes + pop read + sp updates
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 200_000
    N, K, PS, DEPTH, AR = 60_000, 64, 2, 48, 4
    LEVELS = ("base", "bcast", "slab", "reduce", "sortnet", "stack")
    # full-pipeline reformulations (compare against the "stack" total):
    #   fused   - hit+entry reduces fused into ONE min-reduce per child
    #             (keys computed directly; 8 reduces -> 4)
    #   lanemaj - fused reduces + (K,4)->(4,K) transpose, then the sortnet,
    #             stack pushes/pops and sp bookkeeping all in LANE-major
    #             (1,K)/(DEPTH,K) shapes (one vreg per op instead of 8)
    #   bf16    - psfold pipeline with the box broadcast, slab math, fold
    #             and lane-reduce tree all in bfloat16 (half the vregs per
    #             op; production would pre-expand boxes conservatively so
    #             the test never false-misses — here we only price the ops)
    VARIANTS = ("fused", "lanemaj", "psfold", "bf16")

    def make(level):
        lv = LEVELS.index(level)

        def kernel(tab_ref, o_ref, nrow, vidx, stack_ref, sp_ref, wa, wb):
            vidx[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) * 977) % N
            stack_ref[:] = jnp.zeros((K, DEPTH), jnp.int32)
            sp_ref[:] = jnp.zeros((K, 1), jnp.int32)
            wa[:] = jnp.ones((K * PS, 128), jnp.float32)
            wb[:] = jnp.ones((K * PS, 128), jnp.float32) * 0.5
            iota_cols = jax.lax.broadcasted_iota(jnp.int32, (K, DEPTH), 1)

            def body(i, s):
                vidx[:] = jax.lax.rem(vidx[:] + i, N)
                for k in range(K):
                    c = vidx[k, 0]
                    r = jax.lax.rem(c + i, N)
                    nrow[pl.ds(k, 1), :] = tab_ref[pl.ds(r, 1), :]
                acc = s
                rows = nrow[:]
                if lv >= 1:  # bcast
                    cols = []
                    for c in range(AR * 6):
                        cols.append(_bc(rows[:, c : c + 1]))
                    if lv == 1:
                        acc = acc + cols[0][0, 0] + cols[-1][0, 0]
                if lv >= 2:  # slab
                    ox, ix, tmn, tcap = wa[:], wb[:], 0.0, 1e30
                    hits, ents = [], []
                    for c in range(AR):
                        t0 = (cols[6 * c + 0] - ox) * ix
                        t1 = (cols[6 * c + 3] - ox) * ix
                        u0 = (cols[6 * c + 1] - ox) * ix
                        u1 = (cols[6 * c + 4] - ox) * ix
                        v0 = (cols[6 * c + 2] - ox) * ix
                        v1 = (cols[6 * c + 5] - ox) * ix
                        tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                        un, uf = jnp.minimum(u0, u1), jnp.maximum(u0, u1)
                        vn, vf = jnp.minimum(v0, v1), jnp.maximum(v0, v1)
                        entry = jnp.maximum(jnp.maximum(tn, un), jnp.maximum(vn, tmn))
                        exit_ = jnp.minimum(jnp.minimum(tf, uf), jnp.minimum(vf, tcap))
                        hits.append(entry <= exit_)
                        ents.append(entry)
                    if lv == 2:
                        acc = acc + jnp.where(hits[0], ents[0], 0.0)[0, 0]
                if lv >= 3:  # reduce (exact production _packet_reduce form)
                    ch_hit, ch_ent = [], []
                    for c in range(AR):
                        hl = jnp.max(jnp.where(hits[c], 1.0, 0.0), axis=1)
                        hmax = jnp.max(hl.reshape(PS, K), axis=0).reshape(K, 1)
                        el = jnp.min(jnp.where(hits[c], ents[c], 1e30), axis=1)
                        emin = jnp.min(el.reshape(PS, K), axis=0).reshape(K, 1)
                        ch_hit.append(hmax > 0.0)
                        ch_ent.append(emin)
                    if lv == 3:
                        acc = acc + jnp.sum(ch_ent[0]) + jnp.sum(ch_ent[-1])
                if lv >= 4:  # sortnet
                    keys = [jnp.where(ch_hit[c], ch_ent[c], 1e30) for c in range(AR)]
                    codes = [
                        pltpu.bitcast(rows[:, 24 + c : 25 + c], jnp.int32)
                        for c in range(AR)
                    ]

                    def cswap(i_, j_):
                        sw = keys[i_] > keys[j_]
                        keys[i_], keys[j_] = (
                            jnp.where(sw, keys[j_], keys[i_]),
                            jnp.where(sw, keys[i_], keys[j_]),
                        )
                        codes[i_], codes[j_] = (
                            jnp.where(sw, codes[j_], codes[i_]),
                            jnp.where(sw, codes[i_], codes[j_]),
                        )

                    for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                        cswap(a, b)
                    if lv == 4:
                        acc = acc + jnp.sum(keys[0]) + jnp.float32(
                            jnp.sum(codes[0])
                        )
                if lv >= 5:  # stack
                    sp2 = sp_ref[:]
                    was_int = ch_hit[0] | ch_hit[1]
                    for c in range(AR - 1, 0, -1):
                        pm = (keys[c] < 1e30) & was_int
                        stack_ref[:] = jnp.where(
                            (iota_cols == sp2) & pm, codes[c], stack_ref[:]
                        )
                        sp2 = sp2 + pm.astype(jnp.int32)
                    spm = jnp.maximum(sp2 - 1, 0)
                    popped = jnp.sum(
                        jnp.where(iota_cols == spm, stack_ref[:], 0),
                        axis=1,
                        keepdims=True,
                    )
                    sp_ref[:] = jnp.where(was_int, spm, sp2)
                    acc = acc + jnp.float32(jnp.sum(popped))
                return acc

            acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        def _bc(col):
            rep = pltpu.repeat(col, PS, axis=0)
            return jnp.broadcast_to(rep, (K * PS, 128))

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, 32), jnp.float32),
                    pltpu.VMEM((K, 1), jnp.int32),
                    pltpu.VMEM((K, DEPTH), jnp.int32),
                    pltpu.VMEM((K, 1), jnp.int32),
                    pltpu.VMEM((K * PS, 128), jnp.float32),
                    pltpu.VMEM((K * PS, 128), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
            )(tab)

        return run

    def make_variant(name):
        lanemaj = name in ("lanemaj", "psfold", "bf16")
        psfold = name in ("psfold", "bf16")
        bf16 = name == "bf16"
        cdt = jnp.bfloat16 if bf16 else jnp.float32
        big = jnp.bfloat16(1e30) if bf16 else 1e30

        def kernel(tab_ref, o_ref, nrow, vidx, stack_ref, sp_ref, wa, wb):
            vidx[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) * 977) % N
            if lanemaj:
                stack_ref[:] = jnp.zeros((DEPTH, K), jnp.int32)
                sp_ref[:] = jnp.zeros((1, K), jnp.int32)
                iota_rows = jax.lax.broadcasted_iota(jnp.int32, (DEPTH, K), 0)
            else:
                stack_ref[:] = jnp.zeros((K, DEPTH), jnp.int32)
                sp_ref[:] = jnp.zeros((K, 1), jnp.int32)
                iota_cols = jax.lax.broadcasted_iota(jnp.int32, (K, DEPTH), 1)
            wa[:] = jnp.ones((K * PS, 128), cdt)
            wb[:] = jnp.full((K * PS, 128), 0.5, cdt)

            def body(i, s):
                vidx[:] = jax.lax.rem(vidx[:] + i, N)
                for k in range(K):
                    c = vidx[k, 0]
                    r = jax.lax.rem(c + i, N)
                    nrow[pl.ds(k, 1), :] = tab_ref[pl.ds(r, 1), :]
                acc = s
                rows = nrow[:]
                if bf16:
                    # one (K,32) convert per iteration; boxes ride bf16
                    # from here on (production: values pre-expanded so the
                    # cast is exact and the test conservative)
                    rows_b = rows.astype(jnp.bfloat16)
                else:
                    rows_b = rows
                cols = [_bc(rows_b[:, c : c + 1]) for c in range(AR * 6)]
                ox, ix, tmn, tcap = wa[:], wb[:], cdt(0.0), big
                keys_k = []
                for c in range(AR):
                    t0 = (cols[6 * c + 0] - ox) * ix
                    t1 = (cols[6 * c + 3] - ox) * ix
                    u0 = (cols[6 * c + 1] - ox) * ix
                    u1 = (cols[6 * c + 4] - ox) * ix
                    v0 = (cols[6 * c + 2] - ox) * ix
                    v1 = (cols[6 * c + 5] - ox) * ix
                    tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                    un, uf = jnp.minimum(u0, u1), jnp.maximum(u0, u1)
                    vn, vf = jnp.minimum(v0, v1), jnp.maximum(v0, v1)
                    entry = jnp.maximum(jnp.maximum(tn, un), jnp.maximum(vn, tmn))
                    exit_ = jnp.minimum(jnp.minimum(tf, uf), jnp.minimum(vf, tcap))
                    hit = entry <= exit_
                    # FUSED: one min-reduce yields key (1e30 = miss)
                    eb = jnp.where(hit, entry, big)
                    if psfold:
                        # pre-fold the PS sub-rows (cheap (K,128) vreg mins)
                        # BEFORE the expensive lane-reduce tree: the shuffle
                        # tree then runs on (K,128), not (K*PS,128)
                        f = eb[:K]
                        for p in range(1, PS):
                            f = jnp.minimum(f, eb[p * K : (p + 1) * K])
                        keys_k.append(jnp.min(f, axis=1).reshape(K, 1))
                    else:
                        el = jnp.min(eb, axis=1)
                        keys_k.append(
                            jnp.min(el.reshape(PS, K), axis=0).reshape(K, 1)
                        )
                if lanemaj:
                    keysT = jnp.concatenate(keys_k, axis=1).T  # (AR, K)
                    codesT = pltpu.bitcast(rows[:, 24 : 24 + AR], jnp.int32).T
                    keys = [keysT[c : c + 1, :] for c in range(AR)]
                    codes = [codesT[c : c + 1, :] for c in range(AR)]
                else:
                    keys = keys_k
                    codes = [
                        pltpu.bitcast(rows[:, 24 + c : 25 + c], jnp.int32)
                        for c in range(AR)
                    ]

                def cswap(i_, j_):
                    sw = keys[i_] > keys[j_]
                    keys[i_], keys[j_] = (
                        jnp.where(sw, keys[j_], keys[i_]),
                        jnp.where(sw, keys[i_], keys[j_]),
                    )
                    codes[i_], codes[j_] = (
                        jnp.where(sw, codes[j_], codes[i_]),
                        jnp.where(sw, codes[i_], codes[j_]),
                    )

                for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                    cswap(a, b)

                sp2 = sp_ref[:]
                was_int = keys[0] < big  # stand-in mask, same shape class
                iota = iota_rows if lanemaj else iota_cols
                for c in range(AR - 1, 0, -1):
                    pm = (keys[c] < big) & was_int
                    stack_ref[:] = jnp.where(
                        (iota == sp2) & pm, codes[c], stack_ref[:]
                    )
                    sp2 = sp2 + pm.astype(jnp.int32)
                spm = jnp.maximum(sp2 - 1, 0)
                popped = jnp.sum(
                    jnp.where(iota == spm, stack_ref[:], 0),
                    axis=0 if lanemaj else 1,
                    keepdims=True,
                )
                sp_ref[:] = jnp.where(was_int, spm, sp2)
                acc = (
                    acc
                    + jnp.float32(jnp.sum(popped))
                    + jnp.sum(keys[0].astype(jnp.float32))
                )
                return acc

            acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        def _bc(col):
            rep = pltpu.repeat(col, PS, axis=0)
            return jnp.broadcast_to(rep, (K * PS, 128))

        stack_shape = (DEPTH, K) if lanemaj else (K, DEPTH)
        sp_shape = (1, K) if lanemaj else (K, 1)
        work_dt = jnp.bfloat16 if bf16 else jnp.float32

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, 32), jnp.float32),
                    pltpu.VMEM((K, 1), jnp.int32),
                    pltpu.VMEM(stack_shape, jnp.int32),
                    pltpu.VMEM(sp_shape, jnp.int32),
                    pltpu.VMEM((K * PS, 128), work_dt),
                    pltpu.VMEM((K * PS, 128), work_dt),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
            )(tab)

        return run

    tab = jnp.ones((N, 32), jnp.float32)
    prev = None
    for level in LEVELS:
        t = bench(lambda f=make(level): f(tab), n=3)
        ns = t / ITERS * 1e9
        d = f" (+{ns - prev:6.0f})" if prev is not None else ""
        print(f"step[{level:7s}]: {ns:7.0f} ns/iter{d}", flush=True)
        prev = ns
    for name in VARIANTS:
        try:
            t = bench(lambda f=make_variant(name): f(tab), n=3)
        except Exception as e:  # compile failures are data too
            print(f"step[{name:7s}]: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        ns = t / ITERS * 1e9
        print(f"step[{name:7s}]: {ns:7.0f} ns/iter (vs stack {prev:.0f})", flush=True)
    return 0


def cmd_step2() -> int:
    """Round-5 attribution of the POST-psfold node step: the r4 additive
    ladder priced blocks as they were added; this one prices what REMAINS
    by removing blocks from the shipped psfold pipeline one at a time
    (upper bound on each block's savings), plus two reformulations of the
    per-child packet reduce — the largest survivor:

      full     - the shipped pipeline (fused keys + psfold + lane-major)
      nofetch  - per-slot row-copy loop removed (rows = previous scratch)
      noslab   - bcast+slab math removed (keys faked from row columns)
      nored    - lane-reduce trees removed (keys faked, slab kept)
      nosort   - sorting network removed
      nostack  - stack pushes/pop removed
      xpose    - reduce via (K,128)->(128,K) transpose + 7-step sublane
                 halving min tree -> (1,K) DIRECTLY lane-major (kills both
                 the cross-lane shuffle tree and the later (K,AR)->(AR,K)
                 transpose)
      stacked  - ONE reduce over the 4 children concatenated sublane-wise
                 (4K,128) -> (4K,1) -> reshape (AR,K)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 200_000
    N, K, PS, DEPTH, AR = 60_000, 64, 2, 48, 4

    def make(fetch=True, slab=True, red="psfold", sort=True, stack=True):
        def kernel(tab_ref, o_ref, nrow, vidx, stack_ref, sp_ref, wa, wb):
            vidx[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) * 977) % N
            stack_ref[:] = jnp.zeros((DEPTH, K), jnp.int32)
            sp_ref[:] = jnp.zeros((1, K), jnp.int32)
            iota_rows = jax.lax.broadcasted_iota(jnp.int32, (DEPTH, K), 0)
            wa[:] = jnp.ones((K * PS, 128), jnp.float32)
            wb[:] = jnp.full((K * PS, 128), 0.5, jnp.float32)

            def body(i, s):
                vidx[:] = jax.lax.rem(vidx[:] + i, N)
                if fetch:
                    for k in range(K):
                        c = vidx[k, 0]
                        r = jax.lax.rem(c + i, N)
                        nrow[pl.ds(k, 1), :] = tab_ref[pl.ds(r, 1), :]
                acc = s
                rows = nrow[:]
                folded = []
                if slab:
                    cols = [_bc(rows[:, c : c + 1]) for c in range(AR * 6)]
                    ox, ix = wa[:], wb[:]
                    for c in range(AR):
                        t0 = (cols[6 * c + 0] - ox) * ix
                        t1 = (cols[6 * c + 3] - ox) * ix
                        u0 = (cols[6 * c + 1] - ox) * ix
                        u1 = (cols[6 * c + 4] - ox) * ix
                        v0 = (cols[6 * c + 2] - ox) * ix
                        v1 = (cols[6 * c + 5] - ox) * ix
                        tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                        un, uf = jnp.minimum(u0, u1), jnp.maximum(u0, u1)
                        vn, vf = jnp.minimum(v0, v1), jnp.maximum(v0, v1)
                        entry = jnp.maximum(jnp.maximum(tn, un), jnp.maximum(vn, 0.0))
                        exit_ = jnp.minimum(jnp.minimum(tf, uf), jnp.minimum(vf, 1e30))
                        eb = jnp.where(entry <= exit_, entry, 1e30)
                        # psfold: cheap (K,128) vreg mins over the PS sub-rows
                        f = eb[:K]
                        for p in range(1, PS):
                            f = jnp.minimum(f, eb[p * K : (p + 1) * K])
                        folded.append(f)
                if red == "none" or not slab:
                    # fake lane-major keys straight from row columns: one
                    # (K,AR) slice + transpose (prices everything downstream
                    # without the reduce trees)
                    keysT = rows[:, 0:AR].T
                    keys = [keysT[c : c + 1, :] for c in range(AR)]
                    if slab:
                        # keep the folded values live so slab math isn't DCE'd
                        acc = acc + folded[0][0, 0]
                elif red == "psfold":
                    keys_k = [
                        jnp.min(folded[c], axis=1).reshape(K, 1) for c in range(AR)
                    ]
                    keysT = jnp.concatenate(keys_k, axis=1).T  # (AR,K)
                    keys = [keysT[c : c + 1, :] for c in range(AR)]
                elif red == "xpose":
                    keys = []
                    for c in range(AR):
                        ft = folded[c].T  # (128,K)
                        m = 128
                        while m > 1:
                            m //= 2
                            ft = jnp.minimum(ft[:m], ft[m : 2 * m])
                        keys.append(ft)  # (1,K)
                elif red == "stacked":
                    cat = jnp.concatenate(folded, axis=0)  # (AR*K,128)
                    el = jnp.min(cat, axis=1, keepdims=True)  # (AR*K,1)
                    keysT = el.reshape(AR, K)
                    keys = [keysT[c : c + 1, :] for c in range(AR)]
                else:
                    raise ValueError(red)
                codesT = pltpu.bitcast(rows[:, 24 : 24 + AR], jnp.int32).T
                codes = [codesT[c : c + 1, :] for c in range(AR)]

                if sort:
                    def cswap(i_, j_):
                        sw = keys[i_] > keys[j_]
                        keys[i_], keys[j_] = (
                            jnp.where(sw, keys[j_], keys[i_]),
                            jnp.where(sw, keys[i_], keys[j_]),
                        )
                        codes[i_], codes[j_] = (
                            jnp.where(sw, codes[j_], codes[i_]),
                            jnp.where(sw, codes[i_], codes[j_]),
                        )

                    for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                        cswap(a, b)

                was_int = keys[0] < 1e30
                if stack:
                    sp2 = sp_ref[:]
                    for c in range(AR - 1, 0, -1):
                        pm = (keys[c] < 1e30) & was_int
                        stack_ref[:] = jnp.where(
                            (iota_rows == sp2) & pm, codes[c], stack_ref[:]
                        )
                        sp2 = sp2 + pm.astype(jnp.int32)
                    spm = jnp.maximum(sp2 - 1, 0)
                    popped = jnp.sum(
                        jnp.where(iota_rows == spm, stack_ref[:], 0),
                        axis=0,
                        keepdims=True,
                    )
                    sp_ref[:] = jnp.where(was_int, spm, sp2)
                    acc = acc + jnp.float32(jnp.sum(popped))
                acc = (
                    acc
                    + jnp.sum(keys[0].astype(jnp.float32))
                    + jnp.float32(jnp.sum(codes[0]))
                )
                return acc

            acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        def _bc(col):
            rep = pltpu.repeat(col, PS, axis=0)
            return jnp.broadcast_to(rep, (K * PS, 128))

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, 32), jnp.float32),
                    pltpu.VMEM((K, 1), jnp.int32),
                    pltpu.VMEM((DEPTH, K), jnp.int32),
                    pltpu.VMEM((1, K), jnp.int32),
                    pltpu.VMEM((K * PS, 128), jnp.float32),
                    pltpu.VMEM((K * PS, 128), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
            )(tab)

        return run

    tab = jnp.ones((N, 32), jnp.float32)
    cases = [
        ("full", {}),
        ("nofetch", dict(fetch=False)),
        ("noslab", dict(slab=False)),
        ("nored", dict(red="none")),
        ("nosort", dict(sort=False)),
        ("nostack", dict(stack=False)),
        ("xpose", dict(red="xpose")),
        ("stacked", dict(red="stacked")),
    ]
    base = None
    for name, kw in cases:
        try:
            t = bench(lambda f=make(**kw): f(tab), n=3)
        except Exception as e:  # compile failures are data too
            print(f"step2[{name:8s}]: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        ns = t / ITERS * 1e9
        d = "" if base is None else f" (vs full {base - ns:+6.0f})"
        print(f"step2[{name:8s}]: {ns:7.0f} ns/iter{d}", flush=True)
        if base is None:
            base = ns
    return 0


def cmd_step3() -> int:
    """SLOT-LANE layout spike (round 5): slots live on LANES (K=128, one
    per lane), a packet's rays on SUBLANES — the working block per
    coordinate is (S, K). Consequences vs the shipped sublane-slot layout:
      - the per-child packet reduce becomes a SUBLANE halving tree
        (elementwise mins on shrinking row counts) that lands DIRECTLY as
        a (1, K) lane-major key — no cross-lane shuffle tree, no
        (K,arity)->(arity,K) transpose (step2 priced the reduces at
        ~538 ns of the 1341 ns step, 40%);
      - box-column broadcasts become sublane broadcasts of (1, K) rows
        (one transposed (row_w, K) node-row matrix per iteration);
      - sortnet/stack/pop shapes are unchanged ((1,K)/(depth,K)) but K
        doubles to fill the 128 lanes.
    Prices the full node step at S=128/256/512 per 16K rays against the
    step2 'full' number (1341 ns at K=64 ps=2 = 16K rays).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 200_000
    N, K, DEPTH, AR = 60_000, 128, 48, 4
    ROW_W = 32

    def make(S, fetch=True, xpose=True, slab=True, red=True, stackon=True,
             tree="halve", xmode="t", slabmode="base"):
        def kernel(tab_ref, o_ref, nrow, nrow_t, vidx, stack_ref, sp_ref, wa, wb):
            vidx[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) * 977) % N
            stack_ref[:] = jnp.zeros((DEPTH, K), jnp.int32)
            sp_ref[:] = jnp.zeros((1, K), jnp.int32)
            iota_rows = jax.lax.broadcasted_iota(jnp.int32, (DEPTH, K), 0)
            wa[:] = jnp.ones((S, K), jnp.float32)
            wb[:] = jnp.full((S, K), 0.5, jnp.float32)

            def body(i, s):
                vidx[:] = jax.lax.rem(vidx[:] + i, N)
                if fetch:
                    for k in range(K):
                        c = vidx[k, 0]
                        r = jax.lax.rem(c + i, N)
                        nrow[pl.ds(k, 1), :] = tab_ref[pl.ds(r, 1), :]
                acc = s
                if xpose:
                    # ONE transpose per iteration: node rows to lane-major
                    if xmode == "mxu":
                        # transpose as an MXU contraction with an identity:
                        # dot_general(X(K,W), I(K,K), contract dim0 x dim0)
                        # -> (W, K) = X.T
                        nrow_t[:] = jax.lax.dot_general(
                            nrow[:], jnp.eye(K, dtype=jnp.float32),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        nrow_t[:] = nrow[:].T  # (ROW_W, K)
                rt = nrow_t[:]
                ox, ix = wa[:], wb[:]

                def bc(c):
                    return jnp.broadcast_to(rt[c : c + 1, :], (S, K))

                # loop-invariant per-ray precompute (slabmode="fma"):
                # t = box*inv - o*inv, so hoist oix = ox*ix once and the
                # per-plane distance is one FMA with an implicitly
                # broadcast (1,K) box row instead of bcast+sub+mul.
                oix = ox * ix
                if slabmode == "bf16":
                    # packed-bf16 slab: boxes + ray state in bfloat16, the
                    # compare/where and reduce in f32 (conservative box
                    # rounding would preserve correctness in the real
                    # kernel — this prices whether Mosaic runs packed
                    # bf16 elementwise at 2x f32 rate)
                    rt16 = rt.astype(jnp.bfloat16)
                    ox16, ix16 = ox.astype(jnp.bfloat16), ix.astype(jnp.bfloat16)

                keys = []
                if slab:
                    for c in range(AR):
                        if slabmode == "bf16":
                            def bc16(cc):
                                return jnp.broadcast_to(
                                    rt16[cc : cc + 1, :], (S, K)
                                )
                            t0 = (bc16(6 * c + 0) - ox16) * ix16
                            t1 = (bc16(6 * c + 3) - ox16) * ix16
                            u0 = (bc16(6 * c + 1) - ox16) * ix16
                            u1 = (bc16(6 * c + 4) - ox16) * ix16
                            v0 = (bc16(6 * c + 2) - ox16) * ix16
                            v1 = (bc16(6 * c + 5) - ox16) * ix16
                            tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                            un, uf = jnp.minimum(u0, u1), jnp.maximum(u0, u1)
                            vn, vf = jnp.minimum(v0, v1), jnp.maximum(v0, v1)
                            zero16 = jnp.bfloat16(0.0)
                            big16 = jnp.bfloat16(1e30)
                            entry = jnp.maximum(
                                jnp.maximum(tn, un), jnp.maximum(vn, zero16)
                            )
                            exit_ = jnp.minimum(
                                jnp.minimum(tf, uf), jnp.minimum(vf, big16)
                            )
                            eb = jnp.where(
                                entry <= exit_, entry, big16
                            ).astype(jnp.float32)
                        elif slabmode == "fma":
                            t0 = rt[6 * c + 0 : 6 * c + 1, :] * ix - oix
                            t1 = rt[6 * c + 3 : 6 * c + 4, :] * ix - oix
                            u0 = rt[6 * c + 1 : 6 * c + 2, :] * ix - oix
                            u1 = rt[6 * c + 4 : 6 * c + 5, :] * ix - oix
                            v0 = rt[6 * c + 2 : 6 * c + 3, :] * ix - oix
                            v1 = rt[6 * c + 5 : 6 * c + 6, :] * ix - oix
                        else:
                            t0 = (bc(6 * c + 0) - ox) * ix
                            t1 = (bc(6 * c + 3) - ox) * ix
                            u0 = (bc(6 * c + 1) - ox) * ix
                            u1 = (bc(6 * c + 4) - ox) * ix
                            v0 = (bc(6 * c + 2) - ox) * ix
                            v1 = (bc(6 * c + 5) - ox) * ix
                        if slabmode != "bf16":
                            tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
                            un, uf = jnp.minimum(u0, u1), jnp.maximum(u0, u1)
                            vn, vf = jnp.minimum(v0, v1), jnp.maximum(v0, v1)
                            entry = jnp.maximum(
                                jnp.maximum(tn, un), jnp.maximum(vn, 0.0)
                            )
                            exit_ = jnp.minimum(
                                jnp.minimum(tf, uf), jnp.minimum(vf, 1e30)
                            )
                            eb = jnp.where(entry <= exit_, entry, 1e30)
                        if not red:
                            acc = acc + eb[0, 0]
                            continue
                        # sublane halving tree -> (1, K) lane-major key
                        if tree == "halve":
                            m = S
                            while m > 1:
                                m //= 2
                                eb = jnp.minimum(eb[:m], eb[m : 2 * m])
                        elif tree == "min8":
                            # halve only to one sublane tile (8 rows), let
                            # Mosaic finish with its native sublane reduce
                            # (the sub-tile halvings measured ~100 ns EACH)
                            m = S
                            while m > 8:
                                m //= 2
                                eb = jnp.minimum(eb[:m], eb[m : 2 * m])
                            eb = jnp.min(eb, axis=0, keepdims=True)
                        elif tree == "roll8":
                            m = S
                            while m > 8:
                                m //= 2
                                eb = jnp.minimum(eb[:m], eb[m : 2 * m])
                            for sh in (4, 2, 1):
                                eb = jnp.minimum(
                                    eb, pltpu.roll(eb, shift=sh, axis=0)
                                )
                            eb = eb[0:1]
                        else:
                            raise ValueError(tree)
                        keys.append(eb)
                if not keys:
                    keys = [rt[c : c + 1, :] for c in range(AR)]
                codes = [
                    pltpu.bitcast(rt[24 + c : 25 + c, :], jnp.int32)
                    for c in range(AR)
                ]

                def cswap(i_, j_):
                    sw = keys[i_] > keys[j_]
                    keys[i_], keys[j_] = (
                        jnp.where(sw, keys[j_], keys[i_]),
                        jnp.where(sw, keys[i_], keys[j_]),
                    )
                    codes[i_], codes[j_] = (
                        jnp.where(sw, codes[j_], codes[i_]),
                        jnp.where(sw, codes[i_], codes[j_]),
                    )

                for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                    cswap(a, b)

                was_int = keys[0] < 1e30
                if stackon:
                    sp2 = sp_ref[:]
                    for c in range(AR - 1, 0, -1):
                        pm = (keys[c] < 1e30) & was_int
                        stack_ref[:] = jnp.where(
                            (iota_rows == sp2) & pm, codes[c], stack_ref[:]
                        )
                        sp2 = sp2 + pm.astype(jnp.int32)
                    spm = jnp.maximum(sp2 - 1, 0)
                    popped = jnp.sum(
                        jnp.where(iota_rows == spm, stack_ref[:], 0),
                        axis=0,
                        keepdims=True,
                    )
                    sp_ref[:] = jnp.where(was_int, spm, sp2)
                    acc = acc + jnp.float32(jnp.sum(popped))
                acc = (
                    acc
                    + jnp.sum(keys[0].astype(jnp.float32))
                    + jnp.float32(jnp.sum(codes[0]))
                )
                return acc

            acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        @jax.jit
        def run(tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, ROW_W), jnp.float32),
                    pltpu.VMEM((ROW_W, K), jnp.float32),
                    pltpu.VMEM((K, 1), jnp.int32),
                    pltpu.VMEM((DEPTH, K), jnp.int32),
                    pltpu.VMEM((1, K), jnp.int32),
                    pltpu.VMEM((S, K), jnp.float32),
                    pltpu.VMEM((S, K), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
            )(tab)

        return run

    tab = jnp.ones((N, ROW_W), jnp.float32)
    cases = [("S128", dict(S=128)), ("S256", dict(S=256)), ("S512", dict(S=512))]
    if len(sys.argv) > 2 and sys.argv[2] == "attr":
        cases = [
            ("S256", dict(S=256)),
            ("nofetch", dict(S=256, fetch=False)),
            ("noxpose", dict(S=256, xpose=False)),
            ("noslab", dict(S=256, slab=False)),
            ("nored", dict(S=256, red=False)),
            ("nostack", dict(S=256, stackon=False)),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "red":
        cases = [
            ("S256", dict(S=256)),
            ("min8", dict(S=256, tree="min8")),
            ("roll8", dict(S=256, tree="roll8")),
            ("mxpose", dict(S=256, tree="min8", xmode="mxu")),
            ("S512min8", dict(S=512, tree="min8")),
            ("S1024m8", dict(S=1024, tree="min8")),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "opt":
        cases = [
            ("S512", dict(S=512)),
            ("S512fma", dict(S=512, slabmode="fma")),
            ("S1024fma", dict(S=1024, slabmode="fma")),
            ("S256fma", dict(S=256, slabmode="fma")),
            ("attr_nosl", dict(S=512, slab=False)),
            ("attr_nost", dict(S=512, stackon=False, slabmode="fma")),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "bf16":
        cases = [
            ("S512", dict(S=512)),
            ("S512bf16", dict(S=512, slabmode="bf16")),
            ("S256bf16", dict(S=256, slabmode="bf16")),
            ("S64", dict(S=64)),
            ("S128", dict(S=128)),
        ]
    base = None
    for name, kw in cases:
        try:
            t = bench(lambda f=make(**kw): f(tab), n=3)
        except Exception as e:
            print(f"step3[{name:8s}]: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        ns = t / ITERS * 1e9
        rays = kw["S"] * K
        d = "" if base is None else f" (vs S256 {base - ns:+6.0f})"
        print(
            f"step3[{name:8s}]: {ns:7.0f} ns/iter  rays/iter={rays}"
            f"  ns/16K rays={ns * 16384 / rays:7.0f}{d}",
            flush=True,
        )
        if base is None:
            base = ns
    return 0


def cmd_hall(subdiv: int) -> int:
    import jax
    import jax.numpy as jnp

    from chameleonrt_tpu.engine.device_scene import build_device_scene
    from chameleonrt_tpu.engine.trace_bvh import build_blas_set, _closest_table
    from chameleonrt_tpu.ops import camera as camera_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops import traverse
    from chameleonrt_tpu.ops import traverse_packet as tp
    from chameleonrt_tpu.scene.loader import load_scene

    W, H = 1280, 720
    R = W * H
    scene = load_scene(f"proc://hall?subdiv={subdiv}")
    flat, meta, host = build_device_scene(scene, want_host=True)
    flat = flat._replace(blas=build_blas_set(flat, meta, host))
    pbvh = _closest_table(flat.blas[0])
    pbvh_any = flat.blas[0].any  # occlusion runs the BVH4 table
    print(
        f"device={jax.devices()[0].device_kind} closest arity={pbvh.arity} "
        f"nodes={pbvh.nodes.shape} leaves={pbvh.leaf_rows.shape} L={pbvh.leaf_size} "
        f"any arity={pbvh_any.arity} nodes={pbvh_any.nodes.shape}",
        flush=True,
    )

    cam = scene.cameras[0]
    d = cam.center - cam.position
    d = d / np.linalg.norm(d)
    view = camera_ops.compute_view_params(cam.position, d, cam.up, cam.fov_y, W, H)
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.reshape(-1).astype(jnp.uint32)
    py = ys.reshape(-1).astype(jnp.uint32)
    state = rng_ops.get_rng((px + py * W).astype(jnp.uint32), np.uint32(1))
    _, orig0, dir0 = camera_ops.generate_primary_rays(
        view, px, py, float(W), float(H), state
    )
    act0 = jnp.ones((R,), bool)
    perm, _ = traverse.ray_sort_perm(orig0, dir0, act0)
    orig0, dir0 = orig0[perm], dir0[perm]
    tmin0 = jnp.zeros((R,), jnp.float32)

    t0_, p0_, _, _ = jax.jit(
        lambda: tp.traverse_closest_persistent(pbvh, orig0, dir0, tmin0, act0)
    )()
    hitm = np.asarray(p0_) >= 0
    hp = np.asarray(orig0) + np.asarray(t0_)[:, None] * np.asarray(dir0) * 0.999
    rngn = np.random.default_rng(7)
    zax = rngn.normal(size=(R, 3)).astype(np.float32)
    zax /= np.maximum(np.linalg.norm(zax, axis=1, keepdims=True), 1e-6)
    o1, d1 = jnp.asarray(hp), jnp.asarray(zax)
    act1 = jnp.asarray(hitm)
    p1s, _ = traverse.ray_sort_perm(o1, d1, act1)
    o1, d1, act1 = o1[p1s], d1[p1s], act1[p1s]
    tmin1 = jnp.full((R,), 1e-4, jnp.float32)

    waves = (("b0", orig0, dir0, tmin0, act0), ("b1", o1, d1, tmin1, act1))

    # Timing method: repeat the kernel REPS times INSIDE one jit (tmin
    # perturbed per rep to defeat CSE; result summed to one scalar) and
    # difference two rep counts — the noisy ~30-180 ms dispatch+readback
    # floor of this tunneled host cancels exactly, leaving pure kernel
    # time. Arrays are passed as jit ARGUMENTS (closures would bake them
    # into the HLO as constants).
    HI, LO = 3, 1

    def diff_ms(mk):
        t_hi = bench(mk(HI), n=3)
        t_lo = bench(mk(LO), n=3)
        return (t_hi - t_lo) / (HI - LO) * 1e3

    def probe_closest(label, kw):
        for name, o, dd, tmn, act in waves:

            def mk(reps):
                @jax.jit
                def f(bvh, o, dd, tmn, act):
                    acc = jnp.int32(0)
                    for r in range(reps):
                        _, p0, _, _ = tp.traverse_closest_persistent(
                            bvh, o, dd, tmn + jnp.float32(r) * 1e-6, act, **kw
                        )
                        acc = acc + jnp.sum(p0)
                    return acc

                return lambda: f(pbvh, o, dd, tmn, act)

            t = diff_ms(mk)
            it, useful = jax.jit(
                lambda o=o, dd=dd, tmn=tmn, act=act: tp.traverse_closest_persistent(
                    pbvh, o, dd, tmn, act, return_iters=True, **kw
                )
            )()
            it, useful = int(it), int(useful)
            kk = kw.get("k_slots") or tp.K
            print(
                f"{name} closest {label:22s} {t:8.1f} ms  iters={it:7d} "
                f"ns/it={t*1e6/max(it,1):7.0f}  useful={useful/max(it*kk,1)*100:5.1f}%",
                flush=True,
            )

    # essential set first (every variant costs ~3 tunnel compiles on a
    # cold cache); the ps/K sweep runs only with `hall <subdiv> sweep`
    probe_closest("base ps=2 K=64", {})
    os.environ["CHAMELEONRT_KERNEL_X2"] = "fetch"
    probe_closest("X2=fetch", {})
    del os.environ["CHAMELEONRT_KERNEL_X2"]
    if len(sys.argv) > 3 and sys.argv[3] == "sweep":
        probe_closest("ps=1 K=128", dict(p_sub=1, k_slots=128))
        probe_closest("ps=1", dict(p_sub=1))
        probe_closest("merged", dict(merged=True))
        probe_closest("K=128", dict(k_slots=128))
    if len(sys.argv) > 3 and sys.argv[3] == "stream":
        # the DMA-streamed (>VMEM) tier on the SAME wavefronts: isolates
        # the per-iteration cost of HBM row DMAs vs VMEM-resident tables
        probe_closest("stream", dict(stream=True))
        probe_any("stream", dict(stream=True))
    if len(sys.argv) > 3 and sys.argv[3] == "ps":
        # wider packets: per-iteration cost is ~a*K regardless of packet
        # width, so if coherent rays share visits, ps>2 cuts iterations
        # nearly linearly at +b*K*ps marginal cost (roofline consequence 3).
        # Round 5: the fewer-slots x wider-packets family (same resident
        # rays K*ps, a*K term shrunk 2-4x) that r4 never measured.
        probe_closest("ps=4 K=32", dict(p_sub=4, k_slots=32))
        probe_closest("ps=8 K=16", dict(p_sub=8, k_slots=16))
        probe_closest("ps=8 K=32", dict(p_sub=8, k_slots=32))
        probe_closest("ps=4 K=64", dict(p_sub=4))
        probe_closest("ps=16 K=16", dict(p_sub=16, k_slots=16))
    if len(sys.argv) > 3 and sys.argv[3] == "ps2":
        # round-5 follow-up: ps=4 K=64 won b1 (46.3 vs 50.7 ms; unions grow
        # x1.28 per width doubling, less than the cost ratio) — push the
        # same-slots wider-packets direction to its asymptote
        probe_closest("ps=8 K=64", dict(p_sub=8))
        probe_closest("ps=16 K=64", dict(p_sub=16))
        probe_closest("ps=8 K=128", dict(p_sub=8, k_slots=128))

    # any-hit: shadow-like wavefront from b0 hits toward a top light point
    lp = jnp.asarray([0.0, float(np.asarray(hp[:, 1]).max() + 1.0), 0.0], jnp.float32)
    sd = lp[None, :] - jnp.asarray(hp)
    dist = jnp.linalg.norm(sd, axis=1)
    sd = sd / dist[:, None]
    mask = jnp.asarray(hitm)
    sperm, _ = traverse.ray_sort_perm(jnp.asarray(hp), sd, mask)
    ho, hd, hdist, hmask = jnp.asarray(hp)[sperm], sd[sperm], dist[sperm], mask[sperm]
    tmin2 = jnp.full((R,), 1e-4, jnp.float32)

    def probe_any(label, kw):
        def mk(reps):
            @jax.jit
            def f(bvh, o, dd, tmn, tmx, act):
                acc = jnp.float32(0)
                for r in range(reps):
                    occ = tp.traverse_any_persistent(
                        bvh, o, dd, tmn + jnp.float32(r) * 1e-6, tmx, act, **kw
                    )
                    acc = acc + jnp.sum(occ.astype(jnp.float32))
                return acc

            return lambda: f(pbvh_any, ho, hd, tmin2, hdist, hmask)

        t = diff_ms(mk)
        it, useful = jax.jit(
            lambda: tp.traverse_any_persistent(
                pbvh_any, ho, hd, tmin2, hdist, hmask, return_iters=True, **kw
            )
        )()
        it, useful = int(it), int(useful)
        kk = kw.get("k_slots") or tp.K
        print(
            f"sh any     {label:22s} {t:8.1f} ms  iters={it:7d} "
            f"ns/it={t*1e6/max(it,1):7.0f}  useful={useful/max(it*kk,1)*100:5.1f}%",
            flush=True,
        )

    probe_any("base ps=2 K=64", {})
    if len(sys.argv) > 3 and sys.argv[3] == "ps":
        probe_any("ps=4 K=32", dict(p_sub=4, k_slots=32))
        probe_any("ps=8 K=16", dict(p_sub=8, k_slots=16))
        probe_any("ps=8 K=32", dict(p_sub=8, k_slots=32))
    if len(sys.argv) > 3 and sys.argv[3] == "ps2":
        probe_any("ps=4 K=64", dict(p_sub=4))
        probe_any("ps=8 K=64", dict(p_sub=8))
    else:
        os.environ["CHAMELEONRT_KERNEL_X2"] = "fetch"
        probe_any("X2=fetch", {})
        del os.environ["CHAMELEONRT_KERNEL_X2"]
    return 0


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "hall"
    if cmd == "peak":
        sys.exit(cmd_peak())
    if cmd == "fetch":
        sys.exit(cmd_fetch())
    if cmd == "step":
        sys.exit(cmd_step())
    if cmd == "step2":
        sys.exit(cmd_step2())
    if cmd == "step3":
        sys.exit(cmd_step3())
    if cmd == "gather":
        sys.exit(cmd_gather())
    sys.exit(cmd_hall(int(sys.argv[2]) if len(sys.argv) > 2 else 4))
