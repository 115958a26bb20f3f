"""Honest (chained-jit, CSE-proof) decomposition of the shading stage +
XLA row-gather throughput vs table size.

Parts:
  1. (R,16) row gather from tables of 1K..4M rows — is the ~12 ns/row
     cost flat or does it track table size (VMEM caching)?
  2. shade sub-stages at bench width on the textured hall:
     srow gather / unpack_material_row (textured) / disney math trio.

Usage: python -u scripts/gather_budget.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chameleonrt_tpu.utils import jaxcache  # noqa: E402,F401
from scripts._bench_util import chain_time  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    R = 921600
    rngn = np.random.default_rng(3)

    print(f"device={jax.devices()[0].device_kind} R={R}", flush=True)

    # --- 1. gather throughput vs table size
    # 4M rows (268 MB) exceeds the tunnel's program-upload limit (HTTP 413)
    sizes = (1024, 32768, 262144, 1048576)
    if os.environ.get("SKIP_SIZES"):
        sizes = ()
    for n_rows in sizes:
        table = jnp.asarray(
            rngn.normal(size=(n_rows, 16)).astype(np.float32)
        )
        idx0 = jnp.asarray(
            rngn.integers(0, n_rows, size=R, dtype=np.int32)
        )

        def mk(n, table=table, n_rows=n_rows):
            def f(idx):
                acc = jnp.float32(0)
                for _ in range(n):
                    rows = table[idx]
                    acc = acc + rows[:, 0].sum()
                    # new indices derived from gathered data: CSE-proof
                    idx = (
                        idx + jax.lax.bitcast_convert_type(
                            rows[:, 1], jnp.int32
                        )
                    ) % n_rows
                return acc + idx.sum()

            return jax.jit(f)

        t = chain_time(mk, (idx0,), n=6)
        mb = n_rows * 64 / 1e6
        print(
            f"row gather (R,16) from {n_rows:>8} rows ({mb:7.1f} MB): "
            f"{t*1e3:7.2f} ms = {t/R*1e9:5.1f} ns/row",
            flush=True,
        )

    # --- 2. shade sub-stages on the textured hall
    from chameleonrt_tpu.engine.device_scene import (
        build_device_scene,
        unpack_material_row,
    )
    from chameleonrt_tpu.ops import bsdf as bsdf_ops
    from chameleonrt_tpu.ops import rng as rng_ops
    from chameleonrt_tpu.ops.math import normalize, ortho_basis
    from chameleonrt_tpu.scene.loader import load_scene

    scene = load_scene("proc://hall?subdiv=4&textured=1")
    flat, meta, host = build_device_scene(scene, want_host=True)
    print(
        f"textured_fields={meta.textured_fields} "
        f"shade_rows={flat.shade_rows.shape} atlas={flat.atlas.atlas.shape}",
        flush=True,
    )

    n_srows = flat.shade_rows.shape[0]
    tri0 = jnp.asarray(rngn.integers(0, meta.num_tris, size=R, dtype=np.int32))
    uv0 = jnp.asarray(rngn.uniform(0, 1, size=(R, 2)).astype(np.float32))

    def mk_srow(n):
        def f(tri):
            acc = jnp.float32(0)
            for _ in range(n):
                srow = flat.shade_rows[tri]
                acc = acc + srow[:, 0].sum()
                tri = (
                    tri + jax.lax.bitcast_convert_type(srow[:, 1], jnp.int32)
                ) % n_srows
            return acc + tri.sum()

        return jax.jit(f)

    t = chain_time(mk_srow, (tri0,), n=6)
    print(f"shade_rows gather:       {t*1e3:7.2f} ms", flush=True)

    srow0 = flat.shade_rows[tri0]
    mrow0 = (
        srow0[:, 16:32] if flat.shade_rows.shape[1] >= 32 else srow0
    )

    def mk_unpack(n):
        def f(mrow, uv):
            acc = jnp.float32(0)
            for _ in range(n):
                mat = unpack_material_row(flat, meta, mrow, uv)
                acc = acc + mat.base_color.sum() + mat.roughness.sum()
                uv = jnp.mod(uv + mat.base_color[:, :2] * 0.01, 1.0)
            return acc

        return jax.jit(f)

    t = chain_time(mk_unpack, (mrow0, uv0), n=6)
    print(f"unpack_material_row(tex):{t*1e3:7.2f} ms", flush=True)

    # disney math trio, no gathers
    nrm = rngn.normal(size=(R, 3)).astype(np.float32)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-6)
    n_ = jnp.asarray(nrm)
    w_o0 = normalize(jnp.asarray(rngn.normal(size=(R, 3)).astype(np.float32)))
    state0 = rng_ops.get_rng(jnp.arange(R, dtype=jnp.uint32), np.uint32(1))
    mat0 = unpack_material_row(flat, meta, mrow0, uv0)
    mat0 = jax.tree_util.tree_map(jax.block_until_ready, mat0)

    def mk_disney(n):
        def f(state, w_o):
            v_x, v_y = ortho_basis(n_)
            acc = jnp.float32(0)
            for _ in range(n):
                state, _f, w_i, pdf = bsdf_ops.sample_disney_brdf(
                    mat0, n_, w_o, v_x, v_y, state
                )
                fr = bsdf_ops.disney_brdf(mat0, n_, w_o, w_i, v_x, v_y)
                p2 = bsdf_ops.disney_pdf(mat0, n_, w_o, w_i, v_x, v_y)
                acc = acc + fr.sum() + p2.sum() + pdf.sum()
                w_o = normalize(w_i + 1e-6)
            return acc + state.astype(jnp.float32).sum()

        return jax.jit(f)

    t = chain_time(mk_disney, (state0, w_o0), n=6)
    print(f"disney sample+brdf+pdf:  {t*1e3:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
