"""Multi-chip rendering: pixel-row sharding over a `jax.sharding.Mesh`.

The TPU-native replacement for the reference's intra-node parallelism (TBB
tiles / SIMT megakernels, SURVEY.md §2.3): the framebuffer rows are sharded
across devices (embarrassingly parallel, like the reference's 64x64 tiles),
the scene is replicated, and ICI collectives do what a multi-GPU renderer
would use NCCL for — `psum` merges ray statistics, and the output framebuffer
stays row-sharded on device so readback gathers tonemapped sRGB8 tiles only.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chameleonrt_tpu.engine import path_tracer
from chameleonrt_tpu.engine.device_scene import FlatScene, SceneMeta
from chameleonrt_tpu.ops import camera as camera_ops

AXIS = "rows"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (AXIS,))


def padded_height(fb_height: int, n_dev: int, chunks: int = 1) -> int:
    """Rows per frame after padding H up to a multiple of the device count
    (every device renders the same shard shape; XLA needs static shapes).
    With row chunking each device's shard additionally divides into
    `chunks` equal launches, so H pads to a multiple of n_dev * chunks."""
    q = n_dev * max(1, chunks)
    return -(-fb_height // q) * q


def make_sharded_render_step(
    meta: SceneMeta,
    trace_closest,
    trace_any,
    mesh: Mesh,
    fb_width: int,
    fb_height: int,
    spp: int,
    rebalance: bool = False,
    chunks: int = 1,
):
    """Build a jitted SPMD render step: (flat, view, accum, frame_id) ->
    (accum', rays). `accum` is row-sharded (padded_height(H, n_dev), W, 3);
    the scene is replicated; rays is psum-reduced over ICI. When H does not
    divide over the mesh, the last device's rows past H wrap onto row 0
    (cheap, coherent), are excluded from the ray count, and are cropped at
    readback — callers allocate accum at padded_height().

    rebalance=True turns on mid-path active-ray redistribution
    (path_tracer._exchange_wavefront): per bounce, hypercube-paired devices
    ppermute a slice of the packed wavefront from the busier to the idler
    side; lanes carry global ids, and illumination is delivered by a
    psum_scatter of per-device partial frames instead of the local reshape.
    Images are bit-identical to rebalance=False (per-ray math is device-
    independent); only the device-time balance changes.

    chunks>1 splits each device's shard rows into that many separate
    device executions per frame (composing the single-device execution-
    wall workaround with sharding, VERDICT r3 #4): a traced row-offset
    argument keeps ONE compile for all chunks, and a final sharded
    assemble step concatenates each device's chunk rows locally and runs
    the progressive accumulation. Callers must allocate accum at
    padded_height(H, n_dev, chunks)."""
    n_dev = mesh.devices.size
    shard_h = padded_height(fb_height, n_dev, chunks) // n_dev
    if chunks > 1:
        return _make_sharded_chunked_step(
            meta, trace_closest, trace_any, mesh, fb_width, fb_height, spp,
            rebalance, chunks, shard_h,
        )

    def step_local(flat: FlatScene, view: camera_ops.ViewParams, accum, frame_id):
        row0 = jax.lax.axis_index(AXIS) * shard_h
        ys, xs = jnp.mgrid[0:shard_h, 0:fb_width]
        px = xs.reshape(-1).astype(jnp.uint32)
        py_raw = ys.reshape(-1) + row0
        py = (py_raw % max(fb_height, 1)).astype(jnp.uint32)
        if rebalance and n_dev > 1:
            # global lane ids index the PADDED frame (wrapped pad rows keep
            # their own slot so they never double-add into row 0)
            gids = (py_raw * fb_width + xs.reshape(-1)).astype(jnp.int32)
            part, rays = path_tracer.render_pixels(
                flat, meta, trace_closest, trace_any, view, frame_id,
                px, py, fb_width, fb_height, spp,
                scatter_ids=gids,
                scatter_rows=n_dev * shard_h * fb_width,
                rebalance_axis=AXIS,
                rebalance_n_dev=n_dev,
                # pad-row lanes are born dead: migrated rays execute (and
                # count) on a foreign device, so the crop scaling below
                # would mis-count them — instead no pad ray ever traces
                active0=py_raw < fb_height,
            )
            illum = jax.lax.psum_scatter(
                part, AXIS, scatter_dimension=0, tiled=True
            ).reshape(shard_h, fb_width, 3)
        else:
            illum, rays = path_tracer.render_pixels(
                flat,
                meta,
                trace_closest,
                trace_any,
                view,
                frame_id,
                px,
                py,
                fb_width,
                fb_height,
                spp,
            )
            illum = illum.reshape(shard_h, fb_width, 3)
        accum = path_tracer.progressive_accum(accum, illum, frame_id)
        if not (rebalance and n_dev > 1):
            # scale this device's ray count by its real (uncropped) rows so
            # padding never inflates rays/s (rebalance mode needs no crop:
            # pad lanes launch dead via active0 and count zero wherever
            # their packed rows migrate)
            real = jnp.clip(
                jnp.int32(fb_height) - row0.astype(jnp.int32), 0, shard_h
            )
            rays = rays * real // shard_h
        rays = jax.lax.psum(rays, AXIS)
        return accum, rays

    step = jax.jit(
        jax.shard_map(
            step_local,
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS, None, None), P()),
            out_specs=(P(AXIS, None, None), P()),
            # traversal while_loop carries start from device-invariant
            # constants (fresh stacks) and become row-varying inside the
            # loop; the strict varying-manual-axes checker rejects that
            # pattern, so disable it (semantics are unaffected).
            check_vma=False,
        ),
        donate_argnums=(2,),
    )
    return step


def _make_sharded_chunked_step(
    meta, trace_closest, trace_any, mesh, fb_width, fb_height, spp,
    rebalance, chunks, shard_h,
):
    """Row-chunked sharded rendering (see make_sharded_render_step). Each
    chunk is its own jitted SPMD execution (the remote-TPU worker kills
    executions past ~60 s; a big scene's full-shard frame would trip it);
    the assemble step runs device-local concatenation + accumulation."""
    n_dev = mesh.devices.size
    ch_h = shard_h // chunks

    def chunk_local(flat, view, frame_id, y_off):
        row0 = jax.lax.axis_index(AXIS) * shard_h + y_off
        ys, xs = jnp.mgrid[0:ch_h, 0:fb_width]
        px = xs.reshape(-1).astype(jnp.uint32)
        py_raw = ys.reshape(-1) + row0
        py = (py_raw % max(fb_height, 1)).astype(jnp.uint32)
        if rebalance and n_dev > 1:
            gids = (py_raw * fb_width + xs.reshape(-1)).astype(jnp.int32)
            # global partial frame covers the full padded height; scatter
            # ids use the uncropped row so pad rows keep their own slot
            part, rays = path_tracer.render_pixels(
                flat, meta, trace_closest, trace_any, view, frame_id,
                px, py, fb_width, fb_height, spp,
                scatter_ids=gids,
                scatter_rows=n_dev * shard_h * fb_width,
                rebalance_axis=AXIS,
                rebalance_n_dev=n_dev,
                active0=py_raw < fb_height,
            )
            # each device owns its SHARD (not chunk) of the global frame;
            # slice out this chunk's rows after the scatter-reduce
            shard_part = jax.lax.psum_scatter(
                part, AXIS, scatter_dimension=0, tiled=True
            ).reshape(shard_h, fb_width, 3)
            # every device renders the same y_off window of its shard, so
            # every lane's global id (migrated or not) falls inside some
            # device's [row0 + y_off, row0 + y_off + ch_h) rows — this
            # chunk's slice of the reduced shard holds all of them
            y0 = y_off.astype(jnp.int32)
            illum = jax.lax.dynamic_slice(
                shard_part, (y0, jnp.int32(0), jnp.int32(0)), (ch_h, fb_width, 3)
            )
        else:
            illum, rays = path_tracer.render_pixels(
                flat, meta, trace_closest, trace_any, view, frame_id,
                px, py, fb_width, fb_height, spp,
            )
            illum = illum.reshape(ch_h, fb_width, 3)
        if not (rebalance and n_dev > 1):
            # (rebalance counts exactly via born-dead pad lanes, see
            # make_sharded_render_step)
            real = jnp.clip(
                jnp.int32(fb_height)
                - (jax.lax.axis_index(AXIS) * shard_h + y_off).astype(jnp.int32),
                0,
                ch_h,
            )
            rays = rays * real // ch_h
        rays = jax.lax.psum(rays, AXIS)
        return illum, rays

    chunk_step = jax.jit(
        jax.shard_map(
            chunk_local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(AXIS, None, None), P()),
            check_vma=False,
        )
    )

    def assemble_local(accum, frame_id, *parts):
        illum = jnp.concatenate(parts, axis=0)  # (shard_h, W, 3)
        return path_tracer.progressive_accum(accum, illum, frame_id)

    assemble = jax.jit(
        jax.shard_map(
            assemble_local,
            mesh=mesh,
            in_specs=(P(AXIS, None, None), P()) + (P(AXIS, None, None),) * chunks,
            out_specs=P(AXIS, None, None),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    def render_step(flat, view, accum, frame_id):
        import numpy as np

        parts = []
        rays = jnp.int32(0)
        for c in range(chunks):
            illum_c, rays_c = chunk_step(flat, view, frame_id, np.uint32(c * ch_h))
            jax.block_until_ready(illum_c)  # separate device executions
            parts.append(illum_c)
            rays = rays + rays_c
        return assemble(accum, frame_id, *parts), rays

    return render_step


def replicate_scene(flat: FlatScene, mesh: Mesh) -> FlatScene:
    """Place the scene replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), flat)


def shard_accum(accum, mesh: Mesh):
    return jax.device_put(accum, NamedSharding(mesh, P(AXIS, None, None)))
