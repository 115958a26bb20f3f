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


def padded_height(fb_height: int, n_dev: int) -> int:
    """Rows per frame after padding H up to a multiple of the device count
    (every device renders the same shard shape; XLA needs static shapes)."""
    return -(-fb_height // n_dev) * n_dev


def make_sharded_render_step(
    meta: SceneMeta,
    trace_closest,
    trace_any,
    mesh: Mesh,
    fb_width: int,
    fb_height: int,
    spp: int,
    rebalance: bool = False,
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
    independent); only the device-time balance changes."""
    n_dev = mesh.devices.size
    shard_h = -(-fb_height // n_dev)

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
        # scale this device's ray count by its real (uncropped) rows so
        # padding never inflates rays/s
        real = jnp.clip(jnp.int32(fb_height) - row0.astype(jnp.int32), 0, shard_h)
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


def replicate_scene(flat: FlatScene, mesh: Mesh) -> FlatScene:
    """Place the scene replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), flat)


def shard_accum(accum, mesh: Mesh):
    return jax.device_put(accum, NamedSharding(mesh, P(AXIS, None, None)))
