"""Shared backend machinery: device accumulation buffer, jitted progressive
render step, sRGB readback, RenderStats timing.

Mirrors the host-side responsibilities every reference backend repeats
(initialize/set_scene/render with camera-change accumulation reset,
render_backend.h:18-31; device-side frame timing; rays/s accounting under
REPORT_RAY_STATS, CMakeLists.txt:30). The accumulation buffer stays resident
on device; only the tonemapped sRGB8 image crosses to the host, and only when
the caller asks for readback.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chameleonrt_tpu.utils import jaxcache  # noqa: F401  (enables XLA cache)

from chameleonrt_tpu.core.backend import RenderBackend, RenderStats
from chameleonrt_tpu.engine import path_tracer
from chameleonrt_tpu.engine.device_scene import FlatScene, SceneMeta, build_device_scene
from chameleonrt_tpu.ops import camera as camera_ops
from chameleonrt_tpu.ops.tonemap import linear_to_srgb_u8
from chameleonrt_tpu.scene.types import Scene


class JaxRenderBackend(RenderBackend):
    """Base for jax-engine backends; subclasses provide trace functions."""

    #: whether to count rays (the REPORT_RAY_STATS equivalent); cheap, on by default
    report_ray_stats: bool = True

    def __init__(self, report_ray_stats: bool = True, devices: int = 0,
                 rebalance: bool = False):
        """devices: 0 = single-chip (default), -1 = all available devices,
        N > 1 = shard the framebuffer rows over min(N, available) devices
        via parallel.sharded (the product seam for SURVEY.md §2.3
        multi-chip: `-devices` CLI flag routes here). rebalance: with
        devices > 1, ppermute mid-path active-ray redistribution between
        hypercube-paired devices (`-rebalance` CLI flag)."""
        super().__init__()
        self.report_ray_stats = report_ray_stats
        self.devices_requested = devices
        self.rebalance = rebalance
        self.fb_width = 0
        self.fb_height = 0
        self.frame_id = 0
        self.flat: Optional[FlatScene] = None
        self.meta: Optional[SceneMeta] = None
        self._accum = None
        self._render_jit = None
        self._mesh = None
        self._tonemap_jit = jax.jit(linear_to_srgb_u8)

    def _n_devices(self) -> int:
        want = self.devices_requested
        if want in (0, 1):
            return 1
        avail = len(jax.devices())
        return avail if want < 0 else min(want, avail)

    def _sharded_chunks(self) -> int:
        """Row chunks per device shard under sharding: the execution wall
        is per device launch, and each device handles 1/n_dev of the frame,
        so the single-device chunk count divides by the mesh size."""
        n_dev = self._n_devices()
        return max(1, -(-self._render_chunks() // n_dev))

    def _accum_height(self) -> int:
        n_dev = self._n_devices()
        if n_dev <= 1:
            return self.fb_height
        from chameleonrt_tpu.parallel import sharded

        return sharded.padded_height(
            self.fb_height, n_dev, self._sharded_chunks()
        )

    def _fresh_accum(self):
        accum = jnp.zeros((self._accum_height(), self.fb_width, 3), jnp.float32)
        if self._mesh is not None:
            from chameleonrt_tpu.parallel import sharded

            accum = sharded.shard_accum(accum, self._mesh)
        return accum

    # -- subclass hook -------------------------------------------------------
    def make_trace_fns(self, meta: SceneMeta):
        raise NotImplementedError

    def prepare_scene(self, scene: Scene) -> Tuple[FlatScene, SceneMeta]:
        """Subclasses may extend (e.g. BVH build)."""
        return build_device_scene(scene)

    # -- RenderBackend contract ---------------------------------------------
    def initialize(self, fb_width: int, fb_height: int) -> None:
        self.fb_width = int(fb_width)
        self.fb_height = int(fb_height)
        self.img = np.zeros((self.fb_height, self.fb_width, 4), np.uint8)
        self._accum = None  # allocated on first render (may be sharded)
        self.frame_id = 0
        self._render_jit = None  # shape changed: respecialize

    def set_scene(self, scene: Scene) -> None:
        self.samples_per_pixel = int(scene.samples_per_pixel)
        self.flat, self.meta = self.prepare_scene(scene)
        self.frame_id = 0
        self._render_jit = None

    def _render_chunks(self) -> int:
        """Number of sequential device launches per frame. One launch for
        normal scenes; huge scenes split by framebuffer rows because the
        remote-TPU worker kills any single execution running past ~60 s
        (measured on a 2M-tri soup at 921K rays: 47 s passes, ~70 s
        'faults' — the round-1 '>1M-tri traversal fault' was this limit,
        not a kernel bug). Sized so each chunk stays well under the wall.
        Env CHAMELEONRT_CHUNKS overrides."""
        import os

        ov = os.environ.get("CHAMELEONRT_CHUNKS")
        if ov:
            try:
                return max(1, int(ov))
            except ValueError:
                raise ValueError(
                    f"CHAMELEONRT_CHUNKS must be an integer, got {ov!r}"
                ) from None
        T = self.meta.num_tris if self.meta is not None else 0
        if T <= 1_000_000:
            return 1
        # A chunk executes the FULL path loop (~5 closest + up to 10
        # occlusion passes), not one traversal, so size well under the
        # wall. With the packet kernels (incl. the DMA-streamed tier for
        # >VMEM tables) a full 230K-ray frame on a 6.7M-tri scene measures
        # ~2 s, so a few chunks give huge margin; the XLA gather fallback
        # is ~100x slower and keeps the fine 250K-tri split.
        from chameleonrt_tpu.engine.trace_bvh import _packet_enabled

        div = 2_000_000 if _packet_enabled() else 250_000
        return min(96, -(-T // div))

    def _build_render_fn(self):
        trace_closest, trace_any = self.make_trace_fns(self.meta)
        meta = self.meta
        W, H, spp = self.fb_width, self.fb_height, self.samples_per_pixel

        n_dev = self._n_devices()
        if n_dev > 1:
            # multi-chip: row-sharded SPMD step over a device mesh with
            # psum'd ray stats (SURVEY.md §2.3 — the would-be-NCCL slot).
            # Row chunking (the single-device execution-wall workaround)
            # composes with sharding: each device's shard splits into
            # _sharded_chunks() separate launches.
            from chameleonrt_tpu.parallel import sharded

            self._mesh = sharded.make_mesh(jax.devices()[:n_dev])
            self.flat = sharded.replicate_scene(self.flat, self._mesh)
            return sharded.make_sharded_render_step(
                meta, trace_closest, trace_any, self._mesh, W, H, spp,
                rebalance=self.rebalance,
                chunks=self._sharded_chunks(),
            )
        chunks = self._render_chunks()
        # Distinct per-backend program names so profiles and compile-cache
        # entries stay attributable when two backends jit their render
        # step in one process.
        tag = type(self).__name__

        if chunks == 1:

            def render_step(flat: FlatScene, view: camera_ops.ViewParams, accum, frame_id):
                ys, xs = jnp.mgrid[0:H, 0:W]
                px = xs.reshape(-1).astype(jnp.uint32)
                py = ys.reshape(-1).astype(jnp.uint32)
                illum, rays = path_tracer.render_pixels(
                    flat, meta, trace_closest, trace_any, view, frame_id,
                    px, py, W, H, spp,
                )
                illum = illum.reshape(H, W, 3)
                accum = path_tracer.progressive_accum(accum, illum, frame_id)
                return accum, rays

            render_step.__name__ = render_step.__qualname__ = f"render_step_{tag}"
            return jax.jit(render_step, donate_argnums=(2,))

        # Row-chunked frame: each chunk renders Hc rows in its own device
        # execution (one compile — every chunk shares the shape; H pads up).
        Hc = -(-H // chunks)

        def chunk_step(flat: FlatScene, view: camera_ops.ViewParams, frame_id, y0):
            ys, xs = jnp.mgrid[0:Hc, 0:W]
            px = xs.reshape(-1).astype(jnp.uint32)
            # rows past H wrap onto row 0: they render (cheaply, coherent)
            # and are dropped at assembly
            py = ((ys.reshape(-1).astype(jnp.uint32)) + y0) % jnp.uint32(max(H, 1))
            illum, rays = path_tracer.render_pixels(
                flat, meta, trace_closest, trace_any, view, frame_id,
                px, py, W, H, spp,
            )
            return illum.reshape(Hc, W, 3), rays

        chunk_step.__name__ = chunk_step.__qualname__ = f"chunk_step_{tag}"
        chunk_step = jax.jit(chunk_step)

        def accum_step(accum, illum, frame_id):
            return path_tracer.progressive_accum(accum, illum, frame_id)

        accum_step.__name__ = accum_step.__qualname__ = f"accum_step_{tag}"
        accum_step = jax.jit(accum_step, donate_argnums=(0,))

        def render_step(flat, view, accum, frame_id):
            parts = []
            rays = jnp.int32(0)
            for c in range(chunks):
                illum_c, rays_c = chunk_step(
                    flat, view, frame_id, np.uint32(c * Hc)
                )
                # block per chunk: keeps each device execution separate
                # (the whole point — one long execution trips the wall)
                jax.block_until_ready(illum_c)
                parts.append(illum_c)
                # the final chunk's rows past H wrap to row 0 and are
                # dropped at assembly — scale its ray count by its real
                # row coverage so rays/s is not inflated by the padding
                real_rows = min(Hc, H - c * Hc)
                if real_rows <= 0:
                    continue
                rays = rays + rays_c * real_rows // Hc
            illum = jnp.concatenate(parts, axis=0)[:H]
            return accum_step(accum, illum, frame_id), rays

        return render_step

    def render(
        self,
        pos,
        dir,
        up,
        fov_y: float,
        camera_changed: bool,
        readback_framebuffer: bool = True,
        defer_stats: bool = False,
    ) -> RenderStats:
        """defer_stats=True skips the per-frame device->host fetch of the
        ray counter (a full tunnel round trip, ~30-80 ms measured — pure
        measurement overhead a local host would not pay): rays_traced is
        returned as a lazy device scalar (int()/np.asarray it later, which
        synchronizes), render_time is dispatch time only, and frames
        pipeline back-to-back on device. Benchmark harnesses time the
        whole N-frame batch around one final synchronizing fetch."""
        if self.flat is None:
            raise RuntimeError("set_scene must be called before render")
        if camera_changed:
            self.frame_id = 0
        if self._render_jit is None:
            self._render_jit = self._build_render_fn()
        if self.frame_id == 0 or self._accum is None:
            self._accum = self._fresh_accum()

        view = camera_ops.compute_view_params(
            pos, dir, up, fov_y, self.fb_width, self.fb_height
        )
        t0 = time.perf_counter()
        # np scalar arg, not jnp: device-scalar captures/args trip the axon
        # tunnel's degraded ~26 ms/execution mode (scripts/capture_probe2.py)
        self._accum, rays = self._render_jit(
            self.flat, view, self._accum, np.uint32(self.frame_id)
        )
        if defer_stats:
            jax.block_until_ready(self._accum)
            dt = time.perf_counter() - t0
            stats = RenderStats(
                render_time=dt * 1e3,
                rays_per_second=0.0,
                rays_traced=rays if self.report_ray_stats else 0,
            )
            if readback_framebuffer:
                self.img = np.asarray(self._tonemap_jit(self._accum))[: self.fb_height]
            self.frame_id += 1
            return stats
        rays = int(jax.block_until_ready(rays)) if self.report_ray_stats else 0
        jax.block_until_ready(self._accum)
        dt = time.perf_counter() - t0

        stats = RenderStats(
            render_time=dt * 1e3,
            rays_per_second=(rays / dt) if (self.report_ray_stats and dt > 0) else 0.0,
            rays_traced=rays,
        )
        if readback_framebuffer:
            self.img = np.asarray(self._tonemap_jit(self._accum))[: self.fb_height]
        self.frame_id += 1
        return stats

    # -- checkpoint / resume --------------------------------------------------
    # The reference's analogous feature set is progressive-accumulation state
    # + camera print/restore (SURVEY.md §5): here the full render state
    # (accumulation buffer + frame counter) round-trips through .npz so a
    # long progressive render can resume across processes.
    def save_state(self, path: str) -> None:
        if self._accum is None:
            raise RuntimeError("nothing to save: no render state")
        np.savez_compressed(
            path,
            # crop any multi-device row padding: checkpoints are portable
            # across device counts
            accum=np.asarray(self._accum)[: self.fb_height],
            frame_id=np.int64(self.frame_id),
            spp=np.int64(self.samples_per_pixel),
        )

    def load_state(self, path: str) -> None:
        data = np.load(path)
        accum = data["accum"]
        if accum.shape != (self.fb_height, self.fb_width, 3):
            raise ValueError(
                f"checkpoint resolution {accum.shape[:2]} does not match "
                f"framebuffer {(self.fb_height, self.fb_width)}"
            )
        h_pad = self._accum_height()
        if h_pad != accum.shape[0]:
            accum = np.pad(accum, ((0, h_pad - accum.shape[0]), (0, 0), (0, 0)))
        self._accum = jnp.asarray(accum)
        if self._mesh is not None:
            from chameleonrt_tpu.parallel import sharded

            self._accum = sharded.shard_accum(self._accum, self._mesh)
        self.frame_id = int(data["frame_id"])
        self.img = np.asarray(self._tonemap_jit(self._accum))[: self.fb_height]
