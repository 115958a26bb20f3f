"""The wavefront path-tracing core (jax).

This is the one rendering algorithm every reference backend re-implements per
shader language (backends/embree/render_embree.ispc:198-355): jittered
perspective camera rays -> bounded path loop (MAX_PATH_DEPTH=5) with Disney
BSDF + MIS next-event estimation on quad lights -> Russian roulette after
bounce 3 -> progressive accumulation. Re-designed TPU-first: instead of one
divergent megakernel per pixel thread, the whole pixel wavefront advances in
lockstep through `lax.fori_loop` bounces with active-lane masks, every stage a
wide VPU op over (R,)-shaped arrays. Traversal is injected as a pair of
functions so the brute-force oracle backend and the LBVH backend share the
exact same shading/NEE/RNG code (the reference's "same algorithm, different
traversal" seam).

RNG draw order per lane matches the Embree variant exactly
(seed get_rng(pixel_id, frame_id*spp+1+s), render_embree.ispc:213-214):
[jitter_x, jitter_y] then per bounce [light_pick, light_u, light_v,
bsdf-branch (component, u1, u2), continuation (component, u1, u2),
rr (bounces > 3)], so images agree with a faithful CPU implementation
sample-for-sample up to float associativity.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from chameleonrt_tpu.engine.device_scene import (
    FlatScene,
    SceneMeta,
    unpack_material,
    unpack_material_row,
)
from chameleonrt_tpu.ops import bsdf as bsdf_ops
from chameleonrt_tpu.ops import camera as camera_ops
from chameleonrt_tpu.ops import lights as light_ops
from chameleonrt_tpu.ops import rng as rng_ops
from chameleonrt_tpu.ops.intersect import Hit
from chameleonrt_tpu.ops.math import (
    EPSILON,
    MAX_PATH_DEPTH,
    dot,
    length,
    normalize,
    ortho_basis,
    power_heuristic,
)

# trace_closest(flat, orig, dir, t_min, active) -> Hit
TraceClosestFn = Callable[..., Hit]
# trace_any(flat, orig, dir, t_max, mask) -> occluded bool (R,); t_min=EPSILON
# implied (shadow rays always start at EPSILON, render_embree.ispc:142,168)
TraceAnyFn = Callable[..., jnp.ndarray]


class ShadeOut(NamedTuple):
    """Per-lane outputs of the pre-occlusion shading stage: everything a
    bounce needs except the two occlusion traversals (which run at full
    wavefront width so the packet kernels see whole sorted batches)."""

    state: jnp.ndarray
    c1: jnp.ndarray  # (R,3) light-branch contribution, pre-visibility
    c2: jnp.ndarray  # (R,3) bsdf-branch contribution, pre-visibility
    shoot1: jnp.ndarray  # light-branch shadow-ray mask
    light_dir: jnp.ndarray
    light_dist: jnp.ndarray
    shoot2: jnp.ndarray  # bsdf-branch shadow-ray mask
    w_i2: jnp.ndarray  # bsdf-branch sample direction
    t_light: jnp.ndarray
    new_throughput: jnp.ndarray
    cont_dir: jnp.ndarray  # continuation direction
    new_active: jnp.ndarray


def _shade_bounce(
    flat: FlatScene,
    meta: SceneMeta,
    bounce,
    state,
    orig,
    dir,
    throughput,
    active,
    hit_p,
    hit_tri,
    hit_inst,
    hit_u,
    hit_v,
) -> ShadeOut:
    """The whole shading stage of one bounce for one block of lanes:
    shading-input gather, material decode, NEE setup for both MIS branches
    (reference render_embree.ispc:105-181 minus the rtcOccluded calls),
    continuation BSDF sample, Russian roulette. Pure per-lane math — safe
    to run over any sub-block of the wavefront (RNG streams are per-lane),
    which lets _shade_bounce_blocked skip blocks with no live lane."""
    w_o = -dir

    # --- Shading inputs: ONE fused (R, 16) row gather per hit
    # (e1, e2, uv triple, geom slot / baked material id — see
    # FlatScene.shade_rows; many narrow gathers are slow on TPU)
    tri = jnp.clip(hit_tri, 0, max(meta.num_tris - 1, 0))
    srow = flat.shade_rows[tri]
    e1 = srow[:, 0:3]
    e2 = srow[:, 3:6]
    ng_obj = jnp.cross(e1, e2)
    w = hit_u[..., None]
    wv = hit_v[..., None]
    uv = (1.0 - w - wv) * srow[:, 6:8] + w * srow[:, 8:10] + wv * srow[:, 10:12]
    if meta.num_instances == 1:
        # static instance: world normal via one small matmul; the packed
        # material record rides in the shade row (cols 16:30) — no
        # material-table gather at all
        inv3 = flat.inst_inv[0, :3, :3]
        normal = normalize(ng_obj @ inv3)
        mat = unpack_material_row(flat, meta, srow[:, 16:32], uv)
    else:
        inst = jnp.clip(hit_inst, 0, meta.num_instances - 1)
        inv = flat.inst_inv[inst]
        # world normal = (world_to_object)^T * ng  (ispc:287-290)
        normal = normalize(jnp.einsum("rji,rj->ri", inv[:, :3, :3], ng_obj))
        geom_slot = jax.lax.bitcast_convert_type(srow[:, 12], jnp.int32)
        mat_id = flat.inst_mat_table[inst, geom_slot]
        mat = unpack_material(flat, meta, mat_id, uv)

    # Face-forward for non-transmissive materials (ispc:297-299)
    flip = (mat.specular_transmission == 0.0) & (dot(w_o, normal) < 0.0)
    n = jnp.where(flip[..., None], -normal, normal)
    v_x, v_y = ortho_basis(n)

    # --- NEE with MIS over {light sample, bsdf sample} (ispc:105-181)
    num_lights = meta.num_lights
    state, u_l = rng_ops.lcg_randomf(state)
    if num_lights == 1:
        # common case: skip the per-lane light gather, broadcast light 0
        R = u_l.shape[0]
        light = light_ops.LightArrays(
            *(jnp.broadcast_to(f[0], (R,) + f.shape[1:]) for f in flat.lights)
        )
    else:
        light_id = jnp.minimum(
            (u_l * num_lights).astype(jnp.int32), num_lights - 1
        )
        light = flat.lights.gather(light_id)

    # Light-sampling branch setup (ispc:132-141)
    state, s2 = rng_ops.lcg_randomf2(state)
    light_pos = light_ops.sample_quad_light_position(light, s2)
    to_light = light_pos - hit_p
    light_dist = length(to_light)
    light_dir = normalize(to_light)
    light_pdf = light_ops.quad_light_pdf(light, light_pos, hit_p, light_dir)
    b_pdf = bsdf_ops.disney_pdf(mat, n, w_o, light_dir, v_x, v_y)

    # BSDF-sampling branch setup (ispc:155-166)
    state, f2, w_i, pdf2 = bsdf_ops.sample_disney_brdf(mat, n, w_o, v_x, v_y, state)
    qhit, t_light, light_pos2 = light_ops.quad_intersect(light, hit_p, w_i)
    light_pdf2 = light_ops.quad_light_pdf(light, light_pos2, hit_p, w_i)
    f2_nonzero = jnp.any(f2 != 0.0, axis=-1)
    shoot2 = active & f2_nonzero & (pdf2 >= EPSILON) & qhit & (light_pdf2 >= EPSILON)
    # Lanes whose MIS weight is provably zero (either pdf below epsilon)
    # skip the shadow ray entirely, as the reference does (ispc:142-147)
    shoot1 = active & (light_pdf >= EPSILON) & (b_pdf >= EPSILON)

    f1 = bsdf_ops.disney_brdf(mat, n, w_o, light_dir, v_x, v_y)
    w1 = power_heuristic(1.0, light_pdf, 1.0, b_pdf)
    c1 = (
        f1
        * light.emission
        * jnp.abs(dot(light_dir, n))[..., None]
        * (w1 / jnp.maximum(light_pdf, 1e-20))[..., None]
    )
    w2 = power_heuristic(1.0, pdf2, 1.0, light_pdf2)
    c2 = (
        f2
        * light.emission
        * jnp.abs(dot(w_i, n))[..., None]
        * (w2 / jnp.maximum(pdf2, 1e-20))[..., None]
    )

    # --- Continuation (ispc:313-320)
    state, f, w_ic, pdf = bsdf_ops.sample_disney_brdf(mat, n, w_o, v_x, v_y, state)
    cont_ok = (pdf != 0.0) & jnp.any(f != 0.0, axis=-1)
    new_tp = jnp.where(
        active[..., None],
        throughput
        * f
        * (jnp.abs(dot(w_ic, n)) / jnp.where(pdf == 0.0, 1.0, pdf))[..., None],
        throughput,
    )
    new_active = active & cont_ok

    # --- Russian roulette after bounce 3 (ispc:327-335)
    do_rr = (bounce + 1) > 3
    state_rr, u_rr = rng_ops.lcg_randomf(state)
    state = jnp.where(do_rr, state_rr, state)
    q = jnp.maximum(0.05, 1.0 - jnp.max(new_tp, axis=-1))
    killed = do_rr & (u_rr < q)
    new_active = new_active & ~killed
    new_tp = jnp.where(
        (do_rr & new_active)[..., None],
        new_tp / jnp.maximum(1.0 - q, 1e-6)[..., None],
        new_tp,
    )
    return ShadeOut(
        state=state,
        c1=c1,
        c2=c2,
        shoot1=shoot1,
        light_dir=light_dir,
        light_dist=light_dist,
        shoot2=shoot2,
        w_i2=w_i,
        t_light=t_light,
        new_throughput=new_tp,
        cont_dir=w_ic,
        new_active=new_active,
    )


def _shade_block_rows() -> int:
    """Lane-block size for the dead-skip shading stage; 0 = whole-wavefront
    (no blocking). Re-verified clean-process in round 3 (same-process A/B,
    textured hall): blocked 65536 = 1140 ms/frame vs unblocked 1274 ms —
    the sequential lax.map keeps the shading working set small enough that
    the surrounding frame schedules better, even though a standalone
    whole-wavefront shade is only 0.2 ms. Keep 65536."""
    import os

    try:
        return int(os.environ.get("CHAMELEONRT_SHADE_BLOCK", "65536"))
    except ValueError:
        raise ValueError("CHAMELEONRT_SHADE_BLOCK must be an integer") from None


def _shade_bounce_blocked(
    flat, meta, bounce, state, orig, dir, throughput, active, hit_p, hit
) -> ShadeOut:
    """Run _shade_bounce over fixed-size lane blocks with a per-block
    liveness skip: the wavefront is sorted actives-first every bounce, so
    late-bounce dead tails collapse into all-dead blocks whose whole
    shading stage (texture decode, 3 Disney BSDF evaluations, RNG) is one
    predicated no-op. This is the effective stream compaction of SURVEY §7
    step 4 under XLA's static shapes: identical per-lane math and RNG
    draws (dead lanes never revive, so skipped draws are unobservable),
    measured ~f_active of full-shading cost instead of 1.0."""
    R = orig.shape[0]
    B = _shade_block_rows()
    if B == -1:
        # Fusion-fenced whole-wavefront shade (MEASURED LOSS, kept as a
        # probe knob): standalone _shade_bounce is ~0.5 ms at 921K lanes
        # and the lax.map blocking costs ~44 ms/frame in launch/stacking
        # overhead (scripts/stub_budget.py, honest chained-jit timing),
        # so a barrier-isolated whole-wavefront shade LOOKED like a win —
        # but the full-frame A/B says otherwise: hall 785 ms/frame vs the
        # blocked default's 627. The sequential map's small working set
        # buys the surrounding frame more than the map machinery costs;
        # an optimization_barrier does not reproduce that.
        ins = jax.lax.optimization_barrier(
            (state, orig, dir, throughput, active,
             hit_p, hit.tri, hit.inst, hit.u, hit.v)
        )
        out = _shade_bounce(flat, meta, bounce, *ins)
        return jax.lax.optimization_barrier(out)
    if B <= 0 or R <= B:
        return _shade_bounce(
            flat, meta, bounce, state, orig, dir, throughput, active,
            hit_p, hit.tri, hit.inst, hit.u, hit.v,
        )
    nb = -(-R // B)
    Rp = nb * B

    def pad(x):
        if x.shape[0] == Rp:
            return x
        return jnp.pad(x, ((0, Rp - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

    def stack(x):
        return pad(x).reshape((nb, B) + x.shape[1:])

    ins = tuple(
        stack(x)
        for x in (
            state, orig, dir, throughput, active,
            hit_p, hit.tri, hit.inst, hit.u, hit.v,
        )
    )

    def blk(args):
        st, o, d, tp, act, hp, tri, inst, u, v = args

        def live(_):
            return _shade_bounce(
                flat, meta, bounce, st, o, d, tp, act, hp, tri, inst, u, v
            )

        def dead(_):
            z1 = jnp.zeros((B,), jnp.float32)
            z3 = jnp.zeros((B, 3), jnp.float32)
            no = jnp.zeros((B,), bool)
            return ShadeOut(
                state=st,
                c1=z3,
                c2=z3,
                shoot1=no,
                light_dir=z3.at[:, 2].set(1.0),
                light_dist=z1,
                shoot2=no,
                w_i2=z3.at[:, 2].set(1.0),
                t_light=z1,
                new_throughput=tp,
                cont_dir=d,
                new_active=no,
            )

        return jax.lax.cond(jnp.any(act), live, dead, None)

    outs = jax.lax.map(blk, ins)
    return ShadeOut(*(o.reshape((Rp,) + o.shape[2:])[:R] for o in outs))


def _sort_wavefront(state, orig, dir, throughput, illum, active, lane_pixel):
    """Re-sort the whole path state by (active, direction octant, origin
    Morton) with ONE packed row gather.

    XLA:TPU gathers cost ~12 ns per ROW regardless of row width (measured:
    a dozen separate per-field permutation gathers were ~35% of the frame),
    so the entire wavefront state packs into one (R, 16) int32 matrix —
    float fields bitcast, never converted (int gathers cannot canonicalize
    NaN payloads, which matters for the raw uint32 RNG state) — and one
    row gather applies the permutation to everything."""
    from chameleonrt_tpu.ops.traverse import ray_sort_perm_only

    perm = ray_sort_perm_only(orig, dir, active)
    f32 = jnp.concatenate([orig, dir, throughput, illum], axis=1)  # (R,12)
    packed = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(f32, jnp.int32),
            state.astype(jnp.int32)[..., None],
            lane_pixel[..., None],
            active.astype(jnp.int32)[..., None],
            jnp.zeros((orig.shape[0], 1), jnp.int32),
        ],
        axis=1,
    )  # (R, 16)
    packed = packed[perm]  # ONE row gather
    f32 = jax.lax.bitcast_convert_type(packed[:, 0:12], jnp.float32)
    return (
        packed[:, 12].astype(jnp.uint32),  # state
        f32[:, 0:3],  # orig
        f32[:, 3:6],  # dir
        f32[:, 6:9],  # throughput
        f32[:, 9:12],  # illum
        packed[:, 14] != 0,  # active
        packed[:, 13],  # lane_pixel
    )


def _hypercube_perm(n_dev: int, bit: int):
    """Static ppermute pairs for a pairwise exchange along hypercube
    dimension `bit` (devices whose partner falls outside the mesh swap with
    themselves, a no-op)."""
    pairs = []
    for d in range(n_dev):
        p = d ^ bit
        pairs.append((d, p if p < n_dev else d))
    return pairs


def _exchange_wavefront(
    state, orig, dir, throughput, illum, active, lane_pixel, *, axis, bit,
    n_dev,
):
    """Active-ray rebalancing over ICI (SURVEY §2.3's "ppermute for ray
    redistribution" slot; the reference has no equivalent — it is strictly
    single-device, SURVEY §5).

    Each bounce pairs every device with a hypercube partner (dimension
    rotates with the bounce so load mixes globally over the path loop) and
    swaps one fixed-size slice of the packed wavefront: the busier side
    sends its LAST ~surplus/2 active rows (the wavefront is actives-first
    sorted), the other side sends dead tail rows. Rows are self-contained —
    RNG state, throughput, illum, and a GLOBAL lane id ride in the packed
    row — so a migrated ray finishes its path on the new device and its
    illumination is delivered by the caller's psum-scatter. The exchange is
    image-exact: per-ray math is device-independent and the per-bounce sort
    re-normalizes order, so rebalanced and static shardings produce
    bit-identical frames."""
    R = orig.shape[0]
    S = max(min(R // 8, 16384), 8)  # fixed slice: static shapes over ICI
    perm = _hypercube_perm(n_dev, bit)

    n_act = jnp.sum(active.astype(jnp.int32))
    cnt_p = jax.lax.ppermute(n_act, axis, perm)
    surplus = jnp.maximum((n_act - cnt_p) // 2, 0)
    send_eff = jnp.minimum(surplus, S)
    start = jnp.clip(n_act - send_eff, 0, R - S)

    f32 = jnp.concatenate([orig, dir, throughput, illum], axis=1)  # (R,12)
    packed = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(f32, jnp.int32),
            state.astype(jnp.int32)[..., None],
            lane_pixel[..., None],
            active.astype(jnp.int32)[..., None],
            jnp.zeros((R, 1), jnp.int32),
        ],
        axis=1,
    )
    sl = jax.lax.dynamic_slice(packed, (start, 0), (S, 16))
    recv = jax.lax.ppermute(sl, axis, perm)
    packed = jax.lax.dynamic_update_slice(packed, recv, (start, 0))
    f32 = jax.lax.bitcast_convert_type(packed[:, 0:12], jnp.float32)
    return (
        packed[:, 12].astype(jnp.uint32),
        f32[:, 0:3],
        f32[:, 3:6],
        f32[:, 6:9],
        f32[:, 9:12],
        packed[:, 14] != 0,
        packed[:, 13],
    )


def trace_path(
    flat: FlatScene,
    meta: SceneMeta,
    trace_closest: TraceClosestFn,
    trace_any: TraceAnyFn,
    orig,
    dir,
    state,
    lane_ids=None,
    rebalance_axis=None,
    rebalance_n_dev=1,
    active0=None,
):
    """One full path per lane starting from the given primary rays.
    Returns (state, illum (R,3), rays_traced int32). NOTE: the returned
    illum is in RESHUFFLED lane order — lane_pixel (also returned) maps
    each lane to its originating index in the input ray order; callers
    scatter by it (render_pixels does). The wavefront re-sorts itself by
    ray coherence each bounce so traversal sees coherent packets without
    any per-trace-call permutation."""
    R = orig.shape[0]
    illum = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    # active0 lets sharded callers launch pad-row lanes born-dead: they
    # trace nothing and count no rays, so rebalanced ray stats stay exact
    # (a migrated ray executes — and is counted — on a different device
    # than its home rows, which breaks per-device crop scaling).
    active = jnp.ones((R,), bool) if active0 is None else active0
    lane_pixel = (
        jnp.arange(R, dtype=jnp.int32) if lane_ids is None else lane_ids
    )
    rays = jnp.int32(0)
    t_min = jnp.float32(0.0)

    def bounce_body(bounce, carry, do_sort=True):
        state, orig, dir, t_min, throughput, illum, active, lane_pixel, rays = carry
        if do_sort:
            state, orig, dir, throughput, illum, active, lane_pixel = (
                _sort_wavefront(
                    state, orig, dir, throughput, illum, active, lane_pixel
                )
            )
        if rebalance_axis is not None and rebalance_n_dev > 1:
            # bounce 0 is uniformly full everywhere; rebalance afterwards,
            # rotating the hypercube dimension each bounce (each dimension
            # needs a distinct STATIC ppermute pairing -> lax.switch)
            dims = max(1, (rebalance_n_dev - 1).bit_length())

            def mk_branch(bit):
                def br(args):
                    return _exchange_wavefront(
                        *args,
                        axis=rebalance_axis,
                        bit=bit,
                        n_dev=rebalance_n_dev,
                    )

                return br

            args = (state, orig, dir, throughput, illum, active, lane_pixel)
            idx = jnp.where(bounce >= 1, (bounce - 1) % dims + 1, 0)
            state, orig, dir, throughput, illum, active, lane_pixel = (
                jax.lax.switch(
                    idx,
                    [lambda a: a] + [mk_branch(1 << i) for i in range(dims)],
                    args,
                )
            )
        hit = trace_closest(flat, orig, dir, t_min, active)
        rays = rays + active.astype(jnp.int32).sum()

        missed = active & ~hit.hit
        illum = illum + jnp.where(
            missed[..., None], throughput * camera_ops.miss_shader(dir), 0.0
        )
        active = active & hit.hit
        hit_p = orig + hit.t[..., None] * dir

        # --- pre-occlusion shading stage, blocked with per-block dead-skip
        sh = _shade_bounce_blocked(
            flat, meta, bounce, state, orig, dir, throughput, active, hit_p, hit
        )
        state = sh.state

        # --- Two occlusion traversals, one per MIS branch, at full
        # wavefront width. Measured round 3: stacking both branches into
        # ONE 2R persistent call (VMEM-eligible via the any kernels'
        # smaller ray-array footprint) is NEUTRAL on the textured hall
        # (1032 vs 1022 ms/frame) — launch overhead inside the jitted
        # frame is noise and traversal cost is visit-bound, while the 2R
        # resident ray block doubles VMEM pressure. Host-side compaction
        # of the sparse bsdf branch was also measured a loss (+34 ms: the
        # argsort + gather + scatter cost more than the all-dead packets
        # they removed, which retire in ~1 iteration anyway).
        occluded1 = trace_any(flat, hit_p, sh.light_dir, sh.light_dist, sh.shoot1)
        occluded2 = trace_any(flat, hit_p, sh.w_i2, sh.t_light, sh.shoot2)
        rays = (
            rays
            + sh.shoot1.astype(jnp.int32).sum()
            + sh.shoot2.astype(jnp.int32).sum()
        )
        direct = jnp.where(
            (sh.shoot1 & ~occluded1)[..., None], sh.c1, 0.0
        ) + jnp.where((sh.shoot2 & ~occluded2)[..., None], sh.c2, 0.0)
        illum = illum + jnp.where(active[..., None], throughput * direct, 0.0)

        throughput = sh.new_throughput
        active = sh.new_active
        orig = jnp.where(active[..., None], hit_p, orig)
        dir = jnp.where(active[..., None], sh.cont_dir, dir)
        t_min = jnp.float32(EPSILON)
        return state, orig, dir, t_min, throughput, illum, active, lane_pixel, rays

    carry = (state, orig, dir, t_min, throughput, illum, active, lane_pixel, rays)
    import os

    unroll = os.environ.get("CHAMELEONRT_UNROLL_BOUNCES", "0") not in (
        "0", "false", "off",
    )
    sort_mode = os.environ.get("CHAMELEONRT_BOUNCE_SORT", "all")
    if unroll:
        # Python-unrolled bounce loop: no fori_loop carry boundaries (XLA
        # may fuse across bounces) and bounce-static structure — e.g.
        # CHAMELEONRT_BOUNCE_SORT=first keeps only the bounce-0 sort (the
        # image-order -> Morton one) and lets later bounces ride the
        # inherited order. Perf experiment knobs; default loop is fori.
        for bounce in range(MAX_PATH_DEPTH):
            carry = bounce_body(
                bounce, carry, do_sort=(sort_mode == "all" or bounce == 0)
            )
    else:
        carry = jax.lax.fori_loop(0, MAX_PATH_DEPTH, bounce_body, carry)
    state, _, _, _, _, illum, _, lane_pixel, rays = carry
    return state, illum, lane_pixel, rays


def render_pixels(
    flat: FlatScene,
    meta: SceneMeta,
    trace_closest: TraceClosestFn,
    trace_any: TraceAnyFn,
    view: camera_ops.ViewParams,
    frame_id,
    pixel_x,
    pixel_y,
    fb_width: int,
    fb_height: int,
    spp: int,
    scatter_ids=None,
    scatter_rows: int = 0,
    rebalance_axis=None,
    rebalance_n_dev: int = 1,
    active0=None,
):
    """Render one progressive frame's illumination for the given pixels.
    Returns (illum averaged over spp, rays_traced int32 scalar).

    Default: illum is (R, 3) in input-ray order. Rebalanced multi-chip mode
    (scatter_ids + scatter_rows set): lanes may migrate between devices
    mid-path, so each lane carries a global id and illum is delivered as a
    (scatter_rows, 3) partial frame (zeros off this device's lanes) for the
    caller to psum-scatter over the mesh."""
    pixel_id = (pixel_x + pixel_y * fb_width).astype(jnp.uint32)
    R = pixel_id.shape[0]
    out_rows = scatter_rows if scatter_ids is not None else R

    def sample_body(s, carry):
        illum_acc, rays_acc = carry
        # embree-variant seeding (ispc:213-214)
        state = rng_ops.get_rng(
            pixel_id, jnp.uint32(frame_id) * jnp.uint32(spp) + jnp.uint32(1) + jnp.uint32(s)
        )
        state, orig, dir = camera_ops.generate_primary_rays(
            view, pixel_x, pixel_y, float(fb_width), float(fb_height), state
        )
        state, illum, lane_pixel, rays = trace_path(
            flat, meta, trace_closest, trace_any, orig, dir, state,
            lane_ids=scatter_ids,
            rebalance_axis=rebalance_axis,
            rebalance_n_dev=rebalance_n_dev,
            active0=active0,
        )
        # one scatter restores input-ray order (trace_path reshuffles lanes
        # by coherence each bounce; per-pixel arithmetic is unchanged, so
        # images stay bit-identical to the unsorted pipeline). Rebalanced:
        # scatter into the global partial frame instead (.add — a migrated
        # lane's id may sit anywhere, but ids stay unique per device since
        # every (pixel, sample) lane exists on exactly one device).
        illum = (
            jnp.zeros((out_rows, 3), jnp.float32)
            .at[lane_pixel]
            .set(illum, unique_indices=True, indices_are_sorted=False)
        )
        return illum_acc + illum, rays_acc + rays

    illum_sum, rays = jax.lax.fori_loop(
        0, spp, sample_body, (jnp.zeros((out_rows, 3), jnp.float32), jnp.int32(0))
    )
    return illum_sum / jnp.float32(spp), rays


def progressive_accum(accum, illum, frame_id):
    """Running-average accumulation (ispc:345-353):
    accum' = (illum + frame_id * accum) / (frame_id + 1)."""
    fid = jnp.float32(frame_id)
    return (illum + fid * accum) / (fid + 1.0)
