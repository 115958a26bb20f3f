"""On-device LBVH construction (jax, fully vectorized).

The reference gets BVH build + traversal from vendor RT APIs
(rtcCommitScene / optixAccelBuild / DXR / VK / Metal — SURVEY.md §7). TPUs
have none, so the acceleration structure is a first-class component built
on-device with XLA-friendly, sort-based primitives:

  1. 30-bit Morton codes of quantized triangle centroids (bit-interleave),
  2. radix order via jnp.sort of (morton << 32 | index) keys,
  3. uniform leaves of LEAF_SIZE consecutive sorted triangles (uniform leaves
     keep the traversal kernel's triangle tests rectangular for the VPU),
  4. Karras-2012-style internal hierarchy emitted in parallel over all nodes
     (binary search on common-prefix lengths; no sequential insertion),
  5. bottom-up AABB refit by readiness propagation (O(depth) vectorized
     passes inside lax.while_loop).

Node layout (SoA, 2N-1 nodes for N leaves): internal nodes occupy
[0, N-2] with root at 0; leaf k is node (N-1)+k and covers sorted triangle
positions [k*LEAF_SIZE, (k+1)*LEAF_SIZE). A child index >= N-1 therefore
denotes a leaf — one integer compare in the traversal hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

LEAF_SIZE = 4


class Bvh(NamedTuple):
    """Flat SoA BVH over one triangle range (a BLAS) or over instance AABBs
    (a TLAS)."""

    node_min: jnp.ndarray  # (2N-1, 3) float32
    node_max: jnp.ndarray  # (2N-1, 3) float32
    node_left: jnp.ndarray  # (2N-1,) int32 (valid for internal nodes)
    node_right: jnp.ndarray  # (2N-1,) int32
    prim_order: jnp.ndarray  # (N * LEAF_SIZE,) int32 original prim ids, -1 pad

    @property
    def num_leaves(self) -> int:
        return (self.node_left.shape[0] + 1) // 2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PackedBvh:
    """Gather-optimized BVH layout for the TPU traversal hot loop.

    TPU HBM gathers dominate traversal cost, so each traversal step must be
    a single wide row-gather:

    - ``nodes``: (n_internal, 16) float32 — one row per internal node holding
      BOTH children's AABBs plus child indices:
      [lmin xyz, lmax xyz, rmin xyz, rmax xyz, left, right, pad, pad]
      (child indices bitcast int32<->float32). One 64-byte row gather yields
      everything an internal step needs. (A width-2 component-paired variant
      with reduction-based child selection faults the v5e/axon compiler —
      keep the scalar-column form.)
    - ``leaf_rows``: (n_leaves, 10*LEAF_SIZE) float32 — each leaf's triangles
      flattened into ONE 2D row in COMPONENT-MAJOR order: component c of all
      LEAF_SIZE slots occupies the contiguous columns [c*L, (c+1)*L), with
      components ordered [v0x v0y v0z e1x e1y e1z e2x e2y e2z prim(bitcast)].
      The leaf step is one 2D row gather + 10 contiguous (R, L) block slices
      + Möller–Trumbore directly in the (R, L) domain with reduction-based
      closest-slot selection. Measured on v5e: width-1 column extracts of a
      gathered row cost ~30us each (relayout), while contiguous (R, L)
      block slices and minor-dim reductions are free — this layout makes the
      leaf step cost equal to its gather (8.5x over the scalarized form).
    """

    nodes: jnp.ndarray
    leaf_rows: jnp.ndarray
    # Certified worst-case traversal stack occupancy (static pytree aux,
    # not a device array) when the builder can prove one: tree depth for
    # the binary layout, the emit4 DP bound for the 4-wide layout. None for
    # the on-device LBVH whose Karras hierarchy has no a-priori bound.
    # Sizes the traversal short stack exactly, making overflow impossible
    # by construction on the certified path.
    max_depth: Optional[int] = None

    @property
    def arity(self) -> int:
        """Children per internal node row: row width is 8*arity — 16-float
        rows pack 2 children (both AABBs + codes), 32-float rows pack 4
        (BVH4), 64-float rows pack 8 (BVH8). Child AABBs sit at cols
        [6c, 6c+6), codes bitcast at cols [6*arity, 7*arity)."""
        return self.nodes.shape[1] // 8

    def tree_flatten(self):
        return (self.nodes, self.leaf_rows), self.max_depth

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def num_leaves(self) -> int:
        return self.leaf_rows.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.leaf_rows.shape[1] // 10


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class UnifiedBvh:
    """Two-level (TLAS + all BLASes) acceleration structure fused into ONE
    node table and ONE leaf table, so multi-instance scenes traverse in a
    single lockstep launch regardless of instance count (the role of the
    reference's TopLevelBVH, backends/embree/embree_utils.cpp:121-136).

    - ``nodes``: all BLAS internal rows (rebased), then all TLAS internal
      rows starting at row ``tlas_lo``. Same row layouts as PackedBvh
      (16-float binary / 32-float BVH4).
    - ``leaf_rows``: all BLAS triangle leaves (prim ids already global),
      then one INSTANCE ENTRY row per instance at leaf id
      >= ``n_tri_leaves``: cols [0:12) = world-to-object 3x4 inverse
      transform (row-major), col 12 = that instance's BLAS root node id
      (bitcast), col 13 = instance id (bitcast); padded to leaf width.
      One gather serves both interpretations — a lane at a triangle leaf
      reads component-major MT data, a lane at an instance entry reads the
      transform + root and jumps into the BLAS in object space.
    - leaf codes < -(n_tri_leaves) therefore mean "enter instance".

    Traversal nesting note: stack entries pushed inside an instance's BLAS
    always pop before the TLAS entries beneath them (LIFO), so a lane's
    object-space ray registers stay valid until it returns to TLAS rows,
    where the world-space ray is restored (t is world-parameterized in
    both spaces because object directions are NOT renormalized).
    """

    nodes: jnp.ndarray
    leaf_rows: jnp.ndarray
    n_tri_leaves: int = 0
    tlas_lo: int = 0
    stack_bound: Optional[int] = None

    def tree_flatten(self):
        return (self.nodes, self.leaf_rows), (
            self.n_tri_leaves,
            self.tlas_lo,
            self.stack_bound,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def arity(self) -> int:
        return self.nodes.shape[1] // 8

    @property
    def leaf_size(self) -> int:
        return self.leaf_rows.shape[1] // 10


class BlasPair(NamedTuple):
    """Two packed layouts of the SAME tree, specialized per traversal kind:
    binary rows for closest-hit (ordered near-first descent pays off there),
    4-wide rows for occlusion (fewer lockstep iterations win there). The
    native builder emits both from one SAH build; the on-device LBVH
    fallback uses its binary packing for both slots."""

    closest: PackedBvh
    any: PackedBvh


class UnifiedPair(NamedTuple):
    """UnifiedBvh pair (closest = binary rows, any = BVH4 rows) for
    multi-instance scenes, plus the instance world AABBs computed during
    TLAS assembly (kept for stats/debug; traversal itself culls via the
    TLAS boxes)."""

    closest: UnifiedBvh
    any: UnifiedBvh
    inst_aabb: jnp.ndarray


def pack_bvh(bvh: Bvh, tri_v0, tri_e1, tri_e2) -> PackedBvh:
    """Fuse a built LBVH + its triangle range into the gather-optimized
    layout. Child pointers are re-encoded: value >= 0 is an internal node
    row; value < 0 encodes leaf id as -(leaf+1)."""
    n_leaves = bvh.num_leaves
    leaf_size = bvh.prim_order.shape[0] // n_leaves
    n_internal = max(n_leaves - 1, 1)
    leaf_base = n_leaves - 1

    def encode_child(c):
        # node index >= leaf_base is leaf (leaf id = c - leaf_base)
        return jnp.where(c >= leaf_base, -(c - leaf_base) - 1, c)

    if n_leaves == 1:
        nodes = jnp.zeros((1, 16), jnp.float32)
        nodes = nodes.at[0, 0:3].set(bvh.node_min[0])
        nodes = nodes.at[0, 3:6].set(bvh.node_max[0])
        nodes = nodes.at[0, 6:9].set(jnp.full(3, jnp.inf, jnp.float32))
        nodes = nodes.at[0, 9:12].set(jnp.full(3, -jnp.inf, jnp.float32))
        kids = jnp.array([-1, -1], jnp.int32)  # left -> leaf 0; right empty box
        nodes = nodes.at[0, 12:14].set(
            jax.lax.bitcast_convert_type(kids, jnp.float32)
        )
    else:
        left = bvh.node_left[:n_internal]
        right = bvh.node_right[:n_internal]
        nodes = jnp.concatenate(
            [
                bvh.node_min[left],
                bvh.node_max[left],
                bvh.node_min[right],
                bvh.node_max[right],
                jax.lax.bitcast_convert_type(encode_child(left), jnp.float32)[:, None],
                jax.lax.bitcast_convert_type(encode_child(right), jnp.float32)[:, None],
                jnp.zeros((n_internal, 2), jnp.float32),
            ],
            axis=1,
        )

    prim = bvh.prim_order.reshape(n_leaves, leaf_size)
    safe = jnp.maximum(prim, 0)
    tris = jnp.concatenate(
        [tri_v0[safe], tri_e1[safe], tri_e2[safe]], axis=-1
    )  # (n_leaves, LEAF, 9)
    # zero-out padding slots -> degenerate triangles never hit
    tris = jnp.where((prim >= 0)[..., None], tris, 0.0)
    rows = jnp.concatenate(
        [tris, jax.lax.bitcast_convert_type(prim, jnp.float32)[..., None]], axis=-1
    )  # (n_leaves, LEAF, 10) slot-major
    # -> component-major: (n_leaves, 10, LEAF) -> flat rows
    leaf_rows = rows.transpose(0, 2, 1).reshape(n_leaves, 10 * leaf_size)
    return PackedBvh(nodes=nodes, leaf_rows=leaf_rows)


def _expand_bits_10(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (classic Morton bit-interleave)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def morton_codes(centroids, scene_min, scene_max):
    """30-bit Morton codes for points quantized to a 1024^3 grid over the
    scene bounds."""
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    q = jnp.clip((centroids - scene_min) / extent, 0.0, 0.99999994)
    cell = (q * 1024.0).astype(jnp.uint32)
    return (
        (_expand_bits_10(cell[..., 0]) << jnp.uint32(2))
        | (_expand_bits_10(cell[..., 1]) << jnp.uint32(1))
        | _expand_bits_10(cell[..., 2])
    )


def _clz32(x):
    """Count leading zeros of uint32 (bit-halving loop, 5 steps)."""
    x = x.astype(jnp.uint32)
    n = jnp.zeros(x.shape, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        high = x >> jnp.uint32(shift)
        has_high = high != 0
        n = jnp.where(has_high, n, n + shift)
        x = jnp.where(has_high, high, x)
    return jnp.where(x == 0, 32, n)


def _build_karras(keys):
    """Emit the internal hierarchy for N sorted uint32 keys. Duplicate keys
    are disambiguated by position (the standard Karras augmentation: when
    morton codes match, the prefix metric extends with clz of the index
    XOR, i.e. a conceptual 64-bit key without needing uint64). Returns
    (left, right) child node indices for internal nodes [0, N-2], using the
    node layout documented in the module docstring."""
    N = keys.shape[0]
    n_internal = N - 1
    i = jnp.arange(n_internal, dtype=jnp.int32)

    def delta(a, b):
        """Augmented common-prefix length of keys a and b; -1 out of range."""
        b_ok = (b >= 0) & (b < N)
        bc = jnp.clip(b, 0, N - 1)
        ka = keys[a]
        kb = keys[bc]
        d = _clz32(ka ^ kb)
        tie = _clz32(a.astype(jnp.uint32) ^ bc.astype(jnp.uint32))
        d = jnp.where(ka == kb, 32 + tie, d)
        return jnp.where(b_ok, d, -1)

    # Direction of the range: toward the longer common prefix.
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # Upper bound on range length by galloping (ceil(log2 N)+2 doublings).
    import math

    steps = max(int(math.ceil(math.log2(max(N, 2)))) + 2, 2)
    lmax = jnp.full_like(i, 2)
    for _ in range(steps):
        probe = delta(i, i + lmax * d) > delta_min
        lmax = jnp.where(probe, lmax * 2, lmax)

    # Binary search the exact other end j.
    l = jnp.zeros_like(i)
    t = lmax // 2
    for _ in range(steps + 1):
        probe = delta(i, i + (l + t) * d) > delta_min
        l = jnp.where((t > 0) & probe, l + t, l)
        t = t // 2
    j = i + l * d

    # Split position: highest differing bit within [min(i,j), max(i,j)].
    delta_node = delta(i, j)
    s = jnp.zeros_like(i)
    t = (l + 1) // 2

    def ceil_half(x):
        return (x + 1) // 2

    tt = t
    for _ in range(steps + 1):
        probe = delta(i, i + (s + tt) * d) > delta_node
        s = jnp.where((tt > 0) & probe, s + tt, s)
        tt = jnp.where(tt > 1, ceil_half(tt), jnp.where(tt == 1, 0, tt))
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    leaf_base = jnp.int32(N - 1)
    left = jnp.where(lo == gamma, leaf_base + gamma, gamma)
    right = jnp.where(hi == gamma + 1, leaf_base + gamma + 1, gamma + 1)
    return left, right


def _refit(node_left, node_right, leaf_min, leaf_max, n_leaves):
    """Bottom-up AABB refit by readiness propagation: each pass fills every
    internal node whose children are both ready; O(tree depth) passes."""
    n_internal = n_leaves - 1
    total = 2 * n_leaves - 1
    node_min = jnp.full((total, 3), jnp.inf, jnp.float32).at[n_internal:].set(leaf_min)
    node_max = jnp.full((total, 3), -jnp.inf, jnp.float32).at[n_internal:].set(leaf_max)
    ready = jnp.zeros((total,), bool).at[n_internal:].set(True)

    def cond(state):
        node_min, node_max, ready, it = state
        return (~ready[0]) & (it < total + 2)

    def body(state):
        node_min, node_max, ready, it = state
        idx = jnp.arange(n_internal)
        lc = node_left[idx]
        rc = node_right[idx]
        can = ready[lc] & ready[rc] & ~ready[idx]
        new_min = jnp.minimum(node_min[lc], node_min[rc])
        new_max = jnp.maximum(node_max[lc], node_max[rc])
        node_min = node_min.at[idx].set(jnp.where(can[:, None], new_min, node_min[idx]))
        node_max = node_max.at[idx].set(jnp.where(can[:, None], new_max, node_max[idx]))
        ready = ready.at[idx].set(ready[idx] | can)
        return node_min, node_max, ready, it + 1

    node_min, node_max, ready, _ = jax.lax.while_loop(
        cond, body, (node_min, node_max, ready, jnp.int32(0))
    )
    return node_min, node_max


def build_bvh(prim_min, prim_max, leaf_size: int = LEAF_SIZE) -> Bvh:
    """Build an LBVH over primitives given their AABBs (num_prims, 3)x2.
    Fully jax-traceable; jit-compatible for fixed primitive counts."""
    T = prim_min.shape[0]
    assert T >= 1
    centroids = 0.5 * (prim_min + prim_max)
    scene_min = jnp.min(prim_min, axis=0)
    scene_max = jnp.max(prim_max, axis=0)
    codes = morton_codes(centroids, scene_min, scene_max)
    # Stable argsort keeps duplicate-code runs in index order, which the
    # augmented prefix metric in _build_karras relies on.
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)
    sorted_codes = codes[order]

    n_leaves = max((T + leaf_size - 1) // leaf_size, 1)
    pad = n_leaves * leaf_size - T
    prim_order = jnp.concatenate(
        [order, jnp.full((pad,), -1, jnp.int32)]
    )

    # Leaf AABBs over their (padded) triangle runs.
    runs = prim_order.reshape(n_leaves, leaf_size)
    safe = jnp.maximum(runs, 0)
    run_min = jnp.where(
        (runs >= 0)[..., None], prim_min[safe], jnp.inf
    ).min(axis=1)
    run_max = jnp.where(
        (runs >= 0)[..., None], prim_max[safe], -jnp.inf
    ).max(axis=1)

    if n_leaves == 1:
        return Bvh(
            node_min=run_min,
            node_max=run_max,
            node_left=jnp.zeros((1,), jnp.int32),
            node_right=jnp.zeros((1,), jnp.int32),
            prim_order=prim_order,
        )

    # Leaf keys for hierarchy emission: first (sorted) key of each leaf run.
    leaf_keys = sorted_codes[:: leaf_size]
    left, right = _build_karras(leaf_keys)
    n_internal = n_leaves - 1
    total = 2 * n_leaves - 1
    node_left = jnp.concatenate([left, jnp.zeros((n_leaves,), jnp.int32)])
    node_right = jnp.concatenate([right, jnp.zeros((n_leaves,), jnp.int32)])
    node_min, node_max = _refit(node_left, node_right, run_min, run_max, n_leaves)
    return Bvh(
        node_min=node_min,
        node_max=node_max,
        node_left=node_left,
        node_right=node_right,
        prim_order=prim_order,
    )


def triangle_aabbs(v0, e1, e2):
    """AABBs for (v0, e1, e2)-form triangles."""
    p1 = v0 + e1
    p2 = v0 + e2
    tmin = jnp.minimum(jnp.minimum(v0, p1), p2)
    tmax = jnp.maximum(jnp.maximum(v0, p1), p2)
    return tmin, tmax
