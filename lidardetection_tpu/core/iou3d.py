"""Rotated 3D/BEV IoU and NMS, fully vectorized for TPU.

Replaces the reference's `iou3d_nms` CUDA extension
(pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu):
  * `boxes_overlap_kernel` (:104-249) computed rotated-rectangle intersection
    per thread by collecting corner-in-box and edge-edge intersection points
    and sorting them by angle — cheap per CUDA thread, hostile to SIMD. Here
    the intersection area uses a fixed-dataflow formulation (Liang-Barsky
    edge clipping + piecewise shoelace, see `_pair_overlap_bev`) that is
    branch-, sort- and gather-free, so XLA maps all (N, M) pairs straight
    onto the VPU.
  * `nms_kernel` (:267-313) + host greedy pass (iou3d_nms.cpp:90-137) become
    a fixed-capacity greedy NMS via `lax.fori_loop` over a precomputed IoU
    matrix (see `nms_bev`).

Conventions: boxes are (x, y, z, dx, dy, dz, heading) with (x, y, z) the box
center, matching pcdet/utils/box_utils.py.
"""

import jax
import jax.numpy as jnp

from .geometry import corners_bev

_EPS = 1e-8
_PAR_TOL = 1e-4   # |n.d| <= tol*|d| -> treat edge as parallel to the face
_TIE_TOL = 1e-3   # signed-distance window for boundary-coincidence ties (meters)


def boxes_iou_normal(boxes_a, boxes_b):
    """Axis-aligned IoU between (N, 4) [x1,y1,x2,y2] and (M, 4) boxes.

    Mirrors box_utils.boxes_iou_normal (pcdet/utils/box_utils.py:240-258).
    """
    x_min = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    x_max = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y_min = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    y_max = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    x_len = jnp.clip(x_max - x_min, 0, None)
    y_len = jnp.clip(y_max - y_min, 0, None)
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    intersection = x_len * y_len
    return intersection / jnp.clip(area_a[:, None] + area_b[None, :] - intersection, 1e-6, None)


def boxes3d_lidar_to_aligned_bev_boxes(boxes3d):
    """(N, 7+) -> (N, 4) nearest axis-aligned BEV box (box_utils.py:260-272)."""
    from .geometry import limit_period

    rot_angle = jnp.abs(limit_period(boxes3d[:, 6], offset=0.5, period=jnp.pi))
    swap = rot_angle >= jnp.pi / 4
    dx = jnp.where(swap, boxes3d[:, 4], boxes3d[:, 3])
    dy = jnp.where(swap, boxes3d[:, 3], boxes3d[:, 4])
    half = jnp.stack([dx, dy], axis=-1) / 2
    return jnp.concatenate([boxes3d[:, 0:2] - half, boxes3d[:, 0:2] + half], axis=-1)


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned-approximation BEV IoU (box_utils.py:275-289)."""
    return boxes_iou_normal(
        boxes3d_lidar_to_aligned_bev_boxes(boxes_a),
        boxes3d_lidar_to_aligned_bev_boxes(boxes_b),
    )


def _rect_halfplanes(boxes):
    """Half-plane form of rotated rectangles: inside iff n_k . x <= c_k.

    Args: boxes (..., 7). Returns normals (..., 4, 2), offsets (..., 4).
    """
    h = boxes[..., 6]
    u = jnp.stack([jnp.cos(h), jnp.sin(h)], axis=-1)   # box x-axis
    v = jnp.stack([-jnp.sin(h), jnp.cos(h)], axis=-1)  # box y-axis
    n = jnp.stack([u, -u, v, -v], axis=-2)  # (..., 4, 2)
    center = boxes[..., 0:2]
    half = jnp.stack([boxes[..., 3], boxes[..., 3], boxes[..., 4], boxes[..., 4]],
                     axis=-1) / 2
    # elementwise mul+add, NOT einsum: einsum lowers to an MXU dot which
    # defaults to bf16 operand precision on TPU; the ~0.4% relative noise
    # destroys the collinear-edge tie handling for near-identical boxes
    # (self-IoU read 0.33 or 1e7 on chip) — exactly the regime a converging
    # two-stage head lives in. These are 2-wide dots; the VPU form is both
    # exact (f32) and faster than an MXU trip.
    c = (n * center[..., None, :]).sum(-1) + half
    return n, c


def _clipped_edges_contribution(pa1, pa2, nb, cb, second_pass=False):
    """Shoelace contribution of A-edges clipped to rectangle B (Liang-Barsky).

    Args:
        pa1, pa2: (..., 4, 2) edge endpoints of A (consistent winding);
        nb: (..., 4, 2) B half-plane normals; cb: (..., 4) offsets;
        second_pass: in the second clipping pass, an edge lying ON a face
            of the clip rectangle (|signed distance| <= _TIE_TOL) is rejected
            iff it runs in the SAME direction as that face's own boundary
            edge. Collinear boundary pieces are thus counted once across the
            two passes when the polygons agree (identical boxes, shared
            faces) yet still cancel when they merely touch back-to-back
            (opposite traversal directions).
    Returns:
        (...,) sum over A's edges of cross(p(t0), p(t1)) for the sub-segment
        inside B (0 when the edge misses B).
    """
    d = pa2 - pa1  # (..., 4, 2)
    len_d = jnp.linalg.norm(d, axis=-1)[..., :, None]  # (..., 4e, 1)
    # f(t) = nb.(p1 + t d) - cb <= 0 required, per (edge e, plane k)
    # elementwise (..., 4e, 4k) dots — see _rect_halfplanes for why einsum
    # (bf16 MXU lowering on TPU) is forbidden in this file
    nd = (nb[..., None, :, :] * d[..., :, None, :]).sum(-1)      # (..., 4e, 4k)
    nf = (nb[..., None, :, :] * pa1[..., :, None, :]).sum(-1) - cb[..., None, :]
    # parallel test is relative to edge length: f32 trig noise makes exactly
    # collinear rotated edges produce |n.d| ~ 1e-6 * |d|
    is_par = jnp.abs(nd) <= _PAR_TOL * len_d
    t_at = -nf / jnp.where(is_par, 1.0, nd)
    # entering (nd < 0): t >= t_at ; exiting (nd > 0): t <= t_at
    t_lo = jnp.where(~is_par & (nd < 0), t_at, 0.0)
    t_hi = jnp.where(~is_par & (nd > 0), t_at, 1.0)
    # parallel & strictly outside: reject the whole edge
    reject = is_par & (nf > _TIE_TOL)
    if second_pass:
        # on-boundary collinear, same traversal direction as the clip
        # rectangle's own edge on that face (CW winding: edge dir =
        # rotate_cw(face normal)) -> already counted by the first pass
        same_dir = (d[..., :, None, 0] * nb[..., None, :, 1]
                    - d[..., :, None, 1] * nb[..., None, :, 0]) > 0
        on_boundary = is_par & (jnp.abs(nf) <= _TIE_TOL)
        reject = reject | (on_boundary & same_dir)
    t0 = jnp.maximum(jnp.max(t_lo, axis=-1), 0.0)       # (..., 4e)
    t1 = jnp.minimum(jnp.min(t_hi, axis=-1), 1.0)
    valid = (t1 > t0) & ~jnp.any(reject, axis=-1)
    p0 = pa1 + t0[..., None] * d
    p1 = pa1 + t1[..., None] * d
    cross = p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0]
    return jnp.sum(jnp.where(valid, cross, 0.0), axis=-1)


def _box_clip_parts(boxes):
    """Per-box clipping quantities: (corners (..., 4, 2), normals (..., 4, 2),
    offsets (..., 4)). Precompute ONCE per candidate set — the trig +
    stacking here dominated the per-iteration cost of the NMS while-loop
    when recomputed for all N boxes every block step."""
    return (corners_bev(boxes),) + _rect_halfplanes(boxes)


def _pair_overlap_parts(parts_a, parts_b):
    """Intersection area from precomputed `_box_clip_parts` (broadcastable
    on the leading dims)."""
    ca, na, caa = parts_a
    cb, nb, cbb = parts_b
    contrib_a = _clipped_edges_contribution(ca, jnp.roll(ca, -1, axis=-2), nb, cbb)
    contrib_b = _clipped_edges_contribution(cb, jnp.roll(cb, -1, axis=-2), na, caa,
                                            second_pass=True)
    return jnp.abs(contrib_a + contrib_b) / 2


def _pair_overlap_bev(boxes_a, boxes_b):
    """Intersection area of two rotated BEV rectangles (broadcastable).

    Args: boxes_a, boxes_b: (..., 7) broadcast-compatible.
    Returns: (...,) area.

    Exact, fixed-dataflow alternative to the reference's candidate-collection
    + angular-sort construction (iou3d_nms_kernel.cu:104-249): the boundary
    of A∩B is exactly {A-edges clipped to B} ∪ {B-edges clipped to A}; each
    clipped directed segment contributes cross(start, end) to the shoelace
    sum, so area = |Σ contributions| / 2. Liang-Barsky interval clipping
    against the 4 half-planes is branch-free — no sorting, no gathers, no
    transcendentals — which is what makes this formulation fast on the VPU
    (~400 flops/pair, ~6 temporaries).
    """
    return _pair_overlap_parts(_box_clip_parts(boxes_a),
                               _box_clip_parts(boxes_b))


def boxes_overlap_bev(boxes_a, boxes_b, row_chunk=None):
    """Rotated BEV intersection area, all pairs.

    Args: boxes_a (N, 7), boxes_b (M, 7). Returns (N, M) float32.
    Mirrors boxes_overlap_bev (iou3d_nms_utils.py:12-29).

    The clipping workspace is ~16 floats per pair; for large N*M (NMS
    matrices) rows are processed in `row_chunk` blocks via lax.map so peak
    memory stays bounded while each block is fully vectorized.
    """
    f = lambda a: _pair_overlap_bev(a[:, None, :], boxes_b[None, :, :])

    n, m = boxes_a.shape[0], boxes_b.shape[0]
    if row_chunk is None:
        # keep the per-block workspace around ~128 MB
        row_chunk = max(1, min(n, int(2**25 // max(m * 16, 1))))
    if n <= row_chunk:
        return f(boxes_a)
    pad = (-n) % row_chunk
    a_pad = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    blocks = a_pad.reshape(-1, row_chunk, boxes_a.shape[1])
    out = jax.lax.map(f, blocks)
    return out.reshape(-1, m)[:n]


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU, all pairs (iou3d_nms_utils.py:32-45)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    return overlap / jnp.clip(area_a[:, None] + area_b[None, :] - overlap, 1e-6, None)


def boxes_iou3d(boxes_a, boxes_b):
    """3D IoU with z-extent overlap, all pairs (iou3d_nms_utils.py:48-76)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)  # (N, M)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    z_overlap = jnp.clip(
        jnp.minimum(za2[:, None], zb2[None, :]) - jnp.maximum(za1[:, None], zb1[None, :]),
        0,
        None,
    )
    overlap_3d = overlap_bev * z_overlap
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return overlap_3d / jnp.clip(vol_a[:, None] + vol_b[None, :] - overlap_3d, 1e-6, None)


def _lazy_greedy_nms(boxes, scores, valid, thresh, post_maxsize, iou_row_fn):
    """Row-lazy greedy NMS: O(num_kept) sequential steps, no NxN matrix.

    Greedy NMS = repeatedly take the highest-scored unsuppressed box and
    suppress everything it overlaps. Walking score-sorted candidates (the
    CUDA host loop, iou3d_nms.cpp:90-137) is O(N) sequential; picking the
    running argmax is equivalent and terminates after num_kept (<=
    post_maxsize) iterations, each costing one argmax + ONE IoU row (N
    pairs). For trained detectors num_kept << N, so this is typically
    10-100x cheaper than materializing the NxN IoU matrix — and it never
    allocates one.

    Args:
        boxes (N, 7); scores (N,); valid (N,) bool; iou_row_fn(box, boxes)
        -> (N,) IoU of one box against all.
    Returns:
        out_idx (post_maxsize,) int32, num_kept int32.
    """
    n = scores.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    live_scores = jnp.where(valid, scores, neg_inf)

    def cond(state):
        live, out, count = state
        return (count < post_maxsize) & jnp.any(live > neg_inf)

    def body(state):
        live, out, count = state
        cur = jnp.argmax(live).astype(jnp.int32)
        row = iou_row_fn(boxes[cur], boxes)  # (N,)
        suppress = (row > thresh) | (jnp.arange(n) == cur)
        live = jnp.where(suppress, neg_inf, live)
        out = out.at[count].set(cur)
        return live, out, count + 1

    out0 = jnp.zeros((post_maxsize,), jnp.int32)
    _, out_idx, num_kept = jax.lax.while_loop(
        cond, body, (live_scores, out0, jnp.int32(0)))
    return out_idx, num_kept


def _lazy_greedy_nms_batched(boxes, scores, valid, thresh, post_maxsize,
                             iou_row_fn):
    """Batched row-lazy greedy NMS: every sample advances per iteration.

    Same semantics per sample as `_lazy_greedy_nms`; the while_loop carries
    all B samples so the iteration count is max(num_kept) over the batch
    instead of the sum — the batch dimension rides the VPU for free.

    Args:
        boxes (B, N, 7); scores (B, N); valid (B, N);
        iou_row_fn(box (B, 7), boxes (B, N, 7)) -> (B, N).
    Returns:
        out_idx (B, post_maxsize) int32, num_kept (B,) int32.
    """
    b, n = scores.shape
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    live0 = jnp.where(valid, scores, neg_inf)
    brange = jnp.arange(b)

    def cond(state):
        live, out, count = state
        active = (count < post_maxsize) & jnp.any(live > neg_inf, axis=1)
        return jnp.any(active)

    def body(state):
        live, out, count = state
        active = (count < post_maxsize) & jnp.any(live > neg_inf, axis=1)  # (B,)
        cur = jnp.argmax(live, axis=1).astype(jnp.int32)  # (B,)
        cur_boxes = boxes[brange, cur]  # (B, 7)
        row = iou_row_fn(cur_boxes, boxes)  # (B, N)
        suppress = (row > thresh) | (jnp.arange(n)[None, :] == cur[:, None])
        live = jnp.where(suppress & active[:, None], neg_inf, live)
        # active: slot = count (< post_maxsize); inactive: rewrite old value
        slot = jnp.minimum(count, post_maxsize - 1)
        val = jnp.where(active, cur, out[brange, slot])
        out = out.at[brange, slot].set(val)
        count = count + active.astype(jnp.int32)
        return live, out, count

    out0 = jnp.zeros((b, post_maxsize), jnp.int32)
    _, out_idx, num_kept = jax.lax.while_loop(
        cond, body, (live0, out0, jnp.zeros((b,), jnp.int32)))
    return out_idx, num_kept


def _lane_parts(boxes):
    """Lanes-major per-box quantities for `_overlap_blocks_lanes`.

    Args: boxes (..., 7). Returns dict of (...,) component arrays — no
    trailing geometry dims, so the N axis stays minor on TPU (the stacked
    (..., 4, 2)/(..., 4, 4) intermediates of `_pair_overlap_parts` tile as
    (8, 128) pads on their tiny minor dims — measured ~7x slower inside the
    NMS loop than this component-wise form).
    """
    x, y = boxes[..., 0], boxes[..., 1]
    hx, hy = boxes[..., 3] / 2, boxes[..., 4] / 2
    c, s = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    # corner order matches corners_bev: template (+,+),(+,-),(-,-),(-,+)
    # times (dx, dy)/2... actually template is (.5,.5),(.5,-.5),(-.5,-.5),(-.5,.5)
    cx, cy = [], []
    for tx, ty in ((1, 1), (1, -1), (-1, -1), (-1, 1)):
        lx, ly = tx * hx, ty * hy
        cx.append(lx * c - ly * s + x)
        cy.append(lx * s + ly * c + y)
    return {
        'x': x, 'y': y, 'hx': hx, 'hy': hy, 'c': c, 's': s,
        'pu': c * x + s * y,    # center projected on box u axis
        'pv': -s * x + c * y,   # center projected on box v axis
        'cx': cx, 'cy': cy,     # 4 corner components each
        'area': boxes[..., 3] * boxes[..., 4],
    }


def _clip_edges_lanes(ax1, ay1, ax2, ay2, planes, second_pass=False):
    """Shoelace contribution of edges (a1->a2) clipped against 4 half-planes.

    Args:
        ax1..ay2: broadcastable edge endpoint components (already expanded
            to the output shape, e.g. (B, m, 1) vs (B, 1, N)).
        planes: list of 4 tuples (nx, ny, off) — inside iff n.p <= off.
    Returns the summed cross-product contribution (same semantics as
    `_clipped_edges_contribution`, component-wise dataflow).
    """
    total = None
    for e in range(4):
        p1x, p1y = ax1[e], ay1[e]
        dx_, dy_ = ax2[e] - p1x, ay2[e] - p1y
        len_d = jnp.sqrt(dx_ * dx_ + dy_ * dy_)
        t_lo = None
        t_hi = None
        reject = None
        for nx_, ny_, off in planes:
            nd = nx_ * dx_ + ny_ * dy_
            nf = nx_ * p1x + ny_ * p1y - off
            is_par = jnp.abs(nd) <= _PAR_TOL * len_d
            t_at = -nf / jnp.where(is_par, 1.0, nd)
            lo_k = jnp.where(~is_par & (nd < 0), t_at, 0.0)
            hi_k = jnp.where(~is_par & (nd > 0), t_at, 1.0)
            rej_k = is_par & (nf > _TIE_TOL)
            if second_pass:
                same_dir = (dx_ * ny_ - dy_ * nx_) > 0
                rej_k = rej_k | (is_par & (jnp.abs(nf) <= _TIE_TOL) & same_dir)
            t_lo = lo_k if t_lo is None else jnp.maximum(t_lo, lo_k)
            t_hi = hi_k if t_hi is None else jnp.minimum(t_hi, hi_k)
            reject = rej_k if reject is None else (reject | rej_k)
        t0 = jnp.maximum(t_lo, 0.0)
        t1 = jnp.minimum(t_hi, 1.0)
        valid = (t1 > t0) & ~reject
        p0x, p0y = p1x + t0 * dx_, p1y + t0 * dy_
        q1x, q1y = p1x + t1 * dx_, p1y + t1 * dy_
        cross = p0x * q1y - p0y * q1x
        contrib = jnp.where(valid, cross, 0.0)
        total = contrib if total is None else total + contrib
    return total


def _planes_of(p, expand):
    """4 half-planes (nx, ny, off) from `_lane_parts`, expanded via fn."""
    c, s = expand(p['c']), expand(p['s'])
    pu, pv = expand(p['pu']), expand(p['pv'])
    hx, hy = expand(p['hx']), expand(p['hy'])
    return [(c, s, pu + hx), (-c, -s, -pu + hx),
            (-s, c, pv + hy), (s, -c, -pv + hy)]


def _overlap_blocks_lanes(blk_parts, all_parts):
    """Rotated-rectangle intersection area, block vs all: (B, m, N).

    blk_parts/all_parts: `_lane_parts` of (B, m, 7) and (B, N, 7) boxes.
    Same clipping semantics as `_pair_overlap_parts` (A-edges pass then
    B-edges second pass), with every intermediate shaped (B, m, N) — the
    minor axis is N, so the whole chain vectorizes on TPU lanes.
    """
    eb = lambda v: v[:, :, None]   # blk (B, m) -> (B, m, 1)
    ea = lambda v: v[:, None, :]   # all (B, N) -> (B, 1, N)

    # pass 1: blk edges vs all's planes
    bx = [eb(v) for v in blk_parts['cx']]
    by = [eb(v) for v in blk_parts['cy']]
    contrib_a = _clip_edges_lanes(
        bx, by, bx[1:] + bx[:1], by[1:] + by[:1],
        _planes_of(all_parts, ea))
    # pass 2: all's edges vs blk planes (boundary-coincidence tie rules)
    axc = [ea(v) for v in all_parts['cx']]
    ayc = [ea(v) for v in all_parts['cy']]
    contrib_b = _clip_edges_lanes(
        axc, ayc, axc[1:] + axc[:1], ayc[1:] + ayc[:1],
        _planes_of(blk_parts, eb), second_pass=True)
    return jnp.abs(contrib_a + contrib_b) / 2


def _blocked_greedy_nms_batched(boxes, scores, valid, thresh, post_maxsize,
                                block=32):
    """Batched blocked greedy NMS: exact greedy semantics, ~block x fewer
    sequential iterations than `_lazy_greedy_nms_batched`.

    Greedy NMS processes candidates in global score order, and whether a
    candidate is kept depends only on earlier (higher-scored) candidates. So
    the next `block` highest live candidates can be resolved together: an
    m x m within-block IoU closure (unrolled, fully fused by XLA) commits up
    to `block` boxes per while-iteration instead of one. This is the TPU
    analog of the reference's 64-box-block bitmask nms_kernel
    (iou3d_nms_kernel.cu:267-313) — there a thread block resolves 64
    candidates per step; here the closure rides one VPU fusion.

    Per-box clipping geometry (corners, half-planes, areas — all the trig)
    is computed ONCE for the whole candidate set before the loop; each
    iteration only gathers the m block rows and runs the pure pair kernel.

    Args:
        boxes (B, N, 7); scores (B, N); valid (B, N).
    Returns:
        out_idx (B, post_maxsize) int32, num_kept (B,) int32.

    Precondition: scores must DESCEND along N (callers sort via top_k
    first). The kept set is order-independent, but the returned indices are
    emitted in position order, which equals greedy commit order only for
    sorted input.
    """
    b, n = scores.shape
    m = min(block, n)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    live0 = valid & (scores > neg_inf)  # sorted order == score order
    midx = jnp.arange(m)

    all_parts = _lane_parts(boxes)  # dict of (B, N) component arrays

    def gather_parts(idx):  # idx (B, m) -> blk lane parts
        g = lambda x: jnp.take_along_axis(x, idx, axis=1)
        return jax.tree_util.tree_map(g, all_parts)

    def iou_blocks_fn(blk_parts, other_parts):
        overlap = _overlap_blocks_lanes(blk_parts, other_parts)  # (B, m, N')
        return overlap / jnp.clip(
            blk_parts['area'][:, :, None] + other_parts['area'][:, None, :]
            - overlap, 1e-6, None)

    def cond(state):
        live, kept, count = state
        active = (count < post_maxsize) & jnp.any(live, axis=1)
        return jnp.any(active)

    def body(state):
        live, kept, count = state
        active = (count < post_maxsize) & jnp.any(live, axis=1)
        # next m candidates in greedy (== position) order: first m live
        # positions, found with a cumsum instead of a (B, N) top_k
        ord_ = jnp.cumsum(live.astype(jnp.int32), axis=1)
        eq = live[:, :, None] & (ord_[:, :, None] == (midx + 1)[None, None, :])
        top_i = jnp.argmax(eq, axis=1).astype(jnp.int32)  # (B, m)
        blk_valid = jnp.any(eq, axis=1)
        blk_parts = gather_parts(top_i)
        # within-block IoU computed directly (m x m pairs is far cheaper
        # than gathering columns out of the (B, m, N) matrix)
        iou_blk = iou_blocks_fn(blk_parts, blk_parts)
        sup = iou_blk > thresh  # sup[b, j, i]: j suppresses i
        # ordered greedy closure: keep[i] iff valid and no kept j<i overlaps;
        # keep[j] for j<i is final when step i runs, so this is exact
        # greedy. Grouped evaluation keeps the sequential-latency chain
        # short: per group one batched prefix reduce + a fully-fusible
        # boolean expansion of the within-group triangle (a flat m-step
        # chain of tiny ops was latency-bound on TPU).
        grp = 8
        keep_cols = []
        for g0 in range(0, m, grp):
            gw = min(grp, m - g0)
            if g0:
                prefix = jnp.stack(keep_cols, axis=1)  # (B, g0)
                inc = jnp.any(prefix[:, :, None] & sup[:, :g0, g0:g0 + gw],
                              axis=1)  # (B, gw)
            else:
                inc = jnp.zeros((b, gw), bool)
            for t in range(gw):
                i = g0 + t
                s = inc[:, t]
                for u in range(t):
                    s = s | (keep_cols[g0 + u] & sup[:, g0 + u, i])
                keep_cols.append(blk_valid[:, i] & ~s)
        keep = jnp.stack(keep_cols, axis=1) & active[:, None]
        ordinal = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # per-kept
        commit = keep & (count[:, None] + ordinal < post_maxsize)
        # greedy keeps candidates in score order, and ranks are score order,
        # so a bool mask over ranks IS the result — no scatter into an
        # ordered output buffer (XLA:TPU scatters serialize per row)
        commit_full = jnp.any(
            (top_i[:, :, None] == jnp.arange(n)[None, None, :])
            & commit[..., None], axis=1)  # (B, N)
        kept = kept | commit_full
        # committed boxes are removed explicitly (self-IoU of identical
        # rectangles is a degenerate clipping case that can round to 0 on
        # TPU) plus everything they overlap; capacity-clipped keeps stay
        # live (their sample goes inactive once count hits post_maxsize)
        iou_all = iou_blocks_fn(blk_parts, all_parts)
        supp = jnp.any((iou_all > thresh) & commit[..., None], axis=1)
        live = live & ~((supp | commit_full) & active[:, None])
        count = count + commit.sum(axis=1)
        return live, kept, count

    kept0 = jnp.zeros((b, n), bool)
    _, kept, num_kept = jax.lax.while_loop(
        cond, body, (live0, kept0, jnp.zeros((b,), jnp.int32)))
    # extract kept ranks ascending (== commit order) into fixed post size:
    # position-of-jth-set-bit via cumsum+equality (cheaper than a top_k
    # sort over ranks)
    ord_ = jnp.cumsum(kept.astype(jnp.int32), axis=1)
    p = min(post_maxsize, n)
    eq = kept[:, :, None] & (
        ord_[:, :, None] == (jnp.arange(p, dtype=jnp.int32) + 1)[None, None, :])
    out_idx = jnp.argmax(eq, axis=1).astype(jnp.int32)  # (B, p)
    if p < post_maxsize:
        out_idx = jnp.pad(out_idx, ((0, 0), (0, post_maxsize - p)))
    mask = jnp.arange(post_maxsize)[None, :] < num_kept[:, None]
    return jnp.where(mask, out_idx, 0), num_kept


def nms_bev_batched(boxes, scores, thresh, pre_maxsize, post_maxsize,
                    valid_mask=None, block=32, assume_sorted=False,
                    adaptive_tier=512):
    """Batched rotated-BEV greedy NMS.

    Args: boxes (B, N, 7); scores (B, N); valid_mask (B, N) optional.
        assume_sorted: scores already descend along N (with invalid rows at
            the tail) — e.g. straight out of a top-k — so the pre-NMS sort
            is skipped (saves a (B, N) sort when pre_maxsize == N).
        adaptive_tier: when the LIVE candidate count fits in this many rows
            (common: score-thresh kills most of NMS_PRE_MAXSIZE), run the
            greedy loop on the sorted prefix of that width under a
            lax.cond — the per-iteration (block x N') IoU sweep shrinks
            pre/tier-fold with EXACT semantics (live rows sort to a
            prefix). 0 disables.
    Returns: (indices (B, post) into the input N axis, keep_mask (B, post),
    num_kept (B,)). Per-sample semantics identical to `nms_bev`.
    """
    bsz = scores.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones(scores.shape, dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    masked = jnp.where(valid_mask, scores, neg_inf)
    k = min(pre_maxsize, boxes.shape[1])
    if assume_sorted and k == boxes.shape[1]:
        top_scores = masked
        order = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :],
                                 masked.shape)
        top_boxes = boxes
    else:
        top_scores, order = jax.lax.top_k(masked, k)  # (B, k)
        top_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    top_valid = top_scores > neg_inf

    def _run(k2):
        kept, num = _blocked_greedy_nms_batched(
            top_boxes[:, :k2], top_scores[:, :k2], top_valid[:, :k2],
            thresh, post_maxsize, block=block)
        return kept, num

    if adaptive_tier and k > adaptive_tier:
        live_max = top_valid.sum(axis=1).max()
        kept_local, num_kept = jax.lax.cond(
            live_max <= adaptive_tier,
            lambda: _run(adaptive_tier), lambda: _run(k))
    else:
        kept_local, num_kept = _run(k)
    keep_mask = jnp.arange(post_maxsize)[None, :] < num_kept[:, None]
    out = jnp.where(keep_mask,
                    jnp.take_along_axis(order, kept_local, axis=1).astype(jnp.int32),
                    0)
    return out, keep_mask, num_kept


def nms_bev(boxes, scores, thresh, pre_maxsize, post_maxsize, valid_mask=None):
    """Rotated-BEV greedy NMS with fixed-size output.

    Args:
        boxes: (N, 7); scores: (N,); valid_mask: (N,) optional.
        thresh: BEV-IoU suppression threshold.
        pre_maxsize: static top-k candidate count (reference NMS_PRE_MAXSIZE).
        post_maxsize: static output size (reference NMS_POST_MAXSIZE).
    Returns:
        (indices (post_maxsize,) int32 into `boxes` — padded with 0,
         keep_mask (post_maxsize,) bool,
         num_kept scalar int32)

    Replaces iou3d_nms_utils.nms_gpu (iou3d_nms_utils.py:79-95): the dynamic
    `order[keep]` result becomes a fixed-size padded index vector + mask, the
    shape discipline every downstream consumer in this framework uses.
    """
    if valid_mask is None:
        valid_mask = jnp.ones(scores.shape, dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    masked_scores = jnp.where(valid_mask, scores, neg_inf)
    k = min(pre_maxsize, boxes.shape[0])
    top_scores, order = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[order]
    top_valid = top_scores > neg_inf

    def iou_row(box, all_boxes):
        overlap = _pair_overlap_bev(box[None, :], all_boxes)  # (k,)
        area_cur = box[3] * box[4]
        areas = all_boxes[:, 3] * all_boxes[:, 4]
        return overlap / jnp.clip(area_cur + areas - overlap, 1e-6, None)

    kept_local, num_kept = _lazy_greedy_nms(
        top_boxes, top_scores, top_valid, thresh, post_maxsize, iou_row)
    keep_mask = jnp.arange(post_maxsize) < num_kept
    out = jnp.where(keep_mask, order[kept_local].astype(jnp.int32), 0)
    return out, keep_mask, num_kept


def nms_normal_bev(boxes, scores, thresh, pre_maxsize, post_maxsize, valid_mask=None):
    """Axis-aligned ('normal') NMS — nms_normal_gpu (iou3d_nms_utils.py:98-112).

    The reference's nms_normal_kernel still evaluates the rotated overlap
    formula but is invoked on boxes whose headings make it axis-aligned in
    practice; we use the nearest-aligned IoU which matches that use."""
    if valid_mask is None:
        valid_mask = jnp.ones(scores.shape, dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    masked_scores = jnp.where(valid_mask, scores, neg_inf)
    k = min(pre_maxsize, boxes.shape[0])
    top_scores, order = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[order]
    top_valid = top_scores > neg_inf

    aligned = boxes3d_lidar_to_aligned_bev_boxes(top_boxes)

    def iou_row(box, all_boxes):
        del all_boxes  # closed-over aligned form used instead
        b = boxes3d_lidar_to_aligned_bev_boxes(box[None, :])
        return boxes_iou_normal(b, aligned)[0]

    kept_local, num_kept = _lazy_greedy_nms(
        top_boxes, top_scores, top_valid, thresh, post_maxsize, iou_row)
    keep_mask = jnp.arange(post_maxsize) < num_kept
    out = jnp.where(keep_mask, order[kept_local].astype(jnp.int32), 0)
    return out, keep_mask, num_kept
