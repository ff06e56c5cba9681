"""PointNet++ primitive ops, TPU-native.

Replaces both CUDA extension families of the reference
(pcdet/ops/pointnet2/pointnet2_batch/src/*.cu and pointnet2_stack/src/*.cu):
farthest point sampling, ball query, grouping, three-NN interpolation. The
reference maintains two layouts (dense batch and ragged "stack" with
prefix-count offsets); here there is one: fixed-capacity padded batches
(B, N, ...) with validity masks — the ragged stack layout exists only to
dodge padding, which XLA wants anyway.

All functions are jit/vmap/grad-safe with static shapes.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e10

_GRID_MIN_SOURCES = 4096

# Tests: route grid_ball_query_multi through the Pallas row-run kernel in
# interpret mode on CPU (pins the TPU path's semantics without a chip).
_FORCE_KERNEL_INTERPRET = False


@dataclasses.dataclass(frozen=True)
class PointOpKnobs:
    """TPU approximation knobs for the point ops, threaded explicitly.

    Carried as a (hashable) module attribute by every network module that
    calls fps/ball_query — never module globals, so two models with
    different settings coexist in one process. `PointOpKnobs()` (and
    knobs=None) means EXACT semantics everywhere; build_network constructs
    the shipping values from MODEL.{BALL_QUERY_APPROX_RECALL, FPS_SECTORS,
    BALL_QUERY_GRID_CELL_CAP} + the dataset's POINT_CLOUD_RANGE.

    All knobs only engage on TPU: CPU stays exact so golden tests pin the
    CUDA reference semantics.

    Attributes:
        bq_recall: approx_max_k recall target for ball-query top-k
            (None = exact top_k).
        bq_grid: (bounds6, cell_cap) enabling grid-bucketed ball query for
            source sets >= 4096 points (None = brute force).
        fps_sectors: sector count for sectorized FPS (None/1 = exact
            sequential FPS).
    """

    bq_recall: float | None = None
    bq_grid: tuple | None = None
    fps_sectors: int | None = None

    @staticmethod
    def from_config(model_cfg, point_cloud_range):
        """Shipping knobs from a MODEL cfg dict (defaults = TPU fast path)."""
        recall = model_cfg.get('BALL_QUERY_APPROX_RECALL', 0.95)
        sectors = model_cfg.get('FPS_SECTORS', 32)
        cap = model_cfg.get('BALL_QUERY_GRID_CELL_CAP', None)
        grid = None
        if cap and point_cloud_range is not None:
            grid = (tuple(float(v) for v in point_cloud_range), int(cap))
        return PointOpKnobs(bq_recall=recall, bq_grid=grid,
                            fps_sectors=sectors)


def fps(xyz, num_valid, npoint, knobs=None):
    """Dispatch: sectorized FPS on TPU (knobs.fps_sectors), exact elsewhere.

    CPU stays exact so golden tests pin the CUDA reference semantics
    (sampling_gpu.cu:101-170); TPU trades the npoint-long sequential argmax
    chain for PV-RCNN++-style sector-parallel FPS.
    """
    s = knobs.fps_sectors if knobs is not None else None
    if s and s > 1 and jax.default_backend() == 'tpu':
        return sector_fps(xyz, num_valid, npoint, s)
    return farthest_point_sample(xyz, num_valid, npoint)


def _pairwise_d2(a, b):
    """Squared distances (M, N) between (M, 3) and (N, 3) points.

    |a|^2 + |b|^2 - 2 a.b: the cross term is one MXU matmul and no
    (M, N, 3) difference tensor is materialized (the broadcast-subtract
    form costs ~400 MB of HBM traffic at VSA shapes). f32 throughout —
    cancellation at KITTI ranges (~100 m) stays ~1e-4 m^2.
    """
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * cross, 0.0)


def farthest_point_sample(xyz, num_valid, npoint):
    """Iterative farthest point sampling.

    Mirrors furthest_point_sampling_kernel
    (pointnet2_batch/src/sampling_gpu.cu:101-170): start at index 0, then
    repeatedly take the point maximizing the min-distance to the selected
    set. Padding points (index >= num_valid) are never selected.

    Args:
        xyz: (B, N, 3); num_valid: (B,) int32; npoint: static int.
    Returns:
        (B, npoint) int32 indices. If num_valid < npoint, selection repeats
        the farthest pattern over valid points (distance of selected points
        is 0, so argmax keeps picking valid points deterministically).
    """

    def one(pts, n):
        nn = pts.shape[0]
        valid = jnp.arange(nn) < n
        dist = jnp.where(valid, _BIG, -1.0)

        def body(i, carry):
            dist, last, out = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(valid, d, -1.0))
            nxt = jnp.argmax(dist).astype(jnp.int32)
            out = out.at[i].set(nxt)
            return dist, nxt, out

        out0 = jnp.zeros((npoint,), jnp.int32)
        # index 0 is always the first sample (sampling_gpu.cu: idx 0 seed)
        _, _, out = jax.lax.fori_loop(
            1, npoint, body, (dist, jnp.int32(0), out0))
        return out

    return jax.vmap(one)(xyz, num_valid)


def _fps_chunks(pts, valid, k):
    """Exact FPS within each chunk, all chunks in parallel.

    Args: pts (S, c, 3); valid (S, c); k selections per chunk.
    Returns (S, k) int32 local indices (chunk row 0 seeds each chunk,
    matching the reference kernel's index-0 seed, sampling_gpu.cu:101).
    """
    S = pts.shape[0]

    def body(i, carry):
        dist, last, out = carry
        lastpt = jnp.take_along_axis(pts, last[:, None, None], axis=1)
        d = jnp.sum((pts - lastpt) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return dist, nxt, out

    dist0 = jnp.where(valid, _BIG, -1.0)
    out0 = jnp.zeros((S, k), jnp.int32)
    _, _, out = jax.lax.fori_loop(
        1, k, body, (dist0, jnp.zeros((S,), jnp.int32), out0))
    return out


def sector_fps(xyz, num_valid, npoint, n_sectors=32):
    """Sectorized farthest point sampling (TPU-native FPS).

    Exact FPS is a npoint-long sequential argmax chain — 2048 dependent
    steps for PV-RCNN keypoints, hopeless on TPU. Following PV-RCNN++'s
    sectorized proposal-centric sampling (Shi et al. 2022, §4.1 — FPS
    within polar sectors preserves the coverage property that matters),
    points are sorted by BEV polar angle and split into `n_sectors`
    EQUAL-COUNT contiguous chunks (adaptive sector widths), then exact FPS
    runs inside all chunks in parallel: sequential depth drops npoint ->
    npoint/n_sectors while each step is a (S, c) lane-parallel argmax.

    Args:
        xyz: (B, N, 3); num_valid: (B,) int32; npoint, n_sectors: static.
    Returns:
        (B, npoint) int32 indices, sector-major order. Chunks that are all
        padding fall back to the sample's first valid point (dup indices,
        same semantics as exact FPS when num_valid < npoint).
    """
    B, N, _ = xyz.shape
    S = int(n_sectors)
    while npoint % S or N % S:  # degrade to fewer sectors if misaligned
        S //= 2
    if S <= 1:
        return farthest_point_sample(xyz, num_valid, npoint)
    k, c = npoint // S, -(-N // S)
    pos = jnp.arange(N)

    def one(pts, n):
        valid = pos < n
        ang = jnp.where(valid, jnp.arctan2(pts[:, 1], pts[:, 0]), _BIG)
        perm = jnp.argsort(ang).astype(jnp.int32)  # (N,) valid ranks first
        # chunk i covers VALID sorted ranks [i*n/S, (i+1)*n/S): padding never
        # occupies chunk slots, so every sector keeps ~n/S real points even
        # for heavily padded samples (chunk sizes <= ceil(n/S) <= c)
        sec = jnp.arange(S, dtype=jnp.int32)
        start = (sec * n) // S  # S*n << 2**31 for any real scan
        end = ((sec + 1) * n) // S
        rank = start[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
        valid_s = rank < end[:, None]  # (S, c)
        rank = jnp.minimum(rank, N - 1)
        idx_sorted = perm[rank]  # (S, c) original indices
        pts_s = pts[idx_sorted]
        loc = _fps_chunks(pts_s, valid_s, k)  # (S, k)
        idx = jnp.take_along_axis(idx_sorted, loc, axis=1)
        ok = jnp.take_along_axis(valid_s, loc, axis=1)
        return jnp.where(ok, idx, perm[0]).reshape(-1)

    return jax.vmap(one)(xyz, num_valid)


def ball_query(radius, nsample, xyz, xyz_num, new_xyz, new_xyz_valid=None,
               knobs=None):
    """First-`nsample` neighbors within `radius` (index order).

    Mirrors ball_query_kernel (pointnet2_batch/src/ball_query_gpu.cu:15-54):
    slots are pre-filled with the FIRST neighbor found, so groups with fewer
    than nsample neighbors repeat it; centers with no neighbor yield all-0
    indices. Returns (B, M, nsample) int32 plus empty mask (B, M).

    Args:
        xyz: (B, N, 3) source points; xyz_num: (B,) valid counts;
        new_xyz: (B, M, 3) query centers; new_xyz_valid: (B, M) bool;
        knobs: PointOpKnobs (None = exact).
    """
    bq_grid = knobs.bq_grid if knobs is not None else None
    if (bq_grid is not None
            and xyz.shape[1] >= _GRID_MIN_SOURCES
            and jax.default_backend() == 'tpu'):
        bounds, cap = bq_grid
        return grid_ball_query(radius, nsample, xyz, xyz_num, new_xyz,
                               new_xyz_valid, bounds=bounds, cell_cap=cap)
    r2 = radius * radius
    recall = knobs.bq_recall if knobs is not None else None

    def one(src, n, centers, cvalid):
        nn = src.shape[0]
        valid = jnp.arange(nn) < n
        mask = _pairwise_d2(centers, src) < r2
        mask = mask & valid[None, :]  # (M, N)
        if cvalid is not None:
            mask = mask & cvalid[:, None]
        # first nsample hits in index order == the nsample LARGEST values
        # of (-col where hit) — a row-wise top-k, not a scatter (XLA:TPU
        # scatters serialize per element; the old (M, N) slot scatter cost
        # hundreds of ms at VSA shapes)
        score = jnp.where(mask, -jnp.arange(nn, dtype=jnp.float32)[None, :],
                          -jnp.inf)
        if nsample < nn and recall is not None \
                and jax.default_backend() == 'tpu':
            # TPU PartialReduce top-k (~6x cheaper than the sort-based
            # exact lowering at VSA shapes). CAVEAT: recall < 1 is only
            # harmless when a center has MORE than nsample in-radius hits
            # (it then changes which of the surplus fills the group — as
            # arbitrary as the reference's index order). When a center has
            # <= nsample hits, approx_max_k can drop true neighbors
            # outright (slots then repeat the first hit), diverging from
            # the CUDA semantics — disable via knobs.bq_recall=None or cfg
            # MODEL.BALL_QUERY_APPROX_RECALL: null to get the exact path
            # (CPU is always exact, so golden tests match the CUDA
            # semantics bit-for-bit).
            top, _ = jax.lax.approx_max_k(score, nsample,
                                          recall_target=recall)
        else:
            top, _ = jax.lax.top_k(score, min(nsample, nn))
        if nn < nsample:  # fewer sources than sample slots
            top = jnp.pad(top, ((0, 0), (0, nsample - nn)),
                          constant_values=-jnp.inf)
        hit = jnp.isfinite(top)
        out = jnp.where(hit, (-top).astype(jnp.int32), 0)
        cnt = hit.sum(axis=1)
        empty = cnt <= 0
        fill = jnp.where(empty, 0, out[:, 0])
        out = jnp.where(hit, out, fill[:, None])
        return out, empty

    if new_xyz_valid is None:
        return jax.vmap(lambda s, n, c: one(s, n, c, None))(xyz, xyz_num, new_xyz)
    return jax.vmap(one)(xyz, xyz_num, new_xyz, new_xyz_valid)


def ball_query_multi(radii, nsamples, xyz, xyz_num, new_xyz,
                     new_xyz_valid=None, knobs=None):
    """Ball query for several radii over the same sources and centers.

    On TPU with the grid path engaged (knobs.bq_grid) this shares one grid
    + candidate gather across all radii (see grid_ball_query_multi);
    otherwise it is per-radius `ball_query`. Returns [(idx, empty)] per
    radius.
    """
    bq_grid = knobs.bq_grid if knobs is not None else None
    if (bq_grid is not None
            and xyz.shape[1] >= _GRID_MIN_SOURCES
            and jax.default_backend() == 'tpu'):
        bounds, cap = bq_grid
        return grid_ball_query_multi(radii, nsamples, xyz, xyz_num, new_xyz,
                                     new_xyz_valid, bounds=bounds,
                                     cell_cap=cap)
    return [ball_query(r, ns, xyz, xyz_num, new_xyz, new_xyz_valid,
                       knobs=knobs)
            for r, ns in zip(radii, nsamples)]


def _overlapped_candidates(src_sorted, order, start, cap):
    """Fetch candidate runs [start, start+cap) as single wide-row gathers.

    XLA:TPU gather cost scales with the INDEX COUNT (~12 ns/index measured,
    tools/microbench_bq.py), not bytes: per-element row gathers of the
    (M, 27*cap) candidate matrix cost ~270 ms/batch at VSA shapes and
    vmapped dynamic slices ~915 ms. Packing the cell-sorted table as
    HALF-OVERLAPPED rows — row i holds points [i*cap, i*cap + 2*cap) ×
    (x, y, z, orig) — lets one 2·cap-point row (2 KB at cap=64) cover any
    cap-long run, so the fetch is ONE row gather per (center, cell):
    ~55k indices/scan, ~5 ms/batch.

    The packed table is FIELD-MAJOR per block (x-run, y-run, z-run,
    orig-run), so every downstream tensor keeps a clean 128-lane minor dim:
    the earlier point-major (..., 2*cap, 4) layout made XLA tile the 4-wide
    (or the 27-wide) dim onto the 128 lanes, inflating the candidate and
    score temps ~4.7x and OOMing PV-RCNN eval at batch 8.

    Args:
        src_sorted: (N, 3) cell-sorted coords; order: (N,) original indices;
        start: (M, 27) run starts (end-of-run masking is the caller's,
        via positions); cap: static run cap.
    Returns:
        cand_x, cand_y, cand_z (M, 27, 2*cap) f32, cand_orig (M, 27, 2*cap)
        int32, pos (M, 27, 2*cap) int32 positions in the sorted table.
    """
    cand, pos = _candidate_windows(src_sorted, order, start, cap)

    def field(f):
        return cand[..., f * 2 * cap:(f + 1) * 2 * cap]

    return (field(0), field(1), field(2),
            field(3).astype(jnp.int32), pos)


def _candidate_windows(src_sorted, order, start, cap, nw=2):
    """Packed candidate windows: one row gather per (center, cell/run).

    Returns cand (M, n_off, 4*nw*cap) f32 — field-major rows
    [x_0..x_{nw-1} | y_... | z_... | o_...] so each field's nw*cap
    candidates are one contiguous slice — plus pos (M, n_off, nw*cap)
    global positions in the sorted table. A window of nw blocks covers any
    run of <= (nw-1)*cap rows regardless of its offset inside block 0.
    """
    n = src_sorted.shape[0]
    nb = -(-n // cap) + 2  # blocks, incl. one padding block past the end
    pad_len = nb * cap + (nw - 1) * cap - n
    fields = jnp.concatenate(
        [src_sorted.T, order.astype(jnp.float32)[None, :]], axis=0)  # (4, N)
    fields = jnp.pad(fields, ((0, 0), (0, pad_len)), constant_values=_BIG)
    views = [fields[:, j * cap:(j + nb) * cap].reshape(4, nb, cap)
             for j in range(nw)]
    table = jnp.stack(views, axis=1)  # (4, nw, nb, cap)
    table = jnp.transpose(table, (2, 0, 1, 3)).reshape(nb, 4 * nw * cap)

    blk = jnp.minimum(start // cap, nb - 1)  # start <= N => blk <= nb-2
    cand = table[blk]  # (M, n_off, 4*nw*cap) — the single row gather
    pos = blk[..., None] * cap + jnp.arange(nw * cap, dtype=jnp.int32)
    return cand, pos


def _cell_boundaries(sk, n_cells):
    """Start offsets of every cell in the sorted key table.

    boundaries[c] = first row with key >= c, for c in [0, n_cells+2]:
    one merge against the sorted keys, replacing two searchsorted calls
    per radius set (queries arange(n_cells+3) are pre-sorted).
    """
    return jnp.searchsorted(
        sk, jnp.arange(n_cells + 3, dtype=sk.dtype),
        method='sort').astype(jnp.int32)


def grid_ball_query_multi(radii, nsamples, xyz, xyz_num, new_xyz,
                          new_xyz_valid=None, bounds=None, cell_cap=64):
    """Multi-radius grid ball query sharing ONE grid + candidate gather.

    The (M, 27*cell_cap) candidate row gather is the dominant cost of
    `grid_ball_query` on TPU (XLA serialises row gathers); MSG set
    abstraction calls it once per radius over the SAME sources and centers.
    Building the grid at cell = max(radii) keeps the in-radius guarantee for
    every smaller radius (any r <= cell stays within the 3x3x3 cell
    neighborhood), so candidates, distances and index gathers are computed
    once and only the final distance test + top-k run per radius.

    Returns a list of (idx (B, M, nsample_i), empty (B, M)) pairs, one per
    radius, each matching `ball_query`'s contract.
    """
    assert bounds is not None, 'grid_ball_query needs a static range'
    x0, y0, z0, x1, y1, z1 = (float(v) for v in bounds)
    cell = float(max(radii))
    gx = max(int(np.ceil((x1 - x0) / cell)), 1)
    gy = max(int(np.ceil((y1 - y0) / cell)), 1)
    gz = max(int(np.ceil((z1 - z0) / cell)), 1)
    n_cells = gx * gy * gz
    origin = jnp.asarray([x0, y0, z0], jnp.float32)
    dims = jnp.asarray([gx, gy, gz], jnp.int32)

    def cell_of(p):
        c = jnp.floor((p - origin) / cell).astype(jnp.int32)
        return jnp.clip(c, 0, dims - 1)

    def cell_key(c):
        return (c[..., 2] * gy + c[..., 1]) * gx + c[..., 0]

    # static z trim: a grid with gz <= 2 z-layers never has more than gz
    # distinct z neighbors, so enumerate ABSOLUTE z layers instead of
    # relative dz — coarse-radius sources (e.g. VSA x_conv4, cell 4.8 m
    # over a 4 m z range) drop from 27 to 9 neighbor cells, a 3x cut in
    # candidate-gather traffic
    if gz <= 2:
        off_xy = jnp.asarray(
            [[dx, dy] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
            jnp.int32)  # (9, 2)
        n_off = 9 * gz

        def neighbor_cells(cc):
            m_ = cc.shape[0]
            xy = cc[:, None, None, :2] + off_xy[None, :, None, :]
            xy = jnp.broadcast_to(xy, (m_, 9, gz, 2))
            z = jnp.broadcast_to(
                jnp.arange(gz, dtype=jnp.int32)[None, None, :, None],
                (m_, 9, gz, 1))
            return jnp.concatenate([xy, z], axis=-1).reshape(m_, n_off, 3)
    else:
        off = jnp.asarray(
            [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
             for dx in (-1, 0, 1)], jnp.int32)  # (27, 3)
        n_off = 27

        def neighbor_cells(cc):
            return cc[:, None, :] + off[None, :, :]

    # x-run merge (TPU path): cells (x-1, x, x+1) at one (y, z) are
    # CONSECUTIVE keys (key = (z*gy + y)*gx + x), so their candidate runs
    # are one contiguous range of the sorted table. Each center then needs
    # n_row = 3*gz (gz <= 2) or 9 row-runs instead of 27/9*gz cell windows:
    # 3x fewer billed gather indices (XLA:TPU gathers bill per index) and
    # ~1.5x fewer candidate lanes through the select kernel (one 4-block
    # window per run vs three 2-block windows).
    NW = 4  # window blocks per run: covers run <= 3*cap at any offset
    if gz <= 2:
        # rows enumerate ABSOLUTE z layers x dy; table keyed by xy cell
        n_row = 3 * gz
        row_ds = [zz * gx * gy + dy * gx
                  for dy in (-1, 0, 1) for zz in range(gz)]
        row_dy = [dy for dy in (-1, 0, 1) for _ in range(gz)]
        row_dz = [None] * n_row  # z is absolute: always valid
        n_keys = gx * gy
    else:
        n_row = 9
        row_ds = [(dz * gy + dy) * gx
                  for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
        row_dy = [dy for _ in (-1, 0, 1) for dy in (-1, 0, 1)]
        row_dz = [dz for dz in (-1, 0, 1) for _ in (-1, 0, 1)]
        n_keys = n_cells

    def prep(src, n, centers, cvalid):
        """Sort + row-run lookup + candidate windows (everything but select)."""
        nn_ = src.shape[0]
        valid = jnp.arange(nn_) < n
        ck = jnp.where(valid, cell_key(cell_of(src)), n_cells)
        # one multi-operand stable sort carries keys, coords and original
        # indices together — argsort + three re-gathers cost ~6 ms/batch
        # more (XLA:TPU gathers bill ~12 ns per INDEX, microbench_bq.py)
        iota = jnp.arange(nn_, dtype=jnp.int32)
        sk, sx, sy, sz, order = jax.lax.sort(
            (ck, src[:, 0], src[:, 1], src[:, 2], iota),
            dimension=0, num_keys=1, is_stable=True)
        src_sorted = jnp.stack([sx, sy, sz], axis=1)
        # boundaries[k] = first sorted position with key >= k, via
        # scatter-min + reverse cummin (~0.6 ms; the searchsorted
        # method='sort' merge costs ~4.4 ms/sample at raw-scan shapes)
        tbl = jnp.full((n_cells + 3,), nn_, jnp.int32).at[sk].min(
            iota, mode='drop')
        bt = jax.lax.associative_scan(jnp.minimum, tbl[::-1])[::-1]

        # Per-CELL run table, no per-center tab4 gather: for interior
        # cells, row j's run covers keys [key + D_j - 1, key + D_j + 2),
        # i.e. start/end are CONSTANT shifts of the boundary table; x
        # borders pick the un-/less-shifted variant. All vector ops over
        # the n_keys cells + ONE small row gather per center (the old
        # (M, n_row) 4-wide tab4 gather cost ~3 ms/sample).
        pad = n_cells + 4
        btp = jnp.pad(bt, (pad, pad), mode='edge')

        def shifted(d):
            return jax.lax.slice(btp, (pad + d,), (pad + d + n_keys,))

        kk = jnp.arange(n_keys, dtype=jnp.int32)
        cx_ = kk % gx
        cy_ = (kk // gx) % gy
        cz_ = kk // (gx * gy)
        x_gt0 = cx_ > 0
        x_lt = cx_ < gx - 1
        cols = []
        for j in range(n_row):
            d = row_ds[j]
            ok_j = (cy_ + row_dy[j] >= 0) & (cy_ + row_dy[j] < gy)
            if row_dz[j] is not None:
                ok_j &= (cz_ + row_dz[j] >= 0) & (cz_ + row_dz[j] < gz)
            start_j = jnp.where(x_gt0, shifted(d - 1), shifted(d))
            end_j = jnp.where(x_lt, shifted(d + 2), shifted(d + 1))
            end_j = jnp.where(ok_j, jnp.maximum(end_j, start_j), start_j)
            cols.append(start_j)
            cols.append(end_j)
        runs = jnp.stack(cols, axis=1)  # (n_keys, 2*n_row)

        cc = cell_of(centers)  # (M, 3)
        if gz <= 2:
            key = cc[:, 1] * gx + cc[:, 0]
        else:
            key = cell_key(cc)
        se = runs[key]  # (M, 2*n_row) — the single row gather
        start = se[:, 0::2]
        end = se[:, 1::2]
        end = jnp.minimum(end, start + (NW - 1) * cell_cap)
        if cvalid is not None:
            # invalid centers: empty run => no hits => empty-group output
            end = jnp.where(cvalid[:, None], end, start)
        cand, _ = _candidate_windows(src_sorted, order, start, cell_cap,
                                     nw=NW)
        return cand, start, end

    def decode(top, nsample):
        """(B, M, k) f32 scores -> ball_query's (idx, empty) contract."""
        if top.shape[-1] < nsample:
            top = jnp.pad(
                top, ((0, 0), (0, 0), (0, nsample - top.shape[-1])),
                constant_values=-jnp.inf)
        got = jnp.isfinite(top)
        out = jnp.where(got, (-top).astype(jnp.int32), 0)
        empty = got.sum(axis=-1) <= 0
        fill = jnp.where(empty, 0, out[..., 0])
        return jnp.where(got, out, fill[..., None]), empty

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu or _FORCE_KERNEL_INTERPRET:
        # selection runs in the Pallas kernel: one pass over the candidate
        # windows for ALL radii, no top_k sorts (ops/select_tpu.py)
        from .select_tpu import ball_select
        if new_xyz_valid is None:
            cand, start, end = jax.vmap(
                lambda s, n, c: prep(s, n, c, None))(xyz, xyz_num, new_xyz)
        else:
            cand, start, end = jax.vmap(prep)(
                xyz, xyz_num, new_xyz, new_xyz_valid)
        b, m = new_xyz.shape[:2]
        nb_blocks = -(-xyz.shape[1] // cell_cap) + 2
        tops = ball_select(
            cand.reshape(b * m, n_row, 4 * NW * cell_cap),
            start.reshape(b * m, n_row), end.reshape(b * m, n_row),
            new_xyz.reshape(b * m, 3).astype(jnp.float32),
            radii, nsamples, cell_cap, nb_blocks, nw=NW,
            interpret=not on_tpu)
        return [decode(t.reshape(b, m, -1), ns)
                for t, ns in zip(tops, nsamples)]

    def one(src, n, centers, cvalid):
        nn_ = src.shape[0]
        valid = jnp.arange(nn_) < n
        ck = jnp.where(valid, cell_key(cell_of(src)), n_cells)
        iota = jnp.arange(nn_, dtype=jnp.int32)
        sk, sx, sy, sz, order = jax.lax.sort(
            (ck, src[:, 0], src[:, 1], src[:, 2], iota),
            dimension=0, num_keys=1, is_stable=True)
        src_sorted = jnp.stack([sx, sy, sz], axis=1)
        bounds_tab = _cell_boundaries(sk, n_cells)
        se_tab = jnp.stack([bounds_tab[:-1], bounds_tab[1:]], axis=1)

        cc = cell_of(centers)  # (M, 3)
        nb = neighbor_cells(cc)  # (M, n_off, 3)
        ok_cell = jnp.all((nb >= 0) & (nb < dims), axis=-1)
        nk = jnp.where(ok_cell, cell_key(nb), n_cells + 1)
        se = se_tab[nk]
        start = se[..., 0]
        end = jnp.minimum(se[..., 1], start + cell_cap)
        m_ = centers.shape[0]

        cx, cy, cz, orig, pos = _overlapped_candidates(
            src_sorted, order, start, cell_cap)
        live = ((pos >= start[..., None]) & (pos < end[..., None]))
        d2 = ((cx - centers[:, None, None, 0]) ** 2
              + (cy - centers[:, None, None, 1]) ** 2
              + (cz - centers[:, None, None, 2]) ** 2)
        w = 2 * cell_cap  # per-cell candidate window width
        neg_orig = -orig.astype(jnp.float32)  # (m_, n_off, w)

        results = []
        for radius, nsample in zip(radii, nsamples):
            hit = live & (d2 < float(radius) ** 2)
            if cvalid is not None:
                hit = hit & cvalid[:, None, None]
            score = jnp.where(hit, neg_orig, -jnp.inf)
            # EXACT two-stage first-nsample-by-index selection: any global
            # top hit is also within its own cell's first-nsample (a hit
            # outside its cell's top-k would need nsample lower-index hits
            # in that cell alone), so a per-cell top-k followed by a merge
            # over n_off*k lanes equals one top-k over the full n_off*w
            # width — which costs ~3x more (top_k is superlinear in row
            # width: 11 ms @1728 vs 32 ms @3456 lanes, microbench_bq.py).
            k1 = min(nsample, w)
            s1, _ = jax.lax.top_k(score, k1)  # (m_, n_off, k1)
            s1 = s1.reshape(m_, n_off * k1)
            k = min(nsample, n_off * k1)
            top, _ = jax.lax.top_k(s1, k)
            if k < nsample:
                top = jnp.pad(top, ((0, 0), (0, nsample - k)),
                              constant_values=-jnp.inf)
            got = jnp.isfinite(top)
            out = jnp.where(got, (-top).astype(jnp.int32), 0)
            empty = got.sum(axis=1) <= 0
            fill = jnp.where(empty, 0, out[:, 0])
            results.append((jnp.where(got, out, fill[:, None]), empty))
        return tuple(results)

    if new_xyz_valid is None:
        out = jax.vmap(lambda s, n, c: one(s, n, c, None))(
            xyz, xyz_num, new_xyz)
    else:
        out = jax.vmap(one)(xyz, xyz_num, new_xyz, new_xyz_valid)
    return list(out)


def grid_ball_query(radius, nsample, xyz, xyz_num, new_xyz,
                    new_xyz_valid=None, bounds=None, cell_cap=64):
    """Ball query through a static 3D cell grid (cells of size `radius`).

    Same contract as `ball_query` (first-`nsample` in-radius neighbors in
    index order, slots back-filled with the first hit), but each center
    only examines the points inside its 3x3x3 cell neighborhood — any
    in-radius neighbor lies there by construction — so the pairwise work
    drops from M*N to M*27*cell_cap (e.g. 16k -> ~1.7k per center at VSA
    shapes). This is the bucketed neighbor search SURVEY §7.6 calls for,
    replacing the brute-force ball_query_kernel scan
    (pointnet2_stack/src/ball_query_gpu.cu:16-40).

    Exactness: exact versus `ball_query` whenever every grid cell holds at
    most `cell_cap` source points; cells beyond the cap drop their excess
    points from candidacy (index order means the DROPPED ones are the
    highest-index points in that cell — the same arbitrary-surplus class
    the reference's first-K-found semantics already has). Centers/points
    outside `bounds` are clamped into the border cells; the distance test
    keeps correctness (border cells just see more candidates).

    Args:
        xyz: (B, N, 3); xyz_num: (B,); new_xyz: (B, M, 3);
        bounds: static (x0, y0, z0, x1, y1, z1) point-cloud range.
        cell_cap: static max source points considered per cell.
    Returns (B, M, nsample) int32 indices + (B, M) empty mask.
    """
    return grid_ball_query_multi(
        (radius,), (nsample,), xyz, xyz_num, new_xyz,
        new_xyz_valid=new_xyz_valid, bounds=bounds, cell_cap=cell_cap)[0]


def roi_candidates(src, src_num, centers, r_cand, k_cand):
    """Per-RoI candidate prefilter for RoI-grid pooling.

    For each RoI center, the `k_cand` LOWEST-INDEX source points within
    `r_cand` of the center (so every in-radius neighbor of every grid point
    of that RoI is a candidate: grid points lie inside the box, hence within
    half-diagonal of the center, and r_cand = half_diag + max_radius).
    Candidates come out in ascending original-index order, so candidate
    POSITION order equals the reference's first-by-index order
    (ball_query_gpu.cu:16-40) and the per-grid-point selection can run over
    K lanes instead of N.

    Exactness: exact whenever a RoI has <= k_cand sources within r_cand;
    beyond the cap the HIGHEST-index sources drop from candidacy — the same
    arbitrary-surplus class as `grid_ball_query`'s cell cap.

    Args:
        src: (B, N, 3); src_num: (B,); centers: (B, R, 3) RoI centers;
        r_cand: (B, R) per-RoI candidate radius; k_cand: static int.
    Returns:
        cand_idx (B, R, K) int32 ascending, cand_live (B, R, K) bool.
    """

    def one(s, n, c, rc):
        nn_ = s.shape[0]
        valid = jnp.arange(nn_) < n
        d2 = _pairwise_d2(c, s)  # (R, N)
        mask = (d2 < rc[:, None] ** 2) & valid[None, :]
        score = jnp.where(mask, -jnp.arange(nn_, dtype=jnp.float32)[None, :],
                          -jnp.inf)
        k = min(k_cand, nn_)
        top, _ = jax.lax.top_k(score, k)
        if k < k_cand:
            top = jnp.pad(top, ((0, 0), (0, k_cand - k)),
                          constant_values=-jnp.inf)
        live = jnp.isfinite(top)
        return jnp.where(live, (-top).astype(jnp.int32), 0), live

    return jax.vmap(one)(src, src_num, centers, r_cand)


def candidate_rank_select(cand_xyz, cand_live, grid, radius, nsample):
    """First-`nsample`-by-candidate-rank selection matrices per grid point.

    Replaces the per-grid-point ball query + index gather with a boolean
    selection tensor that feeds an MXU einsum (sel @ values): no top_k over
    wide lanes and no element gathers. Ranks come from a cumsum over the K
    candidate lanes; slots past the hit count select the FIRST hit,
    reproducing the CUDA back-fill (ball_query_gpu.cu:44-52).

    Args:
        cand_xyz: (B, R, K, 3) candidate coords (ascending-index order);
        cand_live: (B, R, K) bool; grid: (B, R, G, 3) grid points;
        radius, nsample: static.
    Returns:
        sel (B, R, G, nsample, K) bool, empty (B, R, G) bool.
    """
    d2 = jnp.sum((grid[:, :, :, None, :] - cand_xyz[:, :, None, :, :]) ** 2,
                 axis=-1)  # (B, R, G, K)
    hit = cand_live[:, :, None, :] & (d2 < float(radius) ** 2)
    cum = jnp.cumsum(hit.astype(jnp.int32), axis=-1)
    cnt = cum[..., -1]  # (B, R, G)
    slots = jnp.arange(nsample, dtype=jnp.int32)
    rank_sel = hit[..., None, :] & (cum[..., None, :] == 1 + slots[:, None])
    first_hit = hit & (cum == 1)
    slot_valid = slots[None, None, None] < cnt[..., None]  # (B, R, G, ns)
    sel = jnp.where(slot_valid[..., None], rank_sel,
                    first_hit[..., None, :])
    return sel, cnt == 0


def group_points(features, idx):
    """Gather feature groups: (B, N, C), (B, M, ns) -> (B, M, ns, C).

    Replaces group_points_kernel (group_points_gpu.cu:14-52) — on TPU a
    plain batched gather.
    """
    return jax.vmap(lambda f, i: f[i])(features, idx)


def three_nn(query, query_valid, src, src_num):
    """3 nearest source points per query (interpolate_gpu.cu:16-52).

    Args: query (B, M, 3); src (B, N, 3); src_num (B,).
    Returns: dists (B, M, 3), idx (B, M, 3) int32.
    """

    def one(q, s, n):
        nn_ = s.shape[0]
        valid = jnp.arange(nn_) < n
        d2 = jnp.where(valid[None, :], _pairwise_d2(q, s), _BIG)
        # exact 3-NN via three unrolled min-extract passes. top_k lowers
        # to a full bitonic sort of every row (~log^2(N) passes); three
        # masked argmin sweeps are ~50x less vector work at FP1 shapes
        # (16384 x 4096) and XLA fuses the equality mask into the next
        # reduce, so d2 is only re-read, never rewritten. Ties resolve to
        # the lowest index in both formulations (argmin-first semantics,
        # matching the CUDA three_nn scan, interpolate_gpu.cu:16-52).
        lanes = jnp.arange(nn_, dtype=jnp.int32)[None, :]
        dists, idxs = [], []
        for _ in range(3):
            i = jnp.argmin(d2, axis=1).astype(jnp.int32)
            dd = jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]
            dists.append(dd)
            idxs.append(i)
            d2 = jnp.where(lanes == i[:, None], _BIG, d2)
        d = jnp.stack(dists, axis=1)
        return jnp.sqrt(jnp.maximum(d, 0.0)), jnp.stack(idxs, axis=1)

    return jax.vmap(one)(query, src, src_num)


def three_interpolate(features, idx, weight):
    """Weighted sum of 3 neighbors (interpolate_gpu.cu:107-149).

    features (B, N, C); idx (B, M, 3); weight (B, M, 3) -> (B, M, C).
    """
    gathered = group_points(features, idx)  # (B, M, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_nn_weights(dists):
    """Inverse-distance weights (PointnetFPModule, pointnet2_modules.py:143-146:
    w = (1/(d + 1e-8)) / sum)."""
    recip = 1.0 / (dists + 1e-8)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
