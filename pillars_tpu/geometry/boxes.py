"""Box geometry in JAX — every function is pure, static-shape and jit-safe.

Semantics match the reference implementations exactly (same corner ordering,
same encode/decode formulas) so that decode-chain parity with the reference
checkpoint is achievable. Citations point into /root/reference.

Box convention (lidar): [x, y, z, w, l, h, r] with z at the box BOTTOM and
r a clockwise-positive yaw around +z (reference load_data.py:125-200).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry math is tiny compared to the conv/matmul FLOPs of the model, and
# decode-chain parity with the reference needs full f32: force the MXU into
# its highest-precision mode for these einsums (on TPU the default would be
# bf16 passes).
_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# angles
# ---------------------------------------------------------------------------

def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    """Wrap angles into [-offset*period, (1-offset)*period).

    reference load_data.py:805-806."""
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# corners
# ---------------------------------------------------------------------------

# Unit-square corner layout, clockwise starting at the minimum point —
# matches corners_nd's reordering [0, 1, 3, 2] (reference load_data.py:1563-1597).
_CORNERS_NORM_2D = jnp.array(
    [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]], dtype=jnp.float32)

# 3D layout after reorder [0, 1, 3, 2, 4, 5, 7, 6] of the unravel_index grid:
# (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0).
_CORNERS_NORM_3D = jnp.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 1.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [1.0, 0.0, 1.0],
        [1.0, 1.0, 1.0],
        [1.0, 1.0, 0.0],
    ],
    dtype=jnp.float32,
)


def corners_nd(dims, origin=0.5):
    """[N, ndim] dims -> [N, 2**ndim, ndim] corners relative to the center.

    reference load_data.py:1563-1597 (corners_nd)."""
    ndim = dims.shape[-1]
    norm = _CORNERS_NORM_2D if ndim == 2 else _CORNERS_NORM_3D
    norm = norm - jnp.asarray(origin, dtype=dims.dtype)
    return dims[..., None, :] * norm[None]


def rotation_2d(points, angles):
    """Rotate [N, P, 2] point sets clockwise-positive by [N] angles.

    reference load_data.py:1547-1561 (rotation_2d); note the transposed
    einsum makes positive angles CLOCKWISE in the x-y plane."""
    rot_sin = jnp.sin(angles)
    rot_cos = jnp.cos(angles)
    # rot_mat_T[j, k]; result[a, i, k] = sum_j points[a, i, j] * rot_mat_T[j, k]
    row0 = jnp.stack([rot_cos, -rot_sin], axis=-1)  # [N, 2] (j=0)
    row1 = jnp.stack([rot_sin, rot_cos], axis=-1)   # [N, 2] (j=1)
    rot = jnp.stack([row0, row1], axis=-2)          # [N, 2(j), 2(k)]
    return jnp.einsum("aij,ajk->aik", points, rot, precision=_HIGHEST)


def rotation_3d_in_axis(points, angles, axis: int = 2):
    """Rotate [N, P, 3] point sets by [N] angles around ``axis``.

    reference load_data.py:1227-1246 (rotation_3d_in_axis)."""
    sin = jnp.sin(angles)
    cos = jnp.cos(angles)
    one = jnp.ones_like(cos)
    zero = jnp.zeros_like(cos)
    if axis == 1:
        rows = [[cos, zero, -sin], [zero, one, zero], [sin, zero, cos]]
    elif axis in (2, -1):
        rows = [[cos, -sin, zero], [sin, cos, zero], [zero, zero, one]]
    elif axis == 0:
        rows = [[zero, cos, -sin], [zero, sin, cos], [one, zero, zero]]
    else:
        raise ValueError("axis should be in range")
    # reference einsum 'aij,jka->aik' with rot_mat_T[j][k] stacked as above.
    rot_t = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)  # [N,3(j),3(k)]
    return jnp.einsum("aij,ajk->aik", points, rot_t, precision=_HIGHEST)


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """[N,2] centers + [N,2] dims (+[N] yaw) -> [N,4,2] BEV corners.

    reference load_data.py:1525-1545."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers[..., None, :]


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 0.5, 0.0),
                           axis: int = 2):
    """[N,3] centers + [N,3] dims (+[N] yaw) -> [N,8,3] corners.

    reference load_data.py:1200-1225. lidar origin (0.5, 0.5, 0)."""
    corners = corners_nd(dims, origin=jnp.array(origin, dtype=dims.dtype))
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers[..., None, :]


def corner_to_standup(boxes_corner):
    """[N, K, ndim] corners -> [N, 2*ndim] (mins..., maxs...).

    reference load_data.py:1331-1341 (corner_to_standup_nd_jit)."""
    mins = jnp.min(boxes_corner, axis=-2)
    maxs = jnp.max(boxes_corner, axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def center_to_minmax_2d(centers, dims):
    """Axis-aligned [xmin, ymin, xmax, ymax] from center/dims.

    reference load_data.py:549-556 (origin 0.5 fast path)."""
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def rbbox2d_to_near_bbox(rbboxes):
    """Rotated [N,5] (x, y, w, l, r) -> nearest axis-aligned [N,4] standup box.

    reference load_data.py:533-548."""
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = jnp.abs(limit_period(rots, 0.5, jnp.pi))
    cond = (rots_0_pi_div_2 > jnp.pi / 4)[..., None]
    bboxes_center = jnp.where(cond, rbboxes[..., [0, 1, 3, 2]], rbboxes[..., :4])
    return center_to_minmax_2d(bboxes_center[..., :2], bboxes_center[..., 2:4])


# ---------------------------------------------------------------------------
# box codec (SECOND / VoxelNet residual encoding)
# ---------------------------------------------------------------------------

def second_box_encode(boxes, anchors):
    """Encode gt boxes against anchors. Both [..., 7] = (x,y,z,w,l,h,r), z at
    the bottom. reference load_data.py:125-200 (second_box_encode)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes, 7, axis=-1)
    za = za + ha / 2
    zg = zg + hg / 2
    diagonal = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    lt = jnp.log(lg / la)
    wt = jnp.log(wg / wa)
    ht = jnp.log(hg / ha)
    rt = rg - ra
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def second_box_decode(box_encodings, anchors):
    """Inverse of :func:`second_box_encode`.

    reference libraries/eval_helper_functions.py:388-461."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, wt, lt, ht, rt = jnp.split(box_encodings, 7, axis=-1)
    za = za + ha / 2
    diagonal = jnp.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    lg = jnp.exp(lt) * la
    wg = jnp.exp(wt) * wa
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


def add_sin_difference(boxes1, boxes2):
    """sin(a-b) angle-difference trick for the localization loss.

    reference model/voxelnet.py:63-69."""
    rad_pred = jnp.sin(boxes1[..., -1:]) * jnp.cos(boxes2[..., -1:])
    rad_tg = jnp.cos(boxes1[..., -1:]) * jnp.sin(boxes2[..., -1:])
    b1 = jnp.concatenate([boxes1[..., :-1], rad_pred], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :-1], rad_tg], axis=-1)
    return b1, b2


# ---------------------------------------------------------------------------
# coordinate frames (camera <-> lidar), jit-safe matrix forms
# ---------------------------------------------------------------------------

def _homogeneous(points):
    shape = points.shape[:-1] + (1,)
    return jnp.concatenate([points, jnp.ones(shape, dtype=points.dtype)], axis=-1)


def lidar_to_camera(points, r_rect, velo2cam):
    """[..., 3] lidar points -> camera. reference load_data.py:1510-1516."""
    pts = _homogeneous(points)
    cam = pts @ (r_rect @ velo2cam).T
    return cam[..., :3]


def camera_to_lidar(points, r_rect, velo2cam):
    """[..., 3] camera points -> lidar. reference load_data.py:1489-1498."""
    pts = _homogeneous(points)
    lidar = pts @ jnp.linalg.inv((r_rect @ velo2cam).T)
    return lidar[..., :3]


def box_lidar_to_camera(boxes, r_rect, velo2cam):
    """[N,7] lidar (x,y,z,w,l,h,r) -> camera (x,y,z,l,h,w,r).

    reference load_data.py:1518-1523."""
    xyz = lidar_to_camera(boxes[..., :3], r_rect, velo2cam)
    w, l, h = boxes[..., 3:4], boxes[..., 4:5], boxes[..., 5:6]
    r = boxes[..., 6:7]
    return jnp.concatenate([xyz, l, h, w, r], axis=-1)


def box_camera_to_lidar(boxes, r_rect, velo2cam):
    """[N,7] camera (x,y,z,l,h,w,r) -> lidar (x,y,z,w,l,h,r).

    reference load_data.py:1501-1508."""
    xyz = camera_to_lidar(boxes[..., :3], r_rect, velo2cam)
    l, h, w = boxes[..., 3:4], boxes[..., 4:5], boxes[..., 5:6]
    r = boxes[..., 6:7]
    return jnp.concatenate([xyz, w, l, h, r], axis=-1)


# ---------------------------------------------------------------------------
# axis-aligned IoU (vectorized pairwise)
# ---------------------------------------------------------------------------

def iou_matrix(boxes, query_boxes, eps: float = 0.0):
    """Pairwise axis-aligned IoU of [N,4] x [K,4] minmax boxes -> [N,K].

    Vectorized equivalent of reference load_data.py:206-235 (iou_jit)."""
    n_area = (boxes[:, 2] - boxes[:, 0] + eps) * (boxes[:, 3] - boxes[:, 1] + eps)
    k_area = (query_boxes[:, 2] - query_boxes[:, 0] + eps) * (
        query_boxes[:, 3] - query_boxes[:, 1] + eps)
    iw = (jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0]) + eps)
    ih = (jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1]) + eps)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    union = n_area[:, None] + k_area[None, :] - inter
    return jnp.where(inter > 0, inter / union, 0.0)
