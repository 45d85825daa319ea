"""In-loop deblocking on device, band-scan formulation.

The reference's edge order (deblock.cpp:201-254) is: band 0's vertical edges
left-to-right; then per 8-row band, horizontal edges then vertical edges
interleaved. Within a band every horizontal edge is pairwise disjoint, every
vertical edge is pairwise disjoint, and v(i) only overlaps h(i') for i' <= i
— so the interleave is equivalent to [all horizontal] then [all vertical],
which is how this kernel vectorizes each band. Bands remain sequential
(band j+8's horizontal edges read band j's vertical-edge output).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import tables
from .ops import rounded_div_pos

_ALPHA = jnp.asarray(tables.DEBLOCK_ALPHA, dtype=jnp.int32)
_BETA = jnp.asarray(tables.DEBLOCK_BETA, dtype=jnp.int32)
STEP = 8


def _edge_maps(copy_blocks, q_blocks, cells_y, cells_x, mb_cells):
    """Per-8px-cell strength and avg-QP maps.

    copy_blocks/q_blocks: (hb, wb) per-MB arrays; mb_cells = MB cells per
    block edge (2 for luma at mb_size 16, 1 for chroma).
    Returns (vs, vqp) for vertical edges between cell columns and (hs, hqp)
    for horizontal edges between cell rows.
    """
    cy = jnp.arange(cells_y) // mb_cells
    cx = jnp.arange(cells_x) // mb_cells
    copy_c = copy_blocks[cy][:, cx]
    q_c = q_blocks[cy][:, cx].astype(jnp.int32)

    def strength_qp(copy_a, copy_b, qa, qb):
        strength = jnp.where(copy_a & copy_b, 0,
                             jnp.where(copy_a ^ copy_b, 1, 2))
        qp = jnp.where(~copy_a & ~copy_b, (qa + qb) >> 1,
                       jnp.where(~copy_a, qa, jnp.where(~copy_b, qb, 0)))
        return strength, qp

    vs, vqp = strength_qp(copy_c[:, :-1], copy_c[:, 1:],
                          q_c[:, :-1], q_c[:, 1:])
    hs, hqp = strength_qp(copy_c[:-1, :], copy_c[1:, :],
                          q_c[:-1, :], q_c[1:, :])
    return vs, vqp, hs, hqp


def _filter(p3, p2, p1, p0, q0, q1, q2, q3, strength, qp, is_luma):
    """deblock_filter_values (deblock.cpp:81-129), element-wise over arrays."""
    alpha = _ALPHA[qp]
    beta = _BETA[qp]
    keep = (jnp.abs(p0 - q0) >= alpha) | (jnp.abs(p1 - p0) >= beta) | \
           (jnp.abs(q1 - q0) >= beta) | (strength == 0)

    s2_p0 = rounded_div_pos(p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1, 8)
    s2_p1 = rounded_div_pos(p2 + p1 + p0 + q0, 4)
    s2_q0 = rounded_div_pos(p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2, 8)
    s2_q1 = rounded_div_pos(p0 + q0 + q1 + q2, 4)
    s1_p0 = rounded_div_pos((q0 + p0) * 4 + p1 - q1, 8)
    s1_q0 = rounded_div_pos((q0 + p0) * 4 + q1 - p1, 8)

    is2 = strength == 2
    new_p0 = jnp.where(is2, s2_p0, s1_p0)
    new_q0 = jnp.where(is2, s2_q0, s1_q0)
    if is_luma:
        s2_p2 = rounded_div_pos(2 * p3 + 3 * p2 + p1 + p0 + q0, 8)
        s2_q2 = rounded_div_pos(2 * q3 + 3 * q2 + q1 + q0 + p0, 8)
        s1_p1 = rounded_div_pos(p2 * 4 + p0 * 2 + q0 * 2, 8)
        s1_q1 = rounded_div_pos(q2 * 4 + q0 * 2 + p0 * 2, 8)
        new_p1 = jnp.where(is2, s2_p1, s1_p1)
        new_q1 = jnp.where(is2, s2_q1, s1_q1)
        new_p2 = jnp.where(is2, s2_p2, p2)
        new_q2 = jnp.where(is2, s2_q2, q2)
    else:
        new_p1 = jnp.where(is2, s2_p1, p1)
        new_q1 = jnp.where(is2, s2_q1, q1)
        new_p2, new_q2 = p2, q2

    def pick(new, old):
        return jnp.where(keep, old, new)

    return (pick(new_p2, p2), pick(new_p1, p1), pick(new_p0, p0),
            pick(new_q0, q0), pick(new_q1, q1), pick(new_q2, q2))


def _vertical_pass(rows8, vs_row, vqp_row, is_luma):
    """All vertical edges of one band. rows8: (8, W)."""
    width = rows8.shape[1]
    nb = width // STEP - 1
    win = rows8[:, 4:width - 4].reshape(8, nb, STEP)
    p3, p2, p1, p0 = win[:, :, 0], win[:, :, 1], win[:, :, 2], win[:, :, 3]
    q0, q1, q2, q3 = win[:, :, 4], win[:, :, 5], win[:, :, 6], win[:, :, 7]
    s = vs_row[None, :]
    qp = vqp_row[None, :]
    np2, np1, np0, nq0, nq1, nq2 = _filter(p3, p2, p1, p0, q0, q1, q2, q3,
                                           s, qp, is_luma)
    new_win = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    return rows8.at[:, 4:width - 4].set(new_win.reshape(8, width - 8))


def _horizontal_pass(rows8, hs_row, hqp_row, is_luma):
    """All horizontal edges of one band boundary. rows8: (8, W) = rows
    y-4..y+3; the edge sits between rows 3 and 4 of this window."""
    qp = jnp.repeat(hqp_row, STEP)
    p0, p1, p2, p3 = rows8[3], rows8[2], rows8[1], rows8[0]
    q0, q1, q2, q3 = rows8[4], rows8[5], rows8[6], rows8[7]
    np2, np1, np0, nq0, nq1, nq2 = _filter(p3, p2, p1, p0, q0, q1, q2, q3,
                                           jnp.repeat(hs_row, STEP), qp,
                                           is_luma)
    return jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=0)


def deblock_plane(plane, copy_blocks, q_blocks, mb_size, is_luma):
    """Runs the in-loop filter over one plane. plane: (H, W) int32."""
    height, width = plane.shape
    cells_y, cells_x = height // STEP, width // STEP
    mb_cells = mb_size // STEP
    vs, vqp, hs, hqp = _edge_maps(copy_blocks, q_blocks, cells_y, cells_x,
                                  mb_cells)

    # band 0: vertical edges only
    plane = plane.at[0:STEP].set(
        _vertical_pass(plane[0:STEP], vs[0], vqp[0], is_luma))

    def body(b, plane):
        y = b * STEP
        # horizontal edges between band b-1 and b: rows y-4 .. y+3
        rows = jax.lax.dynamic_slice(plane, (y - 4, 0), (8, width))
        rows = _horizontal_pass(rows, hs[b - 1], hqp[b - 1], is_luma)
        plane = jax.lax.dynamic_update_slice(plane, rows, (y - 4, 0))
        # vertical edges of band b: rows y .. y+7
        rows = jax.lax.dynamic_slice(plane, (y, 0), (8, width))
        rows = _vertical_pass(rows, vs[b], vqp[b], is_luma)
        return jax.lax.dynamic_update_slice(plane, rows, (y, 0))

    return jax.lax.fori_loop(1, cells_y, body, plane)


def deblock_frame(y, u, v, copy_blocks, q_blocks):
    """Y at 16-px block granularity, chroma at 8 (deblock.cpp:256-275)."""
    y = deblock_plane(y, copy_blocks, q_blocks, 16, True)
    u = deblock_plane(u, copy_blocks, q_blocks, 8, False)
    v = deblock_plane(v, copy_blocks, q_blocks, 8, False)
    return y, u, v
