"""Pallas TPU kernels for the correlative-matching hot path.

The XLA formulation of candidate scoring (ops/scan_matching/correlative_2d)
materializes an [A, D, D, N] gather. This kernel keeps the probability grid
resident in VMEM and accumulates each point's [D, D] window patch directly
into the per-angle score tile — one pass over the points, no [A*D*D*N]
intermediate, HBM traffic = one grid read.

Layout: grid over angles; per program: the angle's discretized scan
(ix, iy), the full probability grid in VMEM, and a [TILE_R, TILE_C] f32
accumulator holding the D x D score window in its top-left corner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartographer_tpu.mapping import probability_values as pv

TILE_R = 8  # sublane-aligned accumulator rows
TILE_C = 128  # lane-aligned accumulator cols


def _score_kernel(ix_ref, iy_ref, mask_ref, prob_ref, out_ref, acc_ref):
    """One angle: accumulate sum over points of the window patch."""
    num_points = ix_ref.shape[1]
    h, w = prob_ref.shape

    acc_ref[:] = jnp.zeros((TILE_R, TILE_C), jnp.float32)

    row_off = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    col_off = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)

    def body(n, _):
        # Window top-left corner for this point (D x D window starting at
        # (iy - L, ix - L); the caller pre-subtracts L).
        py = iy_ref[0, n]
        px = ix_ref[0, n]
        valid = mask_ref[0, n]
        # Clamp the dynamic slice start so the [TILE_R, TILE_C] read stays
        # in range; track the shift so offsets still line up.
        y0 = jnp.clip(py, 0, h - TILE_R)
        x0 = jnp.clip(px, 0, w - TILE_C)
        patch = prob_ref[pl.ds(y0, TILE_R), pl.ds(x0, TILE_C)]
        # Cell actually wanted at accumulator position (r, c) is
        # (py + r, px + c); it sits in the patch at (py + r - y0, px + c - x0).
        want_y = py + row_off
        want_x = px + col_off
        in_grid = (want_y >= 0) & (want_y < h) & (want_x >= 0) & (want_x < w)
        rel_y = want_y - y0
        rel_x = want_x - x0
        in_patch = (
            (rel_y >= 0) & (rel_y < TILE_R) & (rel_x >= 0) & (rel_x < TILE_C)
        )
        # Shift the patch so that wanted cells align: patch was read at
        # (y0, x0); roll by the clamp shift.
        shifted = patch
        dy = py - y0  # in [0, TILE_R) when unclamped; negative when py < 0
        dx = px - x0
        # Gather via roll: roll the patch so (r, c) reads patch[r+dy, c+dx].
        shifted = pltpu.roll(shifted, -dy, 0)
        shifted = pltpu.roll(shifted, -dx, 1)
        vals = jnp.where(
            in_grid & in_patch, shifted, pv.MIN_PROBABILITY
        )
        acc_ref[:] = acc_ref[:] + jnp.where(valid, vals, 0.0)
        return 0

    jax.lax.fori_loop(0, num_points, body, 0)
    out_ref[0, :, :] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("num_linear", "interpret"))
def correlative_score_windows(
    prob: jax.Array,  # f32 [H, W]
    ix: jax.Array,  # i32 [A, N] discretized scan x per angle
    iy: jax.Array,  # i32 [A, N]
    point_mask: jax.Array,  # bool [N]
    num_linear: int,
    interpret: bool = False,
):
    """Returns summed window scores [A, D, D] with D = 2*num_linear+1
    (divide by the point count for the mean-probability score)."""
    a, n = ix.shape
    d = 2 * num_linear + 1
    assert d <= TILE_R and d <= TILE_C, "window exceeds accumulator tile"
    h, w = prob.shape
    assert h >= TILE_R and w >= TILE_C, "grid smaller than the read tile"
    # Pre-shift to window top-left corners.
    ix0 = ix - num_linear
    iy0 = iy - num_linear
    mask_b = jnp.broadcast_to(point_mask[None, :], (a, n))

    out = pl.pallas_call(
        _score_kernel,
        grid=(a,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full grid
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_R, TILE_C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((a, TILE_R, TILE_C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_R, TILE_C), jnp.float32)],
        interpret=interpret,
    )(ix0, iy0, mask_b, prob)
    return out[:, :d, :d]
