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
    num_points = ix_ref.shape[-1]
    h, w = prob_ref.shape

    acc_ref[:] = jnp.zeros((TILE_R, TILE_C), jnp.float32)

    row_off = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    col_off = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)

    def body(n, _):
        # Window top-left corner for this point (D x D window starting at
        # (iy - L, ix - L); the caller pre-subtracts L). The per-angle
        # index rows live in SMEM (scalar loads).
        py = iy_ref[0, 0, n]
        px = ix_ref[0, 0, n]
        valid = mask_ref[0, 0, n] != 0
        # Mosaic requires statically tile-aligned dynamic-slice starts:
        # read a sublane/lane-aligned [2*TILE_R, 2*TILE_C] super-tile that
        # provably contains the wanted window, then roll it into place.
        # Clamp FIRST, align LAST: the final (x // T) * T form is what
        # Mosaic's divisibility analysis proves tile-aligned.
        y0 = (jnp.clip(py, 0, h - 2 * TILE_R) // TILE_R) * TILE_R
        x0 = (jnp.clip(px, 0, w - 2 * TILE_C) // TILE_C) * TILE_C
        patch = prob_ref[pl.ds(y0, 2 * TILE_R), pl.ds(x0, 2 * TILE_C)]
        # Cell actually wanted at accumulator position (r, c) is
        # (py + r, px + c); it sits in the patch at (py + r - y0, px + c - x0).
        want_y = py + row_off
        want_x = px + col_off
        in_grid = (want_y >= 0) & (want_y < h) & (want_x >= 0) & (want_x < w)
        rel_y = py - y0 + row_off
        rel_x = px - x0 + col_off
        in_patch = (
            (rel_y >= 0)
            & (rel_y < 2 * TILE_R)
            & (rel_x >= 0)
            & (rel_x < 2 * TILE_C)
        )
        # Gather via roll: after rolling by the in-tile offset, position
        # (r, c) reads patch[r + (py - y0), c + (px - x0)].
        shifted = pltpu.roll(patch, -(py - y0), 0)
        shifted = pltpu.roll(shifted, -(px - x0), 1)
        vals = jnp.where(
            in_grid & in_patch, shifted[:TILE_R, :TILE_C], pv.MIN_PROBABILITY
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
    assert h >= 2 * TILE_R and w >= 2 * TILE_C, (
        "grid smaller than the super-tile read"
    )
    # Pre-shift to window top-left corners. Index rows ride in SMEM as
    # [A, 1, N] (Mosaic requires the last two block dims to be 8/128
    # multiples or full — a (1, 1, N) block satisfies that; scalar loads
    # come from SMEM anyway).
    ix0 = (ix - num_linear)[:, None, :]
    iy0 = (iy - num_linear)[:, None, :]
    mask_b = jnp.broadcast_to(
        point_mask[None, None, :].astype(jnp.int32), (a, 1, n)
    )

    out = pl.pallas_call(
        _score_kernel,
        grid=(a,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
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
