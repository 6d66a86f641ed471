"""Pallas correlative scorer: parity with the XLA gather formulation
(interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.ops.pallas_kernels import correlative_score_windows


def reference_scores(prob, ix, iy, mask, num_linear):
    a, n = ix.shape
    d = 2 * num_linear + 1
    h, w = prob.shape
    out = np.zeros((a, d, d), np.float64)
    for ai in range(a):
        for dy in range(-num_linear, num_linear + 1):
            for dx in range(-num_linear, num_linear + 1):
                s = 0.0
                for pi in range(n):
                    if not mask[pi]:
                        continue
                    y, x = iy[ai, pi] + dy, ix[ai, pi] + dx
                    s += (
                        prob[y, x]
                        if 0 <= y < h and 0 <= x < w
                        else pv.MIN_PROBABILITY
                    )
                out[ai, dy + num_linear, dx + num_linear] = s
    return out


class TestPallasCorrelativeScore:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        h, w = 64, 256  # >= the kernel's aligned super-tile read
        a, n = 4, 32
        prob = rng.uniform(0.1, 0.9, (h, w)).astype(np.float32)
        ix = rng.integers(-3, w + 3, (a, n)).astype(np.int32)
        iy = rng.integers(-3, h + 3, (a, n)).astype(np.int32)
        mask = rng.uniform(size=n) > 0.2
        num_linear = 2
        got = np.asarray(
            correlative_score_windows(
                jnp.asarray(prob),
                jnp.asarray(ix),
                jnp.asarray(iy),
                jnp.asarray(mask),
                num_linear,
                interpret=True,
            )
        )
        want = reference_scores(prob, ix, iy, mask, num_linear)
        np.testing.assert_allclose(got, want, rtol=1e-5)
