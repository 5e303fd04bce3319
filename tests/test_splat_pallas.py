"""Pallas splat engine vs oracle — interpret mode on CPU.

The production engine is validated bit-exactly against the oracle on real TPU
hardware (see .claude/skills/verify/SKILL.md); this CPU test keeps the
pipeline (pair expansion, tile sort, chunk alignment, kernel semantics)
covered in CI via the Pallas interpreter on a small population."""
import numpy as np
import pytest

from nbodyhpc_tpu.ops import splat_pallas
from nbodyhpc_tpu.ops.splat import splat_volume_oracle


@pytest.mark.slow
def test_pallas_matches_oracle_interpret():
    rng = np.random.Generator(np.random.Philox(11))
    n = 40
    grid = (20, 12, 20)
    ppu = 8.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = np.concatenate(
        [
            (rng.random(n // 2) * 0.4 / ppu).astype(np.float32),  # sub-pixel
            ((0.6 + rng.random(n - n // 2) * 2.0) / ppu).astype(np.float32),
        ]
    )
    got = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_multi_batch_accumulate_matches_single():
    """The accumulate (prefetch/flush) path across particle batches must
    reproduce the single-batch result."""
    rng = np.random.Generator(np.random.Philox(13))
    n = 600
    grid = (16, 16, 16)
    ppu = 16.0
    pos = rng.random((n, 3)).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = ((0.6 + rng.random(n) * 2.0) / ppu).astype(np.float32)
    one = np.asarray(splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True))
    multi = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, batch=128, interpret=True)
    )
    np.testing.assert_allclose(one, multi, rtol=1e-6, atol=1e-7)
