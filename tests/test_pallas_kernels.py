"""Pallas TT-evaluation kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import TTTensor
from xerus_tpu.ops.pallas_tt_eval import tt_eval_at_points_pallas, pad_cores
from xerus_tpu.algorithms.measurements import _evaluate_tt_at_points


def test_pad_cores_roundtrip():
    tt = TTTensor.random([3, 4, 3], 2)
    stacked, r = pad_cores([np.asarray(c.to_ndarray()) for c in tt.components])
    assert stacked.shape == (3, r, 4, r)
    # first core occupies the top-left corner
    c0 = np.asarray(tt.components[0].to_ndarray())
    assert np.allclose(np.asarray(stacked)[0, :1, :3, :2], c0)


def test_pallas_matches_xla_path():
    tt = TTTensor.random([4] * 6, 5)
    rng = xe.misc.randomEngine
    P = rng.integers(0, 4, size=(100, 6))
    ref = _evaluate_tt_at_points(tt, P)
    got = np.asarray(tt_eval_at_points_pallas(
        [c.to_jax() for c in tt.components], P, block_m=32))
    assert np.allclose(got, ref, atol=1e-12)


def test_pallas_nonuniform_dims():
    tt = TTTensor.random([2, 5, 3, 4], [2, 4, 3])
    rng = xe.misc.randomEngine
    P = np.stack([rng.integers(0, d, size=17) for d in [2, 5, 3, 4]], axis=1)
    ref = _evaluate_tt_at_points(tt, P)
    got = np.asarray(tt_eval_at_points_pallas(
        [c.to_jax() for c in tt.components], P, block_m=8))
    assert np.allclose(got, ref, atol=1e-12)


def test_pallas_block_padding():
    """M not a multiple of block_m: tail handled by padding."""
    tt = TTTensor.random([3] * 4, 2)
    rng = xe.misc.randomEngine
    P = rng.integers(0, 3, size=(13, 4))
    ref = _evaluate_tt_at_points(tt, P)
    got = np.asarray(tt_eval_at_points_pallas(
        [c.to_jax() for c in tt.components], P, block_m=8))
    assert got.shape == (13,)
    assert np.allclose(got, ref, atol=1e-12)
