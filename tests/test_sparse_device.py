"""Device-side sparse kernels (the sparseTimesFullContraction equivalent)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor
from xerus_tpu.ops import sparse_kernels


@pytest.fixture
def force_device_path(monkeypatch):
    monkeypatch.setattr(sparse_kernels, "DEVICE_SPARSE_THRESHOLD", 1)


def test_sparse_times_dense_device(force_device_path):
    s = Tensor.random([40, 30], n=50)
    d = Tensor.random([30, 20])
    out = xe.contract(s, d, 1)
    assert out.is_dense()
    assert np.allclose(out.to_ndarray(), s.to_ndarray() @ d.to_ndarray(),
                       atol=1e-12)


def test_dense_times_sparse_device(force_device_path):
    s = Tensor.random([40, 30], n=50)
    d = Tensor.random([20, 40])
    out = xe.contract(d, s, 1)
    assert np.allclose(out.to_ndarray(), d.to_ndarray() @ s.to_ndarray(),
                       atol=1e-12)


def test_multimode_sparse_device(force_device_path):
    s = Tensor.random([6, 5, 4], n=20)
    d = Tensor.random([5, 4, 7])
    out = xe.contract(s, d, 2)
    ref = np.einsum('abc,bcd->ad', s.to_ndarray(), d.to_ndarray())
    assert np.allclose(out.to_ndarray(), ref, atol=1e-12)


def test_factor_propagates_through_device_path(force_device_path):
    s = Tensor.random([10, 10], n=10)
    s *= 2.0
    d = Tensor.random([10, 4])
    d *= -1.5
    out = xe.contract(s, d, 1)
    assert np.allclose(out.to_ndarray(), s.to_ndarray() @ d.to_ndarray(),
                       atol=1e-12)


def test_transposed_operands_fall_back_correctly(force_device_path):
    # lhs_trans with sparse lhs falls back to the scipy path — still correct
    s = Tensor.random([30, 40], n=50)
    d = Tensor.random([30, 20])
    out = xe.contract(s, d, 1, lhs_trans=True)
    assert np.allclose(out.to_ndarray(), s.to_ndarray().T @ d.to_ndarray(),
                       atol=1e-12)
