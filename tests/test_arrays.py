"""Tests for array/confusion utilities."""
import numpy as np
import pytest

from hpcs_tpu.utils.arrays import (
    cartesian_product,
    condense_confusion_matrix,
    get_confusion_matrix,
    mat_renorm_rows,
    set_distance,
    subset_backprojection,
)


def test_cartesian_product():
    cp = cartesian_product([np.array([0, 1]), np.array([5, 6, 7])])
    assert cp.shape == (6, 2)
    assert [0, 5] in cp.tolist() and [1, 7] in cp.tolist()


def test_set_distance():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[3.0, 4.0], [1.0, 1.0]])
    d, amin = set_distance(a, b, return_amin=True)
    assert d == pytest.approx(1.0)
    assert amin == (1, 1)


def test_subset_backprojection():
    assert subset_backprojection([True, False, True]).tolist() == [0, 2]


def test_mat_renorm_rows_zero_row_safe():
    M = np.array([[2.0, 2.0], [0.0, 0.0]])
    R = mat_renorm_rows(M)
    np.testing.assert_allclose(R[0], [0.5, 0.5])
    np.testing.assert_allclose(R[1], [0.0, 0.0])


def test_condense_confusion_matrix():
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 1, 1, 1, 2, 0])
    conf, _ = get_confusion_matrix(y_true, y_pred, [0, 1, 2])
    condensed = condense_confusion_matrix(conf, [0, 1, 2], [[0, 1], [2]])
    assert condensed.shape == (2, 2)
    assert condensed.sum() == conf.sum()
    # group {0,1} self-mass: rows 0,1 x cols 0,1 = 1+1+0+2
    assert condensed[0, 0] == 4
