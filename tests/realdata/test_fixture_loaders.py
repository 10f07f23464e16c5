"""Loader parity against the reference's own dataset fixtures.

The reference's loader tests pin exact sync/pose semantics on committed
fixtures (/root/reference/tests/dataset/test_tum_rgbd.py,
test_euroc.py, test_new_tsukuba.py); these run OUR loaders on THOSE
fixtures and assert the same expectations.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tests.realdata.conftest import REF_DATASET_ROOT, requires_fixtures

pytestmark = requires_fixtures


def test_tum_rgbd_fixture():
    """Same expectations as the reference's test: 7 synced frames (one rgb
    frame drops because its depth timestamp has no pose match), fabricated
    GT poses at indices [0,6,10,15,20,25,30] of arange-valued tables."""
    from tadataka_tpu.dataset.tum_rgbd import TumRgbdDataset
    root = REF_DATASET_ROOT / "tum_rgbd"
    if not root.exists():
        pytest.skip("tum_rgbd fixture missing")

    angles_gt = np.repeat(np.arange(0.0, 0.7, 0.02), 3).reshape(35, 3)
    positions_gt = np.arange(0.0, 0.21, 0.002).reshape(35, 3)

    dataset = TumRgbdDataset(root, which_freiburg=1)
    assert len(dataset) == 7
    assert len(dataset[1:4:2]) == 2

    frame = dataset[0]
    assert frame.image.shape[0:2] == (30, 40)
    assert frame.depth_map.shape[0:2] == (30, 40)
    assert frame.image.shape[2] == 3

    indices = [0, 6, 10, 15, 20, 25, 30]
    for i, frame in enumerate(dataset):
        R = Rotation.from_matrix(np.asarray(frame.pose.R))
        np.testing.assert_array_almost_equal(
            R.as_euler('xyz'), angles_gt[indices[i]], decimal=5)
        np.testing.assert_array_almost_equal(
            np.asarray(frame.pose.t), positions_gt[indices[i]], decimal=5)


def test_euroc_fixture():
    """5 stereo pairs with GT poses (reference: tests/dataset/test_euroc.py)."""
    from tadataka_tpu.dataset.euroc import EurocDataset
    root = REF_DATASET_ROOT / "euroc" / "mav0"
    if not root.exists():
        pytest.skip("euroc fixture missing")

    dataset = EurocDataset(root)
    assert len(dataset) == 5
    L, R = dataset[0]
    assert L.image.ndim == 2           # cam0 is monochrome
    assert L.image.shape == R.image.shape
    # GT positions strictly advance frame to frame
    prev = None
    for i in range(5):
        L, _ = dataset[i]
        t = np.asarray(L.pose.t)
        if prev is not None:
            assert np.linalg.norm(t - prev) > 0.1
        prev = t
