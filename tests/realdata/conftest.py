"""Shared fixtures over the reference repo's committed dataset slices.

The reference validates its algorithms on 5-frame slices of real datasets
committed under /root/reference/tests/dataset (registry
/root/reference/tests/dataset/path.py:1-7).  These tests are the
reference-matching anchor: they run every pipeline on the same real images.

NewTsukuba is the only fixture with full-size real images (480x640 stereo
pairs + ground-truth camera track; the depth-map XMLs are stripped from the
mirror, so metric depth ground truth is recovered by rectified-stereo block
matching, baseline 10 — an independent method whose agreement with the
epipolar estimator is itself evidence of correctness).
"""

from pathlib import Path

import numpy as np
import pytest

REF_DATASET_ROOT = Path("/root/reference/tests/dataset")

requires_fixtures = pytest.mark.skipif(
    not REF_DATASET_ROOT.exists(),
    reason="reference dataset fixtures not available")


@pytest.fixture(scope="session")
def tsukuba_dataset(tmp_path_factory):
    from tadataka_tpu.dataset.new_tsukuba import NewTsukubaDataset
    root = REF_DATASET_ROOT / "new_tsukuba"
    if not root.exists():
        pytest.skip("new_tsukuba fixture missing")
    return NewTsukubaDataset(root)


@pytest.fixture(scope="session")
def tsukuba_gray(tsukuba_dataset):
    """Grayscale left/right image stacks for the 5 fixture frames."""
    import jax.numpy as jnp
    from tadataka_tpu.dataset.image_io import rgb2gray
    lefts, rights = [], []
    for i in range(len(tsukuba_dataset)):
        L, R = tsukuba_dataset[i]
        lefts.append(jnp.asarray(rgb2gray(L.image)))
        rights.append(jnp.asarray(rgb2gray(R.image)))
    return lefts, rights


@pytest.fixture(scope="session")
def tsukuba_stereo_depth(tsukuba_dataset, tsukuba_gray):
    """(depth, valid) pseudo ground truth for frame 0's left image."""
    from tadataka_tpu.vo.stereo import estimate_depth_from_stereo
    lefts, rights = tsukuba_gray
    depth, valid = estimate_depth_from_stereo(
        tsukuba_dataset.camera_model.camera_parameters,
        lefts[0], rights[0], baseline=tsukuba_dataset.BASELINE,
        max_disparity=128, radius=3)
    return np.asarray(depth), np.asarray(valid)
