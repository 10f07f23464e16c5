"""EuRoC end-to-end (VERDICT r4 item 5): the full ingestion path —
sensor.yaml intrinsics, 4-coefficient RadTan, T_BS body-frame extrinsics,
nanosecond timestamp sync — driven by actual VO pipelines on a rendered
stereo sequence in real EuRoC format (the reference's committed euroc
fixture images are all-zero placeholders)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tadataka_tpu.dataset.euroc import EurocDataset
from tadataka_tpu.dataset.synthetic import export_euroc_scene
from tadataka_tpu.metrics import absolute_trajectory_error


@pytest.fixture(scope="module")
def euroc_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc_scene")
    body_poses = export_euroc_scene(root, n_frames=5,
                                    image_shape=(240, 320))
    return root, body_poses


def test_loader_roundtrip(euroc_scene):
    """Intrinsics, distortion, and T_BS survive the yaml round trip; the
    stereo pair keeps its baseline after the T_wb @ T_BS composition."""
    root, body_poses = euroc_scene
    ds = EurocDataset(root)
    assert len(ds) == 5
    f0, f1 = ds[0]
    assert f0.image.shape == (240, 320)
    # the rig's camera rotations agree (shared R_bc)
    np.testing.assert_allclose(np.asarray(f0.pose.R),
                               np.asarray(f1.pose.R), atol=1e-6)
    # baseline preserved through the body-frame composition
    b = np.asarray(f1.pose.t) - np.asarray(f0.pose.t)
    np.testing.assert_allclose(np.linalg.norm(b), 0.11, rtol=1e-5)
    # RadTan model present with the exported coefficients
    c = np.asarray(f0.camera_model.distortion_model.dist_coeffs)
    np.testing.assert_allclose(c[:2], [-0.08, 0.01], atol=1e-7)


def test_stereo_depth_from_euroc(euroc_scene):
    """estimate_depth_from_stereo through the loaded rig recovers the
    rendered scene's metric depth."""
    from tadataka_tpu.vo.stereo import estimate_depth_from_stereo

    root, _ = euroc_scene
    ds = EurocDataset(root)
    f0, f1 = ds[0]
    gt = np.load(root / "debug_gt" / "0.npz")
    baseline = float(np.linalg.norm(
        np.asarray(f1.pose.t) - np.asarray(f0.pose.t)))
    g0 = jnp.asarray(f0.image, jnp.float32) / 255.0
    g1 = jnp.asarray(f1.image, jnp.float32) / 255.0
    depth, valid = estimate_depth_from_stereo(
        f0.camera_model.camera_parameters, g0, g1,
        baseline=baseline, max_disparity=64)
    depth = np.asarray(depth)
    valid = np.asarray(valid)
    # the raw (unrectified-image) pair carries real RadTan distortion:
    # scanline block matching only validates where the distortion-induced
    # vertical offset stays sub-pixel (~center of the image)
    assert valid.mean() > 0.15, valid.mean()
    err = np.abs(depth - gt["depth"])[valid]
    # scene depth ~2.3-2.9 m; block matching with mild RadTan distortion
    assert np.median(err) < 0.15, np.median(err)


def test_feature_vo_on_euroc(euroc_scene):
    """Monocular feature VO over cam0: keypoints go through the yaml
    RadTan undistortion (CameraModel.normalize); sim(3)-aligned ATE
    bounded."""
    from tadataka_tpu.vo.feature_based import FeatureBasedVO

    root, _ = euroc_scene
    ds = EurocDataset(root)
    vo = FeatureBasedVO(fast_threshold=10.0 / 255.0, min_matches=24,
                        max_keypoints=512)
    est, gt = [], []
    for i in range(len(ds)):
        f0, _ = ds[i]
        frame = f0._replace(
            image=np.asarray(f0.image, np.float32) / 255.0)
        pose = vo.estimate(frame)
        if pose is not None:
            est.append(np.asarray(pose.t))
            gt.append(np.asarray(f0.pose.t))
    assert len(est) >= 4, len(est)
    est = np.stack(est)
    gt = np.stack(gt)
    extent = np.linalg.norm(gt[-1] - gt[0])
    ate = float(absolute_trajectory_error(jnp.asarray(est),
                                          jnp.asarray(gt), align=True))
    assert ate < 0.08 * extent, (ate, extent)
