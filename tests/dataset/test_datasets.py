"""Dataset loader tests against generated on-disk fixtures.

The reference commits 5-frame slices of the real datasets; here tiny
format-identical trees are generated into tmpdir, which tests the parsing /
sync / pose conventions without binary fixtures.
"""

import numpy as np
import pytest
from pathlib import Path
from scipy.spatial.transform import Rotation

from tadataka_tpu.dataset import (
    TumRgbdDataset, NewTsukubaDataset, EurocDataset, PlaneSceneDataset)
from tadataka_tpu.dataset.tum import (
    match_timestamps, synchronize, save_in_tum_format, load_tum_poses)


def test_match_timestamps():
    t0 = np.array([0.0, 1.0, 2.0, 3.0])
    t1 = np.array([0.1, 1.05, 2.2, 2.9, 10.0])
    m = match_timestamps(t0, t1)
    assert (m[:, 0] == [0, 1, 2, 3]).all()
    assert (m[:, 1] == [0, 1, 2, 3]).all()
    m = match_timestamps(t0, t1, max_difference=0.15)
    assert (m[:, 0] == [0, 1, 3]).all()


def test_synchronize():
    ref = np.array([0.0, 1.0, 2.0])
    t1 = np.array([0.05, 1.1, 2.05])
    t2 = np.array([1.95, 0.01, 1.02])
    m = synchronize(t1, t2, timestamps_ref=ref)
    assert m.shape[0] == 3
    for i1, i2, ir in m:
        assert abs(t1[i1] - ref[ir]) < 0.2
        assert abs(t2[i2] - ref[ir]) < 0.2


def test_tum_format_roundtrip(tmp_path):
    timestamps = np.array([1.0, 2.0])
    rotations = Rotation.from_rotvec([[0.1, 0, 0], [0, 0.2, 0]])
    positions = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    path = tmp_path / "traj.txt"
    save_in_tum_format(path, timestamps, rotations, positions)
    ts, rots, pos = load_tum_poses(path)
    np.testing.assert_allclose(ts, timestamps)
    np.testing.assert_allclose(pos, positions)
    np.testing.assert_allclose(rots.as_rotvec(), rotations.as_rotvec(),
                               atol=1e-6)


def _write_png(path, array):
    from tadataka_tpu.dataset.image_io import imsave
    imsave(path, array)


@pytest.fixture
def tum_tree(tmp_path):
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    n = 4
    rng = np.random.default_rng(0)
    with open(root / "rgb.txt", "w") as frgb, \
         open(root / "depth.txt", "w") as fdep, \
         open(root / "groundtruth.txt", "w") as fgt:
        frgb.write("# color images\n")
        fdep.write("# depth images\n")
        fgt.write("# ground truth\n")
        for i in range(n):
            t = 100.0 + i * 0.1
            rgb = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
            dep = rng.integers(1000, 30000, (12, 16)).astype(np.uint16)
            _write_png(root / "rgb" / f"{t:.4f}.png", rgb)
            _write_png(root / "depth" / f"{t + 0.01:.4f}.png", dep)
            frgb.write(f"{t:.4f} rgb/{t:.4f}.png\n")
            fdep.write(f"{t + 0.01:.4f} depth/{t + 0.01:.4f}.png\n")
            q = Rotation.from_rotvec([0, 0.01 * i, 0]).as_quat()
            fgt.write(f"{t + 0.005:.4f} {0.1*i} 0 0 "
                      f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    return root


def test_tum_rgbd_dataset(tum_tree):
    dataset = TumRgbdDataset(str(tum_tree), which_freiburg=1)
    assert len(dataset) == 4
    frame = dataset[0]
    assert frame.image.shape == (12, 16, 3)
    assert frame.depth_map.shape == (12, 16)
    # uint16 / 5000 / 1.035 stays in a sane metric range
    assert 0.1 < frame.depth_map.mean() < 7.0
    # slicing
    frames = dataset[1:3]
    assert len(frames) == 2
    np.testing.assert_allclose(dataset[1].pose.t[0], 0.1, atol=1e-6)


@pytest.fixture
def tsukuba_tree(tmp_path):
    root = tmp_path / "tsukuba"
    gt = root / "groundtruth"
    (gt / "depth_maps" / "left").mkdir(parents=True)
    (gt / "depth_maps" / "right").mkdir()
    ill = root / "illumination" / "daylight"
    (ill / "left").mkdir(parents=True)
    (ill / "right").mkdir()
    n = 3
    rng = np.random.default_rng(1)
    track = []
    for i in range(n):
        for side in ("left", "right"):
            depth = rng.uniform(50, 300, (10, 14))
            rows = "\n".join(" ".join(f"{v:.3f}" for v in row)
                             for row in depth)
            xml = (f"<opencv_storage><depth type_id=\"opencv-matrix\">"
                   f"<rows>10</rows><cols>14</cols><dt>f</dt>"
                   f"<data>{rows}</data></depth></opencv_storage>")
            with open(gt / "depth_maps" / side /
                      f"frame_{i:05d}.xml", "w") as f:
                f.write(xml)
            img = rng.integers(0, 255, (10, 14, 4), dtype=np.uint8)
            _write_png(ill / side / f"frame_{i:05d}.png", img)
        track.append(f"{i*1.0},0,0,0,{i*2.0},0")
    with open(gt / "camera_track.txt", "w") as f:
        f.write("\n".join(track))
    return root


def test_new_tsukuba_dataset(tsukuba_tree):
    dataset = NewTsukubaDataset(str(tsukuba_tree))
    assert len(dataset) == 3
    left, right = dataset[1]
    assert left.image.shape == (10, 14, 3)  # alpha discarded
    assert left.depth_map.shape == (10, 14)
    # stereo baseline: 10 units apart along the camera x-axis
    offset = np.asarray(right.pose.t) - np.asarray(left.pose.t)
    assert np.isclose(np.linalg.norm(offset), 10.0, atol=1e-4)


@pytest.fixture
def euroc_tree(tmp_path):
    root = tmp_path / "euroc"
    n = 3
    rng = np.random.default_rng(2)
    for ci in range(2):
        cam = root / f"cam{ci}"
        (cam / "data").mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(n):
            ts = 1000000 + i * 50000
            name = f"{ts}.png"
            img = rng.integers(0, 255, (8, 10), dtype=np.uint8)
            _write_png(cam / "data" / name, img)
            lines.append(f"{ts},{name}")
        with open(cam / "data.csv", "w") as f:
            f.write("\n".join(lines))
        T = np.eye(4)
        T[0, 3] = 0.1 * ci
        yaml_text = (
            "intrinsics: [458.0, 457.0, 367.0, 248.0]\n"
            "distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]\n"
            "T_BS:\n  data: [" +
            ", ".join(str(v) for v in T.ravel()) + "]\n")
        with open(cam / "sensor.yaml", "w") as f:
            f.write(yaml_text)
    gtdir = root / "state_groundtruth_estimate0"
    gtdir.mkdir()
    lines = ["#timestamp,px,py,pz,qw,qx,qy,qz"]
    for i in range(n):
        ts = 1000000 + i * 50000 + 100
        lines.append(f"{ts},{0.2*i},0,0,1,0,0,0")
    with open(gtdir / "data.csv", "w") as f:
        f.write("\n".join(lines))
    return root


def test_euroc_dataset(euroc_tree):
    dataset = EurocDataset(str(euroc_tree))
    assert len(dataset) == 3
    f0, f1 = dataset[0]
    assert f0.image.shape == (8, 10)
    # cam1 is offset by T_BS x = 0.1
    offset = np.asarray(f1.pose.t) - np.asarray(f0.pose.t)
    np.testing.assert_allclose(offset, [0.1, 0, 0], atol=1e-6)


def test_plane_scene_consistency():
    """Rendered views must be photometrically consistent with GT warp."""
    import jax.numpy as jnp
    from tadataka_tpu.core.warp import Warp2D
    from tadataka_tpu.core.coordinates import image_coordinates
    from tadataka_tpu.core.interpolation import interpolate_checked

    dataset = PlaneSceneDataset(n_frames=2, image_shape=(40, 50))
    f0, f1 = dataset[0], dataset[1]
    warp = Warp2D(f0.camera_model, f1.camera_model, f0.pose, f1.pose)
    us0 = image_coordinates((40, 50))
    us1, _ = warp(us0, f0.depth_map.ravel())
    i1, mask = interpolate_checked(f1.image, us1)
    i0 = f0.image.ravel()
    err = np.abs(np.asarray(i1 - i0))[np.asarray(mask)]
    # bilinear sampling error only
    assert np.mean(err) < 0.02


def test_collaborative_dataset(tmp_path, rng):
    from tadataka_tpu.dataset.collaborative import CollaborativeDataset
    root = tmp_path / "collab"
    root.mkdir()
    for ts in (100, 200, 300):
        rgb = rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
        dep = rng.integers(500, 5000, (8, 10)).astype(np.uint16)
        _write_png(root / f"frame-{ts}.color.png", rgb)
        _write_png(root / f"frame-{ts}.depth.png", dep)
    # an unpaired file must be ignored
    _write_png(root / "frame-400.color.png",
               rng.integers(0, 255, (8, 10, 3), dtype=np.uint8))
    ds = CollaborativeDataset(str(root), depth_factor=1000.0)
    assert len(ds) == 3
    frame = ds[1]
    assert frame.image.shape == (8, 10, 3)
    assert frame.depth_map.shape == (8, 10)
    assert 0.5 <= frame.depth_map.mean() <= 5.0
