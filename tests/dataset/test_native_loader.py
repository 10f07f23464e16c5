"""Native PNG decoder / prefetcher vs PIL ground truth."""

import numpy as np
import pytest

from tadataka_tpu.dataset.image_io import imsave, imread
from tadataka_tpu.dataset import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.native_available(),
    reason="native library not buildable in this environment")


@pytest.fixture
def png_dir(tmp_path, rng):
    paths = []
    arrays = []
    specs = [((24, 32), np.uint8),          # gray8
             ((16, 20, 3), np.uint8),       # rgb8
             ((10, 14, 4), np.uint8),       # rgba8
             ((12, 18), np.uint16)]         # gray16 (depth maps)
    for i, (shape, dtype) in enumerate(specs):
        if dtype == np.uint8:
            arr = rng.integers(0, 255, shape, dtype=np.uint8)
        else:
            arr = rng.integers(0, 60000, shape).astype(np.uint16)
        path = tmp_path / f"img_{i}.png"
        imsave(path, arr)
        paths.append(path)
        arrays.append(arr)
    return paths, arrays


def test_imread_native_matches_pil(png_dir):
    paths, arrays = png_dir
    for path, expected in zip(paths, arrays):
        got = native_loader.imread_native(path)
        pil = imread(path)
        np.testing.assert_array_equal(got, np.asarray(pil))
        np.testing.assert_array_equal(got.squeeze(), expected.squeeze())


def test_prefetching_loader_in_order(png_dir):
    paths, arrays = png_dir
    loader = native_loader.PrefetchingLoader(paths, n_threads=2, capacity=2)
    assert len(loader) == len(paths)
    for i, frame in enumerate(loader):
        np.testing.assert_array_equal(frame.squeeze(), arrays[i].squeeze())
    loader.close()


def test_prefetching_loader_rejects_out_of_order(png_dir):
    paths, _ = png_dir
    loader = native_loader.PrefetchingLoader(paths)
    with pytest.raises(IndexError):
        loader[2]
    loader.close()


def test_prefetching_loader_many_frames(tmp_path, rng):
    paths = []
    for i in range(32):
        arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
        p = tmp_path / f"f{i:03d}.png"
        imsave(p, arr)
        paths.append(p)
    loader = native_loader.PrefetchingLoader(paths, n_threads=4, capacity=4)
    frames = list(loader)
    assert len(frames) == 32
    loader.close()
