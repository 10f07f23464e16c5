"""TUM-format helpers: image-path lists, timestamp sync, trajectory export.

Parity surface: /root/reference/tadataka/dataset/tum.py and
/root/reference/tadataka/dataset/match.py.  The reference matches timestamps
by treating them as 1-D descriptors through skimage's matcher; here the
nearest-neighbour + cross-check is computed directly with searchsorted
(O(n log n) instead of the O(n^2) distance matrix).
"""

import csv
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation


def load_image_paths(filepath, prefix, delimiter=' '):
    """Parse a '<timestamp> <relative path>' listing file."""
    timestamps = []
    image_paths = []
    with open(str(filepath), "r") as f:
        reader = csv.reader(f, delimiter=delimiter)
        for row in reader:
            if not row or row[0].startswith('#'):
                continue
            timestamps.append(float(row[0]))
            image_paths.append(str(Path(prefix, row[1].strip())))
    return np.array(timestamps), image_paths


def _nearest_indices(query, targets):
    """Index of the nearest target for each query (targets need not be sorted)."""
    order = np.argsort(targets)
    sorted_t = targets[order]
    pos = np.searchsorted(sorted_t, query)
    pos = np.clip(pos, 1, len(sorted_t) - 1)
    left = sorted_t[pos - 1]
    right = sorted_t[pos]
    choose_left = (query - left) <= (right - query)
    idx_sorted = np.where(choose_left, pos - 1, pos)
    return order[idx_sorted]


def match_timestamps(timestamps0, timestamps1,
                     max_difference=np.inf, cross_check=True):
    """Mutual-nearest-neighbour timestamp matches, (n, 2) index pairs."""
    nn01 = _nearest_indices(timestamps0, timestamps1)
    if cross_check:
        nn10 = _nearest_indices(timestamps1, timestamps0)
        i0 = np.arange(len(timestamps0))
        mutual = nn10[nn01] == i0
        matches = np.column_stack((i0[mutual], nn01[mutual]))
    else:
        matches = np.column_stack((np.arange(len(timestamps0)), nn01))
    diff = np.abs(timestamps0[matches[:, 0]] - timestamps1[matches[:, 1]])
    return matches[diff <= max_difference]


def synchronize(timestamps1, timestamps2, timestamps_ref, max_diff=np.inf):
    """3-way sync: rows (index1, index2, index_ref) sharing a ref frame."""
    matches01 = match_timestamps(timestamps_ref, timestamps1, max_diff)
    matches02 = match_timestamps(timestamps_ref, timestamps2, max_diff)
    _, indices1, indices2 = np.intersect1d(
        matches01[:, 0], matches02[:, 0], return_indices=True)
    return np.column_stack((matches01[indices1, 1],
                            matches02[indices2, 1],
                            matches01[indices1, 0]))


def convert_to_tum_poses(rotations, positions):
    assert len(rotations) == positions.shape[0]
    quats = rotations.as_quat()
    return np.hstack((positions, quats))


def save_in_tum_format(filename, timestamps, rotations, positions):
    """Write '<timestamp> tx ty tz qx qy qz qw' lines."""
    posevecs = convert_to_tum_poses(rotations, positions)
    with open(filename, "w") as f:
        for timestamp, posevec in zip(timestamps, posevecs):
            posestr = " ".join(map(str, posevec.tolist()))
            f.write(f"{timestamp} {posestr}\n")


def load_tum_poses(path, delimiter=None):
    """Read TUM groundtruth.txt: (timestamps, Rotation, positions)."""
    array = np.loadtxt(path, delimiter=delimiter)
    timestamps = array[:, 0]
    positions = array[:, 1:4]
    quaternions = array[:, 4:8]
    rotations = Rotation.from_quat(quaternions)
    return timestamps, rotations, positions
