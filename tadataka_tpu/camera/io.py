"""Camera-model text file IO.

Parity surface: /root/reference/tadataka/camera/io.py — one line per camera:
``<camera_id> <DistortionType> <fx> <fy> <cx> <cy> [dist params...]``.
"""

from tadataka_tpu.camera.model import CameraModel


def _parse_line(line):
    """Split one ``<id> <model spec>`` record into (int id, CameraModel)."""
    fields = line.split(None, 1)
    if len(fields) != 2 or not fields[0].lstrip("+-").isdigit():
        raise ValueError(f"invalid camera record {line!r}: expected "
                         "'<integer id> <model spec>'")
    return int(fields[0]), CameraModel.fromstring(fields[1])


def load(filename):
    camera_models = {}
    with open(filename) as f:
        records = (line.strip() for line in f)
        for record in records:
            if record:
                camera_id, model = _parse_line(record)
                camera_models[camera_id] = model
    return camera_models


def save(filename, camera_models):
    items = sorted(camera_models.items(), key=lambda v: v[0])
    with open(filename, 'w') as f:
        for camera_id, camera_model in items:
            f.write(f"{camera_id} {camera_model}\n")
