"""Camera-model text file IO.

Parity surface: /root/reference/tadataka/camera/io.py — one line per camera:
``<camera_id> <DistortionType> <fx> <fy> <cx> <cy> [dist params...]``.
"""

import re

from tadataka_tpu.camera.model import CameraModel


def _parse_line(line):
    camera_id, model_params = re.split(r"\s+", line, maxsplit=1)
    try:
        camera_id = int(camera_id)
    except ValueError:
        raise ValueError("Camera ID must be integer")
    return camera_id, CameraModel.fromstring(model_params)


def load(filename):
    camera_models = {}
    with open(filename, 'r') as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            camera_id, camera_model = _parse_line(line)
            camera_models[camera_id] = camera_model
    return camera_models


def save(filename, camera_models):
    items = sorted(camera_models.items(), key=lambda v: v[0])
    with open(filename, 'w') as f:
        for camera_id, camera_model in items:
            f.write(f"{camera_id} {camera_model}\n")
