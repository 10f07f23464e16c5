from tadataka_tpu.camera.parameters import CameraParameters
from tadataka_tpu.camera.distortion import NoDistortion, FOV, RadTan
from tadataka_tpu.camera.model import CameraModel, resize
from tadataka_tpu.camera.io import load, save
from tadataka_tpu.camera.table import NormalizationMapTable
