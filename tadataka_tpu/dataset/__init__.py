from tadataka_tpu.dataset.frame import Frame
from tadataka_tpu.dataset.base import BaseDataset
from tadataka_tpu.dataset.synthetic import (
    PlaneSceneDataset, render_plane_scene, default_texture)
from tadataka_tpu.dataset.tum_rgbd import TumRgbdDataset
from tadataka_tpu.dataset.new_tsukuba import NewTsukubaDataset
from tadataka_tpu.dataset.euroc import EurocDataset
