from tadataka_tpu.apps.semi_dense_vo import SemiDenseVO
from tadataka_tpu.apps.dvo_trajectory import DvoTrajectory
