from tadataka_tpu.viz.plot import (
    plot_map, plot_trajectory, plot_matches, plot_depth_dashboard,
    plot_cameras)
from tadataka_tpu.viz.animation import (
    VOAnimation, FeatureVOAnimation, TrajectoryOrbitAnimation)
