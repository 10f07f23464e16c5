from tadataka_tpu.features.detector import detect_fast, detect_harris, Features
from tadataka_tpu.features.brief import brief_descriptors, extract_features
from tadataka_tpu.features.matching import match_descriptors, Matches, Matcher
from tadataka_tpu.features.orb import (corner_orientations,
                                       extract_orb_features, orb_descriptors)
from tadataka_tpu.features.ransac import (
    ransac_fundamental, ransac_affine)
from tadataka_tpu.features.filters import symmetric_transfer_filter
from tadataka_tpu.features.curvature import (
    compute_image_curvature, extract_curvature_extrema)
from tadataka_tpu.features.extrema_tracker import ExtremaTracker
