from tadataka_tpu.vo.dvo import PoseChangeEstimator
