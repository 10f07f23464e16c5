from tadataka_tpu.optimization.framework import (
    Function, BaseResidual, SumRobustifiedNormError,
    SquaredRobustifier, GemanMcClureRobustifier,
    GaussNewtonUpdater, Optimizer)
