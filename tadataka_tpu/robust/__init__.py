from tadataka_tpu.robust.weights import (
    compute_weights_tukey, compute_weights_huber, compute_weights_student_t)
