from ntm_tracker_tpu.utils.misc import (
    circular_convolution_1d,
    decaying_softmax,
    pairwise_add,
    progress,
)
from ntm_tracker_tpu.utils.profiling import profile_trace
