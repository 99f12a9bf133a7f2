from ntm_tracker_tpu.ops.memory import (
    batched_slotwise_cosine_similarity,
    batched_smooth_cosine_similarity,
    smooth_cosine_similarity,
    batched_circular_convolution,
    circular_convolution_shifts,
    circular_shift,
    sharpen,
    weighted_softmax,
)
from ntm_tracker_tpu.ops.lstm import lstm_cell_step, multi_lstm_step, init_lstm_params, zero_lstm_state

__all__ = [
    "batched_slotwise_cosine_similarity",
    "batched_smooth_cosine_similarity",
    "smooth_cosine_similarity",
    "batched_circular_convolution",
    "circular_convolution_shifts",
    "circular_shift",
    "sharpen",
    "weighted_softmax",
    "lstm_cell_step",
    "multi_lstm_step",
    "init_lstm_params",
    "zero_lstm_state",
]
