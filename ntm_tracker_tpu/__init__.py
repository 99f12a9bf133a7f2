"""ntm_tracker_tpu — a TPU-native (JAX/XLA/Pallas/pjit) NTM/DNC visual-tracking
framework with the capabilities of JeffOwOSun/ntm-tracker.

This is a ground-up rebuild, not a port: pure-functional cells with explicit
state pytrees, `lax.scan` over serialized frame tokens, optax-style training,
orbax checkpoints, device-side image pipeline, data-parallel `pjit` over a
`jax.sharding.Mesh`, and Pallas kernels for the fused memory-addressing math.

Reference map (citations are file:line into the reference tree):
  ops/memory.py        <- ops.py (cosine similarity, circular convolution)
  ops/lstm.py          <- tf.contrib.rnn.BasicLSTMCell semantics (ntm_cell.py:45-50)
  models/ntm_cell.py   <- ntm_cell.py
  models/ntm_tracker.py<- ntm_tracker_new.py
  models/legacy_ntm.py <- ntm.py (the older model, dead upstream)
  models/dnc/          <- dnc/ (addressing, access, dnc core, repeat_copy)
  models/vgg.py        <- vgg.py + freeze_vgg.py + receptive_field_sizes.py
  data/                <- preprocess.py + get_input (direct_offset_output.py:159-224)
  train/               <- direct_offset_output.py + main.py harnesses
  tracking/            <- test_tracker.py + vot.py + validate_tracker.py
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml
