"""Convert the public slim vgg_16.ckpt into the .npz layout this framework
loads (models/vgg.py:load_params_npz).

The reference consumes the checkpoint through freeze_vgg.py + a frozen
GraphDef (freeze_vgg.py:4-16, README.md:24-30); here the weights become a
plain array archive so TensorFlow is only needed once, offline:

    python -m ntm_tracker_tpu convert-vgg --ckpt vgg_16.ckpt --out vgg16.npz

Keys in the archive keep the slim names ('vgg_16/conv1/conv1_1/weights',
HWIO [3,3,in,out]; '/biases' [out]), so `load_params_npz` reads it directly
and third-party slim tooling recognizes the layout.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ntm_tracker_tpu.models.vgg import VGG16_PREFIX


def convert_vgg_checkpoint(
    ckpt_path: str, out_path: str, require_conv5: bool = False
) -> Dict[str, tuple]:
    """Read a slim vgg_16 checkpoint and write the framework's .npz.

    Args:
      ckpt_path: path to vgg_16.ckpt (the public slim release or any
        checkpoint with 'vgg_16/<block>/<layer>/{weights,biases}' tensors).
      out_path: destination .npz.
      require_conv5: fail if the conv5 block is absent (it is only needed
        for the pool5 endpoint; conv1-conv4_3 archives are valid).
    Returns:
      {key: shape} of the arrays written.
    """
    try:
        import tensorflow as tf  # local import: TF is an offline-only dep
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "convert-vgg needs tensorflow to read the checkpoint; run this "
            "step on a machine with TF installed — the resulting .npz is "
            "TF-free"
        ) from e

    reader = tf.train.load_checkpoint(ckpt_path)
    arrays: Dict[str, np.ndarray] = {}
    for name, out_ch, _ in VGG16_PREFIX:
        for kind in ("weights", "biases"):
            key = f"vgg_16/{name}/{kind}"
            if not reader.has_tensor(key):
                if name.startswith("conv5") and not require_conv5:
                    continue
                raise KeyError(f"checkpoint {ckpt_path} has no tensor {key}")
            value = reader.get_tensor(key)
            expect_last = out_ch
            if kind == "weights" and value.ndim != 4:
                raise ValueError(f"{key}: expected HWIO conv kernel, got {value.shape}")
            if value.shape[-1] != expect_last:
                raise ValueError(
                    f"{key}: trailing dim {value.shape[-1]} != {expect_last}"
                )
            arrays[key] = value.astype(np.float32)
    np.savez(out_path, **arrays)
    return {k: v.shape for k, v in arrays.items()}
