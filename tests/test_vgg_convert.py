"""convert-vgg: slim checkpoint -> .npz -> load_params_npz roundtrip, and
end-to-end conv4_3 equality against a TF execution of the same weights.

Needs tensorflow to fabricate the checkpoint; skipped where TF is absent
(the sampler/conv math itself is covered TF-free by
test_tf_parity.py::test_vgg_conv43_stack)."""

from __future__ import annotations

import os

import numpy as np
import pytest

tf_mod = pytest.importorskip("tensorflow")
tf = tf_mod.compat.v1


@pytest.fixture(scope="module")
def mini_ckpt(tmp_path_factory):
    """A fabricated vgg_16 checkpoint with the real variable names/shapes
    (conv1..conv4_3 only — the conv5-less case the converter must accept)."""
    from ntm_tracker_tpu.models.vgg import VGG16_PREFIX

    sys_path = tmp_path_factory.mktemp("vggckpt")
    rs = np.random.RandomState(11)
    values = {}
    with tf.Graph().as_default(), tf.Session() as sess:
        in_ch = 3
        for name, out_ch, _ in VGG16_PREFIX:
            if name.startswith("conv5"):
                break
            w = rs.normal(0, np.sqrt(2.0 / (9 * in_ch)), (3, 3, in_ch, out_ch)).astype(
                np.float32
            )
            b = rs.uniform(-0.05, 0.05, (out_ch,)).astype(np.float32)
            values[f"vgg_16/{name}/weights"] = w
            values[f"vgg_16/{name}/biases"] = b
            with tf.variable_scope(f"vgg_16/{name}"):
                tf.get_variable("weights", initializer=tf.constant(w))
                tf.get_variable("biases", initializer=tf.constant(b))
            in_ch = out_ch
        sess.run(tf.global_variables_initializer())
        path = tf.train.Saver().save(sess, str(sys_path / "vgg_16.ckpt"))
    return path, values


def test_convert_roundtrip(mini_ckpt, tmp_path):
    from ntm_tracker_tpu.models.vgg import load_params_npz
    from ntm_tracker_tpu.tools.convert_vgg import convert_vgg_checkpoint

    ckpt_path, values = mini_ckpt
    out = str(tmp_path / "vgg16.npz")
    shapes = convert_vgg_checkpoint(ckpt_path, out)
    assert len(shapes) == 2 * 10  # conv1_1..conv4_3
    params = load_params_npz(out)
    for name in params:
        np.testing.assert_array_equal(
            params[name]["weights"], values[f"vgg_16/{name}/weights"]
        )
        np.testing.assert_array_equal(
            params[name]["biases"], values[f"vgg_16/{name}/biases"]
        )


def test_convert_requires_conv5_flag(mini_ckpt, tmp_path):
    from ntm_tracker_tpu.tools.convert_vgg import convert_vgg_checkpoint

    ckpt_path, _ = mini_ckpt
    with pytest.raises(KeyError, match="conv5"):
        convert_vgg_checkpoint(
            ckpt_path, str(tmp_path / "x.npz"), require_conv5=True
        )


def test_converted_weights_reach_reference_features(mini_ckpt, tmp_path):
    """conv4_3 through our JAX stack on CONVERTED weights == TF executing
    the slim architecture on the original checkpoint values."""
    import jax.numpy as jnp

    from ntm_tracker_tpu.models.vgg import (
        VGG16_PREFIX,
        load_params_npz,
        vgg16_features,
    )
    from ntm_tracker_tpu.tools.convert_vgg import convert_vgg_checkpoint

    ckpt_path, values = mini_ckpt
    out = str(tmp_path / "vgg16.npz")
    convert_vgg_checkpoint(ckpt_path, out)
    params = load_params_npz(out)

    rs = np.random.RandomState(12)
    image = rs.uniform(-120, 130, (1, 64, 64, 3)).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        x = tf.constant(image)
        for name, _out_ch, has_pool in VGG16_PREFIX:
            if name.startswith("conv5"):
                break
            x = tf.nn.relu(
                tf.nn.conv2d(
                    x, tf.constant(values[f"vgg_16/{name}/weights"]),
                    [1, 1, 1, 1], "SAME",
                )
                + tf.constant(values[f"vgg_16/{name}/biases"])
            )
            if name == "conv4/conv4_3":
                break
            if has_pool:
                x = tf.nn.max_pool2d(x, 2, 2, "VALID")
        ref = sess.run(x)

    got = vgg16_features(params, jnp.asarray(image))
    # cross-library f32 conv accumulation order (oneDNN vs XLA) costs a few
    # ULP per layer; measured 2.5e-6 relative over the 10-conv stack
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=1e-5 * scale)


def test_expect_sha256_gate(mini_ckpt, tmp_path):
    """--expect_sha256: matching digest converts; a wrong one refuses
    BEFORE writing anything."""
    from ntm_tracker_tpu.tools.convert_vgg import (
        checkpoint_sha256,
        convert_vgg_checkpoint,
    )

    ckpt_path, _ = mini_ckpt
    digest = checkpoint_sha256(ckpt_path)
    out = str(tmp_path / "ok.npz")
    convert_vgg_checkpoint(ckpt_path, out, expect_sha256=digest.upper())
    assert os.path.exists(out)
    bad = str(tmp_path / "bad.npz")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        convert_vgg_checkpoint(ckpt_path, bad, expect_sha256="0" * 64)
    assert not os.path.exists(bad)


def test_activation_stats_selfcheck(mini_ckpt, tmp_path):
    """The post-conversion self-check runs TF-free on the written .npz and
    reports finite ReLU statistics."""
    from ntm_tracker_tpu.tools.convert_vgg import (
        activation_stats,
        convert_vgg_checkpoint,
    )

    ckpt_path, _ = mini_ckpt
    out = str(tmp_path / "vgg16.npz")
    convert_vgg_checkpoint(ckpt_path, out)
    stats = activation_stats(out)
    assert set(stats) == {
        "conv43_mean", "conv43_std", "conv43_max", "conv43_sparsity"
    }
    assert all(np.isfinite(v) for v in stats.values())
    assert stats["conv43_max"] >= 0 and 0 <= stats["conv43_sparsity"] <= 1
