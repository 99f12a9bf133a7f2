"""Generate the EXECUTED-reference golden for the FULL streaming tracker
loop — the cross-frame composition test_tracker.py wires together:

    _preprocess_image (np-side delimiter/gt padding, test_tracker.py:370-405)
    -> 65 one-token sess.runs through the state_placeholder contract (:284-299)
    -> _collect_outputs/_get_bbox/_decode_bbox (:252-282)
    -> _update_bbox recrop feedback (:301-329) -> reported region

This script instantiates the reference's OWN `test_tracker.NTMTracker`
class (loaded with the same Py2/TF1 shims as gen_tf_goldens.py, module-level
VOT driver truncated) against:

  * a frozen VGG .pb built from the seeded conv1..conv4_3 weights
    (tests/fixture_params.seeded_vgg_params — the same weights the JAX side
    regenerates), serialized with the exact node names the reference's
    import_graph_def requests ('inputs', 'vgg_16/conv4/conv4_3/Relu:0',
    test_tracker.py:356-361);
  * a REAL tf.train.Saver checkpoint of the tracker graph's variables
    (scope layout 'ntm-tracker/{ntm-cell,init_state}/...', :331-342)
    holding tests/fixture_params.seeded_loop_cell_params;
  * the seeded synthetic video (fixture_params.seeded_loop_video), fed
    through the class's own scipy.misc.imread seam.

It records the per-frame reported regions, internal output bboxes and
recomputed cropboxes, self-checks them against this repo's
tracking.StreamingTracker (delimiter_first=True, CPU f32), and commits the
trajectory as tests/fixtures/tf_goldens_tracker_loop.npz.

Regenerate with: python tests/gen_tracker_loop_golden.py
(needs tensorflow + the reference checkout; the committed test does not).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.gen_tf_goldens import (  # noqa: E402
    FIXTURE_DIR,
    _ShimBasicLSTMCell,
    _ShimMultiRNNCell,
    _load_patched_module,
    _load_reference_stack,
)
from tests.fixture_params import (  # noqa: E402
    TRACKER_LOOP_CONFIG,
    TRACKER_LOOP_FRAMES,
    TRACKER_LOOP_REGION0,
    seeded_loop_cell_params,
    seeded_loop_video,
    seeded_vgg_params,
)

import tensorflow.compat.v1 as tf  # noqa: E402

tf.disable_v2_behavior()


def build_frozen_vgg_pb(path: str) -> None:
    """Serialize the seeded conv1..conv4_3 stack as a frozen GraphDef with
    the slim node names the reference's preprocessor imports
    (test_tracker.py:356-361). Constants only — exactly what freeze_graph
    produced upstream (README.md:24-30)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ntm_tracker_tpu.models.vgg import VGG16_PREFIX

    params = seeded_vgg_params(VGG16_PREFIX)
    g = tf.Graph()
    with g.as_default():
        x = tf.placeholder(tf.float32, [1, 224, 224, 3], name="inputs")
        for name, _out_ch, has_pool in VGG16_PREFIX:
            p = params[name]
            # absolute name scope (trailing slash) -> op 'vgg_16/<name>/Relu'
            with tf.name_scope(f"vgg_16/{name}/"):
                x = tf.nn.conv2d(
                    x, tf.constant(p["weights"]), [1, 1, 1, 1], "SAME"
                )
                x = tf.nn.bias_add(x, tf.constant(p["biases"]))
                x = tf.nn.relu(x, name="Relu")
            if name == "conv4/conv4_3":
                break
            if has_pool:
                x = tf.nn.max_pool2d(x, 2, 2, "VALID")
        assert x.op.name == "vgg_16/conv4/conv4_3/Relu", x.op.name
    with open(path, "wb") as f:
        f.write(g.as_graph_def().SerializeToString())


def make_reference_ckpt(ckpt_dir: str) -> str:
    """Build the tracker graph's variables (the layout _build_tracker
    creates: NTMCell called inside variable_scope('ntm-tracker') with
    zero_state alongside, test_tracker.py:331-342 == the training layout,
    direct_offset_output.py:529-543), inject the seeded parameters, and
    write a REAL tf.train.Saver checkpoint for the tracker to restore."""
    _load_reference_stack()
    ref_cell_mod = _load_patched_module(
        "ntm_cell.py", "_ref_ntm_cell_loop",
        extra_globals={
            "_SHIM_MultiRNNCell": _ShimMultiRNNCell,
            "_SHIM_BasicLSTMCell": _ShimBasicLSTMCell,
        },
    )
    c = TRACKER_LOOP_CONFIG
    params = seeded_loop_cell_params()
    with tf.Graph().as_default(), tf.Session() as sess:
        cell = ref_cell_mod.NTMCell(
            2, mem_size=c["mem_size"], mem_dim=c["mem_dim"],
            shift_range=c["shift_range"],
            controller_hidden_size=c["hidden"],
            controller_num_layers=c["num_layers"],
            read_head_size=c["read_heads"],
            write_head_size=c["write_heads"], write_first=False,
        )
        with tf.variable_scope("ntm-tracker"):
            cell.zero_state(1)
            state_ph = cell.state_placeholder(1)
            x_ph = tf.placeholder(tf.float32, [1, c["input_depth"]])
            cell(x_ph, state_ph)
        name_map = {
            "ntm-tracker/ntm-cell/addressing/weights": "heads_w",
            "ntm-tracker/ntm-cell/addressing/biases": "heads_b",
            "ntm-tracker/ntm-cell/weights": "out_w",
            "ntm-tracker/ntm-cell/biases": "out_b",
            "ntm-tracker/init_state/M": "init_M",
            "ntm-tracker/init_state/w": "init_w",
            "ntm-tracker/init_state/read": "init_read",
        }
        for layer in range(c["num_layers"]):
            pre = (f"ntm-tracker/ntm-cell/lstm-controller/cell_{layer}/"
                   "basic_lstm_cell/")
            name_map[pre + "kernel"] = f"ctrl_kernel_{layer}"
            name_map[pre + "bias"] = f"ctrl_bias_{layer}"
        gvars = {v.op.name: v for v in tf.global_variables()}
        assert set(gvars) == set(name_map), (sorted(gvars), sorted(name_map))
        for vname, pkey in name_map.items():
            assert tuple(gvars[vname].shape.as_list()) == params[pkey].shape, (
                vname, gvars[vname].shape, params[pkey].shape)
            gvars[vname].load(params[pkey], sess)
        return tf.train.Saver().save(sess, os.path.join(ckpt_dir, "model.ckpt"))


def run_reference_loop(pb_path: str, ckpt_path: str, log_dir: str):
    """Execute test_tracker.NTMTracker over the seeded video and record the
    trajectory: reported regions, internal output bboxes, cropboxes."""
    video = seeded_loop_video()
    frames = {f"/fake/frames/{i:06d}.png": video[i] for i in range(len(video))}

    def injected_imread(path):
        return frames[path]

    c = TRACKER_LOOP_CONFIG
    flags_ns = types.SimpleNamespace(
        input_depth=c["input_depth"],
        vgg_model_frozen=pb_path,
        feature_layer="vgg_16/conv4/conv4_3/Relu:0",
        cropbox_grid=8,
        bbox_grid=6,
        ckpt_path=ckpt_path,
        save_img=False,
        mem_size=c["mem_size"],
        mem_dim=c["mem_dim"],
        hidden_size=c["hidden"],
        num_layers=c["num_layers"],
        read_head_size=c["read_heads"],
        write_head_size=c["write_heads"],
        write_first=False,
    )
    # module dependencies of test_tracker.py, loaded under their bare names
    _load_reference_stack()
    _load_patched_module(
        "ntm_cell.py", "ntm_cell",
        extra_globals={
            "_SHIM_MultiRNNCell": _ShimMultiRNNCell,
            "_SHIM_BasicLSTMCell": _ShimBasicLSTMCell,
        },
    )
    _load_patched_module("vot.py", "vot")
    _load_patched_module("preprocess.py", "preprocess")
    _load_patched_module(
        "receptive_field_sizes.py", "receptive_field_sizes",
        truncate_at="if __name__ == '__main__':",  # Py2 print-stmt block
    )
    mod = _load_patched_module(
        "test_tracker.py", "_ref_test_tracker",
        truncate_at='handle = vot.VOT("rectangle")',  # module-level driver
        extra_globals={
            "_INJECTED_FLAGS": flags_ns,
            "_INJECTED_IMREAD": injected_imread,
            "_INJECTED_LOG_DIR": log_dir,
        },
        extra_patches=[
            ("FLAGS=flags.FLAGS", "FLAGS = _INJECTED_FLAGS"),
            ("real_log_dir = os.path.join(real_dir, 'test_log', "
             "str(datetime.now()))", "real_log_dir = _INJECTED_LOG_DIR"),
            ("scipy.misc.imread(imagepath)", "_INJECTED_IMREAD(imagepath)"),
        ],
    )

    # the reference's module-level logging.basicConfig put the ROOT logger
    # at DEBUG (test_tracker.py:14-15); quiet it so jax's debug stream does
    # not flood the generator output
    import logging

    logging.getLogger().setLevel(logging.WARNING)

    import vot as vot_mod  # the patched module registered above

    x0, y0, w0, h0 = TRACKER_LOOP_REGION0
    paths = sorted(frames)
    with tf.Graph().as_default():
        tracker = mod.NTMTracker(
            paths[0], vot_mod.Rectangle(x0, y0, w0, h0)
        )
        cropboxes = [list(tracker.cropbox)]
        nb0 = list(tracker.normalized_bbox)
        regions, out_bboxes = [], []
        for p in paths[1:]:
            region = tracker.track(p)
            regions.append([region.x, region.y, region.width, region.height])
            out_bboxes.append(list(tracker.output_bbox))
            cropboxes.append(list(tracker.cropbox))
        tracker.sess.close()
    return {
        "loop_regions": np.array(regions, np.float64),
        "loop_output_bboxes": np.array(out_bboxes, np.float64),
        "loop_cropboxes": np.array(cropboxes, np.float64),
        "loop_normalized_bbox0": np.array(nb0, np.float64),
        "loop_region0": np.array(TRACKER_LOOP_REGION0, np.float64),
        "loop_video_sha": np.frombuffer(
            hashlib.sha256(video.tobytes()).digest(), np.uint8
        ),
        "loop_config": np.array(
            [c["input_depth"], c["mem_size"], c["mem_dim"], c["hidden"],
             c["num_layers"], c["read_heads"], c["write_heads"],
             c["shift_range"], TRACKER_LOOP_FRAMES], np.int64,
        ),
    }


def self_check(golden: dict) -> None:
    """Drive this repo's StreamingTracker on CPU f32 over the same video and
    print the worst per-frame deviation (the committed test re-asserts this
    TF-free)."""
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from tests.test_tf_parity import run_repo_tracker_loop

    ours = run_repo_tracker_loop()
    worst = 0.0
    for key in ("loop_regions", "loop_cropboxes", "loop_output_bboxes"):
        diff = np.abs(np.asarray(ours[key]) - golden[key])
        scale = np.maximum(1.0, np.abs(golden[key]))
        rel = (diff / scale).max()
        worst = max(worst, rel)
        print(f"  {key}: max abs diff {diff.max():.3e}  max rel {rel:.3e}")
    if worst > 1e-4:
        raise SystemExit(f"self-check FAILED: relative deviation {worst:.3e}")
    print(f"self-check passed (worst rel {worst:.3e})")


def main():
    tmp = tempfile.mkdtemp(prefix="ref_tracker_loop_")
    try:
        pb_path = os.path.join(tmp, "vgg_16_frozen.pb")
        build_frozen_vgg_pb(pb_path)
        print(f"frozen VGG pb written ({os.path.getsize(pb_path)>>20} MiB)")
        ckpt_path = make_reference_ckpt(tmp)
        print(f"reference Saver checkpoint at {ckpt_path}")
        golden = run_reference_loop(pb_path, ckpt_path, os.path.join(tmp, "log"))
        print("reference loop executed:")
        for i, r in enumerate(golden["loop_regions"]):
            print(f"  frame {i + 1}: region "
                  + " ".join(f"{v:9.4f}" for v in r))
        self_check(golden)
        dest = os.path.join(FIXTURE_DIR, "tf_goldens_tracker_loop.npz")
        np.savez_compressed(dest, **golden)
        print(f"wrote {dest}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
