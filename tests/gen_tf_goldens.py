"""Generate EXECUTED-TensorFlow golden fixtures for the parity suite.

Unlike tests/gen_fixtures.py (drift detection against our own outputs),
every array written here comes out of a TensorFlow session that ran either

  (a) TF library ops the reference depends on (tf.image.crop_and_resize,
      TF1 resize_images, LSTMBlockCell gate math, tf.train.RMSPropOptimizer
      + clip_by_global_norm), or
  (b) the reference's OWN code — /root/reference/ops.py and
      /root/reference/ntm_cell.py — loaded with a minimal Py2->Py3 /
      TF1->TF2-compat shim and executed in graph mode with injected
      parameters, including a >=65-step rollout through the
      state_placeholder streaming contract (ntm_cell.py:255-282).

The resulting .npz files are committed under tests/fixtures/ so
tests/test_tf_parity.py runs without TensorFlow installed. Regenerate with:

    python tests/gen_tf_goldens.py

Requirements to regenerate: tensorflow>=2.x with tf.compat.v1, and the
reference checkout at /root/reference.
"""

from __future__ import annotations

import os
import re
import sys
import types

import numpy as np

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# oneDNN may reorder float reductions; keep the goldens deterministic.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import tensorflow.compat.v1 as tf  # noqa: E402

tf.disable_v2_behavior()

REFERENCE_DIR = os.environ.get("NTM_REFERENCE_DIR", "/root/reference")
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


# ---------------------------------------------------------------------------
# loading the reference source under TF2's compat layer
# ---------------------------------------------------------------------------

def _load_patched_module(filename: str, name: str, extra_globals=None,
                         extra_patches=(), truncate_at=None):
    """Exec a reference source file with the minimal shims needed to run
    2017-era TF1/Py2 code on this machine's TF2 + Py3:

      * ``import tensorflow as tf``  ->  ``tensorflow.compat.v1``
      * ``xrange`` -> ``range``; the ONE true division the reference relies
        on Py2 floor semantics for (`-shift_space/2`, ops.py:204) -> ``//``
        (Py3 ``-3//2 == -2`` matches Py2 ``-3/2``)
      * ``tf.contrib.rnn.{MultiRNNCell,BasicLSTMCell}`` -> graph-mode shims
        (tf.contrib does not exist in TF2; see _ShimBasicLSTMCell below,
        which the generator itself cross-checks against
        tf.raw_ops.LSTMBlockCell)

    The semantics of the reference code are untouched.
    """
    path = os.path.join(REFERENCE_DIR, filename)
    with open(path) as f:
        src = f.read()
    if truncate_at is not None:
        # drop everything from the marker on (module-level driver code —
        # e.g. test_tracker.py's VOT loop, or a Py2-print __main__ block)
        src = src[: src.index(truncate_at)]
    src = src.replace("import tensorflow as tf", "import tensorflow.compat.v1 as tf")
    src = src.replace("-shift_space/2", "-shift_space//2")
    src = src.replace("tf.mul(", "tf.multiply(")  # TF<1.0 alias (ops.py:291,300)
    src = re.sub(r"\bxrange\b", "range", src)
    src = src.replace("tf.contrib.rnn.MultiRNNCell", "_SHIM_MultiRNNCell")
    src = src.replace("tf.contrib.rnn.BasicLSTMCell", "_SHIM_BasicLSTMCell")
    for old, new in extra_patches:
        src = src.replace(old, new)
    module = types.ModuleType(name)
    module.__file__ = path
    if extra_globals:
        module.__dict__.update(extra_globals)
    sys.modules[name] = module
    code = compile(src, path, "exec")
    exec(code, module.__dict__)
    return module


def _patch_nest():
    """TF2 removed nest.is_sequence (used by the reference's _linear,
    ntm_cell.py:334); restore it."""
    from tensorflow.python.util import nest

    if not hasattr(nest, "is_sequence"):
        nest.is_sequence = nest.is_nested


class _ShimBasicLSTMCell:
    """Graph-mode stand-in for tf.contrib.rnn.BasicLSTMCell(state_is_tuple=
    False): gates = [x,h] @ kernel + bias split (i,j,f,o);
    c' = c*sig(f+fb) + sig(i)*tanh(j); h' = tanh(c')*sig(o); state=[c|h].
    Cross-checked against tf.raw_ops.LSTMBlockCell in _selfcheck_lstm_shim.
    """

    def __init__(self, num_units, forget_bias=0.0, state_is_tuple=False):
        assert not state_is_tuple
        self._num_units = num_units
        self._forget_bias = forget_bias

    @property
    def state_size(self):
        return 2 * self._num_units

    def __call__(self, inputs, state, scope=None):
        with tf.variable_scope(scope or "basic_lstm_cell"):
            c = state[:, : self._num_units]
            h = state[:, self._num_units :]
            in_dim = int(inputs.shape[1])
            kernel = tf.get_variable(
                "kernel", [in_dim + self._num_units, 4 * self._num_units]
            )
            bias = tf.get_variable(
                "bias", [4 * self._num_units], initializer=tf.zeros_initializer()
            )
            gates = tf.matmul(tf.concat([inputs, h], 1), kernel) + bias
            i, j, f, o = tf.split(gates, 4, axis=1)
            new_c = c * tf.sigmoid(f + self._forget_bias) + tf.sigmoid(i) * tf.tanh(j)
            new_h = tf.tanh(new_c) * tf.sigmoid(o)
            return new_h, tf.concat([new_c, new_h], 1)


class _ShimMultiRNNCell:
    """tf.contrib.rnn.MultiRNNCell(state_is_tuple=False): the flat state is
    the per-cell states concatenated on axis 1; each layer feeds the next."""

    def __init__(self, cells, state_is_tuple=False):
        assert not state_is_tuple
        self._cells = list(cells)

    @property
    def state_size(self):
        return sum(c.state_size for c in self._cells)

    def zero_state(self, batch_size, dtype):
        return tf.zeros([batch_size, self.state_size], dtype)

    def __call__(self, inputs, state, scope=None):
        with tf.variable_scope(scope or "multi_rnn_cell"):
            out = inputs
            new_states = []
            offset = 0
            for i, cell in enumerate(self._cells):
                with tf.variable_scope("cell_%d" % i):
                    s = state[:, offset : offset + cell.state_size]
                    offset += cell.state_size
                    out, ns = cell(out, s)
                    new_states.append(ns)
            return out, tf.concat(new_states, 1)


def _selfcheck_lstm_shim():
    """Prove the shim's gate math equals TF's own C++ LSTM kernel
    (tf.raw_ops.LSTMBlockCell, gate order i,c(=j),f,o — the documented
    BasicLSTMCell-compatible block cell)."""
    rs = np.random.RandomState(7)
    B, IN, H = 3, 12, 8
    x = rs.uniform(-1, 1, (B, IN)).astype(np.float32)
    c0 = rs.uniform(-1, 1, (B, H)).astype(np.float32)
    h0 = rs.uniform(-1, 1, (B, H)).astype(np.float32)
    kernel = rs.uniform(-0.5, 0.5, (IN + H, 4 * H)).astype(np.float32)
    bias = rs.uniform(-0.1, 0.1, (4 * H,)).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        cell = _ShimBasicLSTMCell(H, forget_bias=0.0, state_is_tuple=False)
        h_out, state_out = cell(
            tf.constant(x), tf.constant(np.concatenate([c0, h0], 1))
        )
        block = tf.raw_ops.LSTMBlockCell(
            x=tf.constant(x),
            cs_prev=tf.constant(c0),
            h_prev=tf.constant(h0),
            w=tf.constant(kernel),
            wci=tf.zeros([H]),
            wcf=tf.zeros([H]),
            wco=tf.zeros([H]),
            b=tf.constant(bias),
            forget_bias=0.0,
            cell_clip=-1.0,
            use_peephole=False,
        )
        for v in tf.global_variables():
            if v.op.name.endswith("kernel"):
                v.load(kernel, sess)
            elif v.op.name.endswith("bias"):
                v.load(bias, sess)
        shim_h, shim_state = sess.run([h_out, state_out])
        blk = sess.run(block)
    blk_cs, blk_h = blk[1], blk[6]
    np.testing.assert_allclose(shim_h, blk_h, atol=1e-6)
    np.testing.assert_allclose(shim_state[:, :H], blk_cs, atol=1e-6)
    print("  lstm shim == tf.raw_ops.LSTMBlockCell  OK")
    return dict(
        lstm_x=x, lstm_c=c0, lstm_h=h0, lstm_kernel=kernel, lstm_bias=bias,
        lstm_new_c=blk_cs, lstm_new_h=blk_h,
    )


# ---------------------------------------------------------------------------
# section A/B: op-level goldens
# ---------------------------------------------------------------------------

def _load_reference_stack():
    """Load utils -> ops (ntm_cell/ntm import from both) in order, under
    the bare names their `from X import ...` statements expect."""
    _patch_nest()
    if "utils" not in sys.modules or not getattr(
        sys.modules.get("utils"), "__file__", ""
    ).startswith(REFERENCE_DIR):
        _load_patched_module("utils.py", "utils")
    return _load_patched_module("ops.py", "ops")


def gen_op_goldens():
    out = {}
    rs = np.random.RandomState(0)
    ref_ops = _load_reference_stack()

    # --- the reference's executed content addressing (ops.py:135-158),
    # including the across-slot l2_normalize quirk ---
    memory = rs.uniform(-1, 1, (2, 16, 8)).astype(np.float32)
    keys = rs.uniform(-1, 1, (2, 5, 8)).astype(np.float32)
    with tf.Graph().as_default(), tf.Session() as sess:
        sim = ref_ops.batched_smooth_cosine_similarity(
            tf.constant(memory), tf.constant(keys)
        )
        out["ops_cos_memory"] = memory
        out["ops_cos_keys"] = keys
        out["ops_cos_out"] = sess.run(sim)

    # --- the reference's circular convolution with Py2 shift offsets
    # (ops.py:180-242): S=3 -> {-2,-1,0}, S=5 -> {-3,...,1} ---
    for S in (3, 5):
        tensor = rs.uniform(0, 1, (2, 5, 16)).astype(np.float32)
        kern = rs.uniform(0, 1, (2, 5, S)).astype(np.float32)
        kern /= kern.sum(-1, keepdims=True)
        with tf.Graph().as_default(), tf.Session() as sess:
            conv = ref_ops.batched_circular_convolution(
                tf.constant(tensor), tf.constant(kern)
            )
            out[f"ops_conv{S}_tensor"] = tensor
            out[f"ops_conv{S}_kernel"] = kern
            out[f"ops_conv{S}_out"] = sess.run(conv)

    # --- tf.image.crop_and_resize (direct_offset_output.py:195-201),
    # one box per image, including a box spilling outside the frame ---
    images = rs.uniform(0, 255, (3, 24, 32, 3)).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.7, 0.9],
            [-0.3, -0.1, 1.2, 1.4],   # out-of-bounds -> extrapolation 0
            [0.0, 0.0, 1.0, 1.0],
        ],
        np.float32,
    )
    with tf.Graph().as_default(), tf.Session() as sess:
        for hw in ((14, 14), (7, 9)):
            car = tf.image.crop_and_resize(
                tf.constant(images), tf.constant(boxes),
                box_ind=tf.constant([0, 1, 2], tf.int32), crop_size=hw,
            )
            out[f"car_out_{hw[0]}x{hw[1]}"] = sess.run(car)
    out["car_images"] = images
    out["car_boxes"] = boxes

    # --- TF1 resize_images bilinear, align_corners=False (legacy grid) ---
    src = rs.uniform(0, 255, (17, 23, 3)).astype(np.float32)
    with tf.Graph().as_default(), tf.Session() as sess:
        up = tf.image.resize_images(
            tf.constant(src), [24, 30], method=tf.image.ResizeMethod.BILINEAR,
            align_corners=False,
        )
        down = tf.image.resize_images(
            tf.constant(src), [9, 11], method=tf.image.ResizeMethod.BILINEAR,
            align_corners=False,
        )
        out["resize_src"] = src
        out["resize_up"] = sess.run(up)
        out["resize_down"] = sess.run(down)

    # --- executed LSTM gate math (TF's own C++ kernel) ---
    out.update(_selfcheck_lstm_shim())

    # --- tf.train.RMSPropOptimizer(lr, .95, .9) + clip_by_global_norm(5)
    # multi-step trajectory (direct_offset_output.py:611-626) ---
    a0 = rs.uniform(-1, 1, (4, 3)).astype(np.float32)
    b0 = rs.uniform(-1, 1, (5,)).astype(np.float32)
    ta = rs.uniform(-1, 1, (4, 3)).astype(np.float32)
    tb = rs.uniform(-1, 1, (5,)).astype(np.float32)
    steps = 6
    with tf.Graph().as_default(), tf.Session() as sess:
        va = tf.get_variable("a", initializer=tf.constant(a0))
        vb = tf.get_variable("b", initializer=tf.constant(b0))
        # scale keeps early gradients above the clip threshold so
        # clip_by_global_norm actually engages on the trajectory
        loss = 4.0 * (tf.nn.l2_loss(va - ta) + tf.nn.l2_loss(vb - tb))
        grads, _ = tf.clip_by_global_norm(tf.gradients(loss, [va, vb]), 5.0)
        opt = tf.train.RMSPropOptimizer(0.01, decay=0.95, momentum=0.9)
        train_op = opt.apply_gradients(zip(grads, [va, vb]))
        sess.run(tf.global_variables_initializer())
        traj_a, traj_b = [], []
        for _ in range(steps):
            sess.run(train_op)
            na, nb = sess.run([va, vb])
            traj_a.append(na)
            traj_b.append(nb)
    out["rms_a0"] = a0
    out["rms_b0"] = b0
    out["rms_ta"] = ta
    out["rms_tb"] = tb
    out["rms_traj_a"] = np.stack(traj_a)
    out["rms_traj_b"] = np.stack(traj_b)
    return out


def gen_vgg_golden():
    """Run the slim vgg_16 conv1..conv4_3 architecture (3x3 SAME conv + bias
    + ReLU, 2x2 max-pool; /root/reference/vgg.py:125-150) through TF's own
    conv/pool kernels on seeded weights. The weights are regenerated from
    the seed at test time (tests/fixture_params.py) so only the input image
    and the conv4_3 activation are committed."""
    sys.path.insert(0, os.path.dirname(__file__))
    from fixture_params import seeded_vgg_image, seeded_vgg_params

    from_repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, from_repo)
    from ntm_tracker_tpu.models.vgg import VGG16_PREFIX

    params = seeded_vgg_params(VGG16_PREFIX)
    image = seeded_vgg_image()
    with tf.Graph().as_default(), tf.Session() as sess:
        x = tf.constant(image)
        for name, _out_ch, has_pool in VGG16_PREFIX:
            p = params[name]
            x = tf.nn.relu(
                tf.nn.conv2d(x, tf.constant(p["weights"]), [1, 1, 1, 1], "SAME")
                + tf.constant(p["biases"])
            )
            if name == "conv4/conv4_3":
                break  # endpoint is the ReLU, before its pool
            if has_pool:
                x = tf.nn.max_pool2d(x, 2, 2, "VALID")
        conv43 = sess.run(x)
    print(f"  vgg conv4_3 golden: shape {conv43.shape}, "
          f"|act| max {np.abs(conv43).max():.3f}")
    return {"vgg_image": image, "vgg_conv43": conv43}


# ---------------------------------------------------------------------------
# section E: the reference NTM cell, executed over a streaming rollout
# ---------------------------------------------------------------------------

def gen_cell_rollout(
    *, seed, batch, steps, input_size, mem_size, mem_dim, shift_range,
    hidden, num_layers, read_heads, write_heads, write_first,
):
    """Build the reference NTMCell one-step graph (state_placeholder
    contract, ntm_cell.py:255-282), inject seeded parameters, and roll it
    `steps` times feeding the state dict back through placeholders — exactly
    the reference's streaming inference structure (test_tracker.py:284-299).
    """
    # register under the bare names so the reference's `from ops import ...`
    # (ntm_cell.py:15) resolves to the patched modules
    _load_reference_stack()
    ref_cell_mod = _load_patched_module(
        "ntm_cell.py",
        "_ref_ntm_cell",
        extra_globals={
            "_SHIM_MultiRNNCell": _ShimMultiRNNCell,
            "_SHIM_BasicLSTMCell": _ShimBasicLSTMCell,
        },
    )

    rs = np.random.RandomState(seed)
    num_heads = read_heads + write_heads
    shift_space = 2 * shift_range + 1
    total_head = (
        mem_dim * num_heads + 3 * num_heads + shift_space * num_heads
        + 2 * mem_dim * write_heads
    )

    def u(shape, scale):
        return rs.uniform(-scale, scale, shape).astype(np.float32)

    # parameter values keyed by the JAX pytree layout (models/ntm_cell.py)
    params = {
        "out_w": u((hidden, 2), 0.3),
        "out_b": u((2,), 0.1),
        "heads_w": u((hidden, total_head), 0.3),
        "heads_b": u((total_head,), 0.1),
        "init_M": u((mem_size, mem_dim), 0.5),
        "init_w": u((num_heads, mem_size), 0.5),
        "init_read": u((read_heads, mem_dim), 0.5),
    }
    in_dim = input_size + read_heads * mem_dim
    for layer in range(num_layers):
        d = in_dim if layer == 0 else hidden
        params[f"ctrl_kernel_{layer}"] = u((d + hidden, 4 * hidden), 0.25)
        params[f"ctrl_bias_{layer}"] = u((4 * hidden,), 0.05)

    inputs = rs.uniform(-1, 1, (steps, batch, input_size)).astype(np.float32)

    with tf.Graph().as_default() as g, tf.Session() as sess:
        cell = ref_cell_mod.NTMCell(
            output_dim=2, mem_size=mem_size, mem_dim=mem_dim,
            shift_range=shift_range, controller_hidden_size=hidden,
            controller_num_layers=num_layers, write_head_size=write_heads,
            read_head_size=read_heads, write_first=write_first,
        )
        state_ph = cell.state_placeholder(batch)
        x_ph = tf.placeholder(tf.float32, [batch, input_size], name="x")
        (_out, logit, state, debug, _M, _w, _read, _cs) = cell(x_ph, state_ph)

        # map graph variables <- seeded parameter values
        name_map = {
            "ntm-cell/addressing/weights": "heads_w",
            "ntm-cell/addressing/biases": "heads_b",
            "ntm-cell/weights": "out_w",
            "ntm-cell/biases": "out_b",
        }
        for layer in range(num_layers):
            prefix = f"ntm-cell/lstm-controller/cell_{layer}/basic_lstm_cell/"
            name_map[prefix + "kernel"] = f"ctrl_kernel_{layer}"
            name_map[prefix + "bias"] = f"ctrl_bias_{layer}"
        gvars = {v.op.name: v for v in tf.global_variables()}
        assert set(gvars) == set(name_map), (sorted(gvars), sorted(name_map))
        for vname, pkey in name_map.items():
            assert tuple(gvars[vname].shape.as_list()) == params[pkey].shape, (
                vname, gvars[vname].shape, params[pkey].shape)
            gvars[vname].load(params[pkey], sess)

        # learnable-initial-state squash (ntm_cell.py:292-308)
        cur = {
            "M": np.broadcast_to(np.tanh(params["init_M"]), (batch, mem_size, mem_dim)),
            "w": np.broadcast_to(
                1.0 / (1.0 + np.exp(-params["init_w"])), (batch, num_heads, mem_size)
            ),
            "read": np.broadcast_to(np.tanh(params["init_read"]), (batch, read_heads, mem_dim)),
            "controller_state": np.zeros((batch, 2 * hidden * num_layers), np.float32),
        }
        logits, ckpt_states, dbg0 = [], [], None
        ckpt_at = sorted({0, steps // 2, steps - 1})
        for t in range(steps):
            feeds = {x_ph: inputs[t]}
            for k in cur:
                feeds[state_ph[k]] = cur[k]
            lg, st, dbg = sess.run([logit, state, debug], feeds)
            logits.append(lg)
            cur = st
            if t == 0:
                dbg0 = dbg
            if t in ckpt_at:
                ckpt_states.append(st)

    out = {
        "inputs": inputs,
        "logits": np.stack(logits),
        "ckpt_steps": np.array(ckpt_at, np.int64),
        "config": np.array(
            [batch, steps, input_size, mem_size, mem_dim, shift_range,
             hidden, num_layers, read_heads, write_heads, int(write_first)],
            np.int64,
        ),
    }
    for key, val in params.items():
        out["param_" + key] = val
    for i, st in enumerate(ckpt_states):
        for k in ("M", "w", "read", "controller_state"):
            out[f"state{i}_{k}"] = st[k]
    for k in ("similarity", "w_content_focused", "w_gated", "w_conv", "w"):
        out["dbg0_" + k] = dbg0[k]
    return out


def _make_sonnet_stub():
    """Minimal sonnet stand-in for executing the reference's dnc/addressing
    (sonnet is not installed; the reference only needs AbstractModule /
    RNNCore as variable-scope wrappers and BatchApply over tf.nn.softmax —
    none of the addressing modules create variables)."""

    class _Module:
        def __init__(self, name="module", *args, **kwargs):
            self._name = kwargs.get("name", name)

        def _enter_variable_scope(self):
            # sonnet modules build submodules inside their own scope
            return tf.variable_scope(self._name, reuse=tf.AUTO_REUSE)

        def initial_state(self, batch_size, dtype=tf.float32):
            # snt.RNNCore default: zeros shaped by state_size
            return tf.nest.map_structure(
                lambda s: tf.zeros(
                    [batch_size] + tf.TensorShape(s).as_list(), dtype
                ),
                self.state_size,
            )

        def __call__(self, *args, **kwargs):
            # sonnet modules are templates: variables are shared across
            # calls, so pin the exact scope name and AUTO_REUSE
            with tf.variable_scope(self._name, reuse=tf.AUTO_REUSE):
                return self._build(*args, **kwargs)

    class _BatchApply:
        def __init__(self, module_or_op):
            self._op = module_or_op

        def __call__(self, x):
            shape = x.get_shape().as_list()
            merged = tf.reshape(x, [-1] + shape[2:])
            return tf.reshape(self._op(merged), [-1] + shape[1:])

    class _Linear:
        """sonnet-v1 snt.Linear: xw+b with variables 'w'/'b' in a scope
        named after the module."""

        def __init__(self, output_size, name="linear"):
            self._output_size = output_size
            self._name = name

        def __call__(self, x):
            with tf.variable_scope(self._name, reuse=tf.AUTO_REUSE):
                in_dim = int(x.shape[-1])
                w = tf.get_variable("w", [in_dim, self._output_size])
                b = tf.get_variable(
                    "b", [self._output_size], initializer=tf.zeros_initializer()
                )
                return tf.matmul(x, w) + b

    snt = types.ModuleType("sonnet")
    snt.AbstractModule = _Module
    snt.RNNCore = _Module
    snt.BatchApply = _BatchApply
    snt.Linear = _Linear
    sys.modules["sonnet"] = snt
    return snt


def gen_dnc_addressing_goldens():
    """Execute the reference's DNC addressing math (dnc/addressing.py:
    cosine weights with the 1e-6 epsilons, temporal linkage, directional
    reads, stop-gradient usage, sorted allocation) on seeded inputs."""
    _make_sonnet_stub()
    util_mod = _load_patched_module("dnc/util.py", "_dnc_util")
    addr = _load_patched_module(
        "dnc/addressing.py", "_dnc_addressing",
        extra_globals={"util": util_mod},
        extra_patches=[("from . import util", "")],
    )

    rs = np.random.RandomState(9)
    B, N, W, R, Wh = 2, 12, 6, 3, 2

    def simplex(shape):
        x = rs.rand(*shape).astype(np.float32)
        return x / x.sum(-1, keepdims=True)

    out = {}
    memory = rs.uniform(-1, 1, (B, N, W)).astype(np.float32)
    keys = rs.uniform(-1, 1, (B, R, W)).astype(np.float32)
    strengths = rs.uniform(-1, 2, (B, R)).astype(np.float32)
    write_w = simplex((B, Wh, N)) * 0.8
    read_w = simplex((B, R, N))
    prev_prec = simplex((B, Wh, N)) * 0.5
    prev_link = (rs.rand(B, Wh, N, N) * 0.1).astype(np.float32)
    prev_link *= 1.0 - np.eye(N, dtype=np.float32)
    free_gate = rs.rand(B, R).astype(np.float32)
    prev_usage = rs.rand(B, N).astype(np.float32)
    write_gates = rs.rand(B, Wh).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        cw = addr.CosineWeights(R, W)(
            tf.constant(memory), tf.constant(keys), tf.constant(strengths)
        )
        linkage = addr.TemporalLinkage(N, Wh)
        next_state = linkage(
            tf.constant(write_w),
            addr.TemporalLinkageState(
                link=tf.constant(prev_link),
                precedence_weights=tf.constant(prev_prec),
            ),
        )
        fwd = linkage.directional_read_weights(
            next_state.link, tf.constant(read_w), forward=True
        )
        bwd = linkage.directional_read_weights(
            next_state.link, tf.constant(read_w), forward=False
        )
        freeness = addr.Freeness(N)
        usage = freeness(
            tf.constant(write_w), tf.constant(free_gate),
            tf.constant(read_w), tf.constant(prev_usage),
        )
        alloc = freeness.write_allocation_weights(
            tf.constant(prev_usage), tf.constant(write_gates), Wh
        )
        (out["dnc_cw"], link_v, prec_v, out["dnc_fwd"], out["dnc_bwd"],
         out["dnc_usage"], out["dnc_alloc"]) = sess.run(
            [cw, next_state.link, next_state.precedence_weights, fwd, bwd,
             usage, alloc]
        )
    out.update(
        dnc_memory=memory, dnc_keys=keys, dnc_strengths=strengths,
        dnc_write_w=write_w, dnc_read_w=read_w, dnc_prev_prec=prev_prec,
        dnc_prev_link=prev_link, dnc_free_gate=free_gate,
        dnc_prev_usage=prev_usage, dnc_write_gates=write_gates,
        dnc_link=link_v, dnc_prec=prec_v,
    )
    return out


def gen_dnc_access_goldens():
    """Execute the reference's FULL MemoryAccess module (dnc/access.py:
    66-158) for several sequential steps from the zero state, with its ten
    interface linears injected — the complete DNC memory subsystem as the
    reference wrote it (usage -> write weights -> erase/write -> linkage ->
    read weights -> read words)."""
    _make_sonnet_stub()
    util_mod = _load_patched_module("dnc/util.py", "_dnc_util")
    addr = _load_patched_module(
        "dnc/addressing.py", "_dnc_addressing",
        extra_globals={"util": util_mod},
        extra_patches=[("from . import util", "")],
    )
    access = _load_patched_module(
        "dnc/access.py", "_dnc_access",
        extra_globals={"addressing": addr, "util": util_mod},
        extra_patches=[("from . import addressing", ""),
                       ("from . import util", "")],
    )

    rs = np.random.RandomState(10)
    B, N, W, R, Wh, IN, T = 2, 12, 6, 3, 2, 15, 3

    # the ten interface linears, in the reference's creation order with
    # their snt.Linear names (access.py:160-218)
    linear_sizes = {
        "write_vectors": Wh * W,
        "erase_vectors": Wh * W,
        "free_gate": R,
        "allocation_gate": Wh,
        "write_gate": Wh,
        "read_mode": R * (1 + 2 * Wh),
        "write_keys": Wh * W,
        "write_strengths": Wh,
        "read_keys": R * W,
        "read_strengths": R,
    }
    lin = {
        name: (
            rs.uniform(-0.4, 0.4, (IN, size)).astype(np.float32),
            rs.uniform(-0.1, 0.1, (size,)).astype(np.float32),
        )
        for name, size in linear_sizes.items()
    }
    inputs = rs.uniform(-1, 1, (T, B, IN)).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        mod = access.MemoryAccess(
            memory_size=N, word_size=W, num_reads=R, num_writes=Wh
        )
        state = access.AccessState(
            memory=tf.zeros([B, N, W]),
            read_weights=tf.zeros([B, R, N]),
            write_weights=tf.zeros([B, Wh, N]),
            linkage=addr.TemporalLinkageState(
                link=tf.zeros([B, Wh, N, N]),
                precedence_weights=tf.zeros([B, Wh, N]),
            ),
            usage=tf.zeros([B, N]),
        )
        reads = []
        for t in range(T):
            read_words, state = mod(tf.constant(inputs[t]), state)
            reads.append(read_words)

        sess.run(tf.global_variables_initializer())
        gvars = {v.op.name: v for v in tf.global_variables()}
        expected = {
            f"memory_access/{name}/{s}" for name in linear_sizes
            for s in ("w", "b")
        }
        assert set(gvars) == expected, (sorted(gvars), sorted(expected))
        for name in linear_sizes:
            gvars[f"memory_access/{name}/w"].load(lin[name][0], sess)
            gvars[f"memory_access/{name}/b"].load(lin[name][1], sess)
        reads_v, final = sess.run([reads, state])

    out = {
        "dncacc_inputs": inputs,
        "dncacc_reads": np.stack(reads_v),
        "dncacc_final_memory": final.memory,
        "dncacc_final_read_weights": final.read_weights,
        "dncacc_final_write_weights": final.write_weights,
        "dncacc_final_link": final.linkage.link,
        "dncacc_final_precedence": final.linkage.precedence_weights,
        "dncacc_final_usage": final.usage,
        "dncacc_config": np.array([B, N, W, R, Wh, IN, T], np.int64),
    }
    for name in linear_sizes:
        out[f"dncacc_{name}_w"] = lin[name][0]
        out[f"dncacc_{name}_b"] = lin[name][1]
    return out


def gen_dnc_core_goldens():
    """Execute the reference's FULL DNC core (dnc/dnc.py:36-142) — sonnet
    LSTM controller + MemoryAccess + output linear, with the read-word
    concat wiring (:106-107,118) and clip_value clamping (:78-82,112-113) —
    for several sequential steps from its own initial_state.

    The sonnet stub gains snt.LSTM here, written to sonnet-v1
    gated_rnn.LSTM's math: gates = [x, h_prev] @ w_gates + b_gates split
    (i, j, f, o), c' = sig(f + forget_bias=1)*c + sig(i)*tanh(j),
    h' = tanh(c')*sig(o) — the same BasicLSTMCell lineage the generator
    cross-checks against tf.raw_ops.LSTMBlockCell elsewhere."""
    snt = _make_sonnet_stub()

    import collections

    # sonnet v1 LSTMState(hidden, cell); a namedtuple so tf.nest can
    # reconstruct it
    _LSTMState = collections.namedtuple("LSTMState", ("hidden", "cell"))

    class _LSTM:
        def __init__(self, hidden_size, name="lstm", **_kw):
            self._hidden_size = hidden_size
            self._name = name

        def __call__(self, inputs, prev_state):
            with tf.variable_scope(self._name, reuse=tf.AUTO_REUSE):
                prev_hidden, prev_cell = prev_state
                in_dim = int(inputs.shape[1])
                w = tf.get_variable(
                    "w_gates", [in_dim + self._hidden_size, 4 * self._hidden_size]
                )
                b = tf.get_variable(
                    "b_gates", [4 * self._hidden_size],
                    initializer=tf.zeros_initializer(),
                )
                gates = tf.matmul(tf.concat([inputs, prev_hidden], 1), w) + b
                i, j, f, o = tf.split(gates, 4, axis=1)
                next_cell = (
                    tf.sigmoid(f + 1.0) * prev_cell + tf.sigmoid(i) * tf.tanh(j)
                )
                next_hidden = tf.tanh(next_cell) * tf.sigmoid(o)
                return next_hidden, _LSTMState(next_hidden, next_cell)

        @property
        def state_size(self):
            return _LSTMState(
                tf.TensorShape([self._hidden_size]),
                tf.TensorShape([self._hidden_size]),
            )

        def initial_state(self, batch_size, dtype=tf.float32):
            z = tf.zeros([batch_size, self._hidden_size], dtype)
            return _LSTMState(z, z)

    class _BatchFlatten:
        def __call__(self, x):
            return tf.reshape(x, [tf.shape(x)[0], -1])

    snt.LSTM = _LSTM
    snt.BatchFlatten = _BatchFlatten
    snt.nest = types.SimpleNamespace(map=tf.nest.map_structure)

    util_mod = _load_patched_module("dnc/util.py", "_dnc_util2")
    addr = _load_patched_module(
        "dnc/addressing.py", "_dnc_addressing2",
        extra_globals={"util": util_mod},
        extra_patches=[("from . import util", "")],
    )
    access = _load_patched_module(
        "dnc/access.py", "_dnc_access2",
        extra_globals={"addressing": addr, "util": util_mod},
        extra_patches=[("from . import addressing", ""),
                       ("from . import util", "")],
    )
    dnc_mod = _load_patched_module(
        "dnc/dnc.py", "_dnc_core",
        extra_globals={"access": access},
        extra_patches=[("from . import access", "")],
    )

    rs = np.random.RandomState(11)
    B, N, W, R, Wh, IN, HID, OUT, T = 2, 12, 6, 3, 2, 9, 16, 5, 4
    CLIP = 20.0
    inputs = rs.uniform(-1, 1, (T, B, IN)).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        core = dnc_mod.DNC(
            access_config=dict(
                memory_size=N, word_size=W, num_reads=R, num_writes=Wh
            ),
            controller_config=dict(hidden_size=HID),
            output_size=OUT,
            clip_value=CLIP,
        )
        state = core.initial_state(B)
        outs = []
        for t in range(T):
            out_t, state = core(tf.constant(inputs[t]), state)
            outs.append(out_t)

        sess.run(tf.global_variables_initializer())
        gvars = {v.op.name: v for v in tf.global_variables()}
        injected = {}
        for name, v in gvars.items():
            arr = rs.uniform(-0.3, 0.3, v.shape.as_list()).astype(np.float32)
            v.load(arr, sess)
            # strip the scope nesting: keep "<module>/<var>" (e.g.
            # "write_vectors/w", "lstm/w_gates", "output_linear/b")
            injected["/".join(name.split("/")[-2:])] = arr
        outs_v, final = sess.run([outs, state])

    out = {
        "dnccore_inputs": inputs,
        "dnccore_outputs": np.stack(outs_v),
        "dnccore_final_access_output": final.access_output,
        "dnccore_final_memory": final.access_state.memory,
        "dnccore_final_read_weights": final.access_state.read_weights,
        "dnccore_final_write_weights": final.access_state.write_weights,
        "dnccore_final_link": final.access_state.linkage.link,
        "dnccore_final_precedence": final.access_state.linkage.precedence_weights,
        "dnccore_final_usage": final.access_state.usage,
        "dnccore_final_ctrl_hidden": final.controller_state[0],
        "dnccore_final_ctrl_cell": final.controller_state[1],
        "dnccore_config": np.array([B, N, W, R, Wh, IN, HID, OUT, T], np.int64),
        "dnccore_clip": np.array(CLIP, np.float32),
    }
    for name, arr in injected.items():
        out[f"dnccore_var_{name.replace('/', '__')}"] = arr
    return out


def gen_dnc_ckpt_convert_fixture():
    """Saver round trip of the reference DNC training core (the oracle for
    tools/convert_dnc_ckpt.py): build dnc.DNC exactly as the training entry
    does (direct_offset_output_with_dnc.py:66-88) with the stubbed-sonnet
    modules, randomize every variable, save with a REAL tf.train.Saver,
    re-read via load_checkpoint, and record an executed rollout.

    The stub reproduces sonnet-v1's variable naming for this graph
    (dnc/lstm/w_gates, dnc/memory_access/<head>/w|b, dnc/output_linear/w|b)
    — asserted exactly below, so the fixture's names ARE the names a real
    reference checkpoint carries."""
    import tempfile

    # rebuild the full stub stack exactly as gen_dnc_core_goldens does
    # (fresh module registrations; safe to run after it in the same process)
    core_fixture_mod_names = [
        "_dnc_util3", "_dnc_addressing3", "_dnc_access3", "_dnc_core3",
    ]
    snt = _make_sonnet_stub()

    import collections

    _LSTMState = collections.namedtuple("LSTMState", ("hidden", "cell"))

    class _LSTM:
        def __init__(self, hidden_size, name="lstm", **_kw):
            self._hidden_size = hidden_size
            self._name = name

        def __call__(self, inputs, prev_state):
            with tf.variable_scope(self._name, reuse=tf.AUTO_REUSE):
                prev_hidden, prev_cell = prev_state
                in_dim = int(inputs.shape[1])
                w = tf.get_variable(
                    "w_gates",
                    [in_dim + self._hidden_size, 4 * self._hidden_size],
                )
                b = tf.get_variable(
                    "b_gates", [4 * self._hidden_size],
                    initializer=tf.zeros_initializer(),
                )
                gates = tf.matmul(tf.concat([inputs, prev_hidden], 1), w) + b
                i, j, f, o = tf.split(gates, 4, axis=1)
                next_cell = (
                    tf.sigmoid(f + 1.0) * prev_cell + tf.sigmoid(i) * tf.tanh(j)
                )
                next_hidden = tf.tanh(next_cell) * tf.sigmoid(o)
                return next_hidden, _LSTMState(next_hidden, next_cell)

        @property
        def state_size(self):
            return _LSTMState(
                tf.TensorShape([self._hidden_size]),
                tf.TensorShape([self._hidden_size]),
            )

        def initial_state(self, batch_size, dtype=tf.float32):
            z = tf.zeros([batch_size, self._hidden_size], dtype)
            return _LSTMState(z, z)

    class _BatchFlatten:
        def __call__(self, x):
            return tf.reshape(x, [tf.shape(x)[0], -1])

    snt.LSTM = _LSTM
    snt.BatchFlatten = _BatchFlatten
    snt.nest = types.SimpleNamespace(map=tf.nest.map_structure)

    util_mod = _load_patched_module("dnc/util.py", core_fixture_mod_names[0])
    addr = _load_patched_module(
        "dnc/addressing.py", core_fixture_mod_names[1],
        extra_globals={"util": util_mod},
        extra_patches=[("from . import util", "")],
    )
    access = _load_patched_module(
        "dnc/access.py", core_fixture_mod_names[2],
        extra_globals={"addressing": addr, "util": util_mod},
        extra_patches=[("from . import addressing", ""),
                       ("from . import util", "")],
    )
    dnc_mod = _load_patched_module(
        "dnc/dnc.py", core_fixture_mod_names[3],
        extra_globals={"access": access},
        extra_patches=[("from . import access", "")],
    )

    rs = np.random.RandomState(29)
    B, N, W, R, Wh, IN, HID, OUT, T = 2, 16, 6, 3, 1, 11, 14, 2, 5
    CLIP = 20.0
    inputs = rs.uniform(-1, 1, (T, B, IN)).astype(np.float32)

    from ntm_tracker_tpu.models.dnc.access import _interface_sizes
    from ntm_tracker_tpu.config import DNCConfig

    sizes = _interface_sizes(DNCConfig(
        output_dim=OUT, memory_size=N, word_size=W, num_reads=R,
        num_writes=Wh, hidden_size=HID,
    ))

    with tf.Graph().as_default(), tf.Session() as sess:
        core = dnc_mod.DNC(
            access_config=dict(
                memory_size=N, word_size=W, num_reads=R, num_writes=Wh
            ),
            controller_config=dict(hidden_size=HID),
            output_size=OUT,
            clip_value=CLIP,
        )
        state = core.initial_state(B)
        outs = []
        for t in range(T):
            out_t, state = core(tf.constant(inputs[t]), state)
            outs.append(out_t)

        sess.run(tf.global_variables_initializer())
        gvars = {v.op.name: v for v in tf.global_variables()}
        expected = (
            {"dnc/lstm/w_gates", "dnc/lstm/b_gates",
             "dnc/output_linear/w", "dnc/output_linear/b"}
            | {f"dnc/memory_access/{head}/{s}"
               for head in sizes for s in ("w", "b")}
        )
        assert set(gvars) == expected, (sorted(gvars), sorted(expected))
        for v in gvars.values():
            v.load(
                rs.uniform(-0.3, 0.3, v.shape.as_list()).astype(np.float32),
                sess,
            )
        outs_v = sess.run(outs)

        tmp = tempfile.mkdtemp(prefix="ref_dnc_ckpt_")
        save_path = tf.train.Saver().save(sess, os.path.join(tmp, "model.ckpt"))

    reader = tf.train.load_checkpoint(save_path)
    names = sorted(reader.get_variable_to_shape_map())
    out = {
        "dncckpt_config": np.array(
            [B, N, W, R, Wh, IN, HID, OUT, T], np.int64,
        ),
        "dncckpt_clip": np.array(CLIP, np.float32),
        "dncckpt_inputs": inputs,
        "dncckpt_outputs": np.stack(outs_v),
        "dncckpt_names": np.array(names, np.str_),
    }
    for i, n in enumerate(names):
        out[f"dncckpt_var_{i}"] = reader.get_tensor(n)
    return out


def gen_tracker_rollout(*, seed, two_step, batch, frames, input_size,
                        target_size, mem_size, mem_dim, hidden, read_heads):
    """Execute the reference's tracker WRAPPER (ntm_tracker_new.NTMTracker,
    :106-201): its zero_state initial state and its inline token
    construction — [switch|frame|target] two-step present/ask pairs, or
    [frame|indicator] single tokens — wrapped around the NTM cell.

    Reference bug worked around (NOT a semantic change): NTMTracker unpacks
    4 values from the cell (`output, logit, state, debug = self.cell(...)`,
    ntm_tracker_new.py:156,184) but the current ntm_cell returns 8
    (ntm_cell.py:252-253) — the class predates the cell's signature and
    cannot run as written, more evidence this path was dead upstream. The
    adapter below truncates the tuple; every returned value is computed by
    the reference's own graph."""
    _load_reference_stack()
    ref_cell = _load_patched_module(
        "ntm_cell.py", "ntm_cell",
        extra_globals={
            "_SHIM_MultiRNNCell": _ShimMultiRNNCell,
            "_SHIM_BasicLSTMCell": _ShimBasicLSTMCell,
        },
    )
    del ref_cell
    _load_patched_module("utility.py", "utility")
    ref_trk = _load_patched_module("ntm_tracker_new.py", "_ref_tracker")

    rs = np.random.RandomState(seed)
    num_heads = read_heads + 1
    total_head = mem_dim * num_heads + 3 * num_heads + 3 * num_heads + 2 * mem_dim

    def u(shape, scale):
        return rs.uniform(-scale, scale, shape).astype(np.float32)

    cell_in = (1 + input_size + target_size) if two_step else (
        input_size + target_size
    )
    ctrl_in = cell_in + read_heads * mem_dim
    params = {
        "ctrl_kernel_0": u((ctrl_in + hidden, 4 * hidden), 0.25),
        "ctrl_bias_0": u((4 * hidden,), 0.05),
        "heads_w": u((hidden, total_head), 0.3),
        "heads_b": u((total_head,), 0.1),
        "out_w": u((hidden, 2), 0.3),
        "out_b": u((2,), 0.1),
        "init_M": u((mem_size, mem_dim), 0.5),
        "init_w": u((num_heads, mem_size), 0.5),
        "init_read": u((read_heads, mem_dim), 0.5),
    }
    inputs = rs.uniform(-1, 1, (batch, frames, input_size)).astype(np.float32)
    target = rs.uniform(-1, 1, (batch, target_size)).astype(np.float32)

    class _CellAdapter:
        def __init__(self, cell):
            self._cell = cell

        def zero_state(self, b, initializer=None):
            return self._cell.zero_state(b, initializer)

        def __call__(self, x, state):
            return self._cell(x, state)[:4]

    with tf.Graph().as_default(), tf.Session() as sess:
        tracker = ref_trk.NTMTracker(
            frames, batch, 2, two_step=two_step, mem_size=mem_size,
            mem_dim=mem_dim, controller_hidden_size=hidden,
            controller_num_layers=1, read_head_size=read_heads,
            write_head_size=1, shift_range=1,
        )
        tracker.cell = _CellAdapter(tracker.cell)
        outputs_t, logits_t, *_ = tracker(
            tf.constant(inputs), tf.constant(target)
        )
        name_map = {
            "ntm-tracker/ntm-cell/addressing/weights": "heads_w",
            "ntm-tracker/ntm-cell/addressing/biases": "heads_b",
            "ntm-tracker/ntm-cell/weights": "out_w",
            "ntm-tracker/ntm-cell/biases": "out_b",
            "ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/kernel": "ctrl_kernel_0",
            "ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/bias": "ctrl_bias_0",
            # zero_state runs OUTSIDE the tracker scope (ntm_tracker_new.py:133)
            "init_state/M": "init_M",
            "init_state/w": "init_w",
            "init_state/read": "init_read",
        }
        sess.run(tf.global_variables_initializer())
        gvars = {v.op.name: v for v in tf.global_variables()}
        assert set(gvars) == set(name_map), (sorted(gvars), sorted(name_map))
        for vname, pkey in name_map.items():
            gvars[vname].load(params[pkey], sess)
        outputs, logits = sess.run([outputs_t, logits_t])

    out = {
        "inputs": inputs,
        "target": target,
        "outputs": outputs,
        "logits": logits,
        "config": np.array(
            [int(two_step), batch, frames, input_size, target_size, mem_size,
             mem_dim, hidden, read_heads], np.int64,
        ),
    }
    for key, val in params.items():
        out["param_" + key] = val
    return out


# ---------------------------------------------------------------------------
# section F: the reference's LEGACY ntm.py model, executed end-to-end
# ---------------------------------------------------------------------------

def gen_legacy_rollout(
    *, seed, steps, input_size, num_features, mem_size, mem_dim, shift_range,
    controller_dim, layers, read_heads, write_heads,
):
    """Build the reference's legacy NTMTracker graph (ntm.py:41-111) with
    injected parameters and run its unrolled sequence — the model no entry
    point of the reference ever reached."""
    import functools

    _load_reference_stack()
    ref_ntm = _load_patched_module(
        "ntm.py", "_ref_ntm",
        extra_globals={"reduce": functools.reduce},
    )

    rs = np.random.RandomState(seed)
    S = 2 * shift_range + 1
    C, D, N = controller_dim, mem_dim, mem_size

    def u(shape, scale=0.4):
        return rs.uniform(-scale, scale, shape).astype(np.float32)

    # JAX-layout params (models/legacy_ntm.py pytree)
    params = {"out_w": u((C, num_features)), "out_b": u((num_features,), 0.1)}
    for layer in range(layers):
        in_l = (input_size + num_features + C + read_heads * D) if layer == 0 else 2 * C
        for gate in ("input", "forget", "output", "update"):
            params[f"ctrl_{layer}_{gate}_w"] = u((in_l, C))
            params[f"ctrl_{layer}_{gate}_b"] = u((C,), 0.1)
    head_parts = ["k", "g", "sw", "beta", "gamma"]
    head_shapes = {"k": (C, D), "g": (C, 1), "sw": (C, S), "beta": (C, 1),
                   "gamma": (C, 1), "erase": (C, D), "add": (C, D)}
    for r in range(read_heads):
        for part in head_parts:
            params[f"read{r}_{part}_w"] = u(head_shapes[part])
            params[f"read{r}_{part}_b"] = u((head_shapes[part][1],), 0.1)
    for w in range(write_heads):
        for part in head_parts + ["erase", "add"]:
            params[f"write{w}_{part}_w"] = u(head_shapes[part])
            params[f"write{w}_{part}_b"] = u((head_shapes[part][1],), 0.1)
    # raw initial-state biases (ntm.py:273-332; value = bias since dummy=0)
    params["init_M"] = u((N * D,))
    params["init_read_w"] = u((read_heads, N), 1.5)
    params["init_read"] = u((read_heads, D))
    params["init_write_w"] = u((write_heads, N), 1.5)
    params["init_output"] = u((layers, C))
    params["init_hidden"] = u((layers, C))

    inputs = rs.uniform(-1, 1, (steps, input_size)).astype(np.float32)
    target = rs.uniform(-1, 1, (num_features,)).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        tracker = ref_ntm.NTMTracker(
            max_sequence_length=steps, mem_size=N, mem_dim=D,
            shift_range=shift_range, controller_dim=C,
            controller_layer_size=layers, write_head_size=write_heads,
            read_head_size=read_heads,
        )
        outputs_t, logits_t, states = tracker(
            tf.constant(inputs), tf.constant(target)
        )

        # graph-variable name -> param key (names are deterministic:
        # ops.linear uses Matrix/Bias in the gate scope; ops.Linear uses
        # <name>_w/_b inside a 'Linear' subscope)
        name_map = {}
        for layer in range(layers):
            for gate in ("input", "forget", "output", "update"):
                prefix = f"ntm/controller/{gate}_gate_{layer}/"
                name_map[prefix + "Matrix"] = f"ctrl_{layer}_{gate}_w"
                name_map[prefix + "Bias"] = f"ctrl_{layer}_{gate}_b"
        scope_of = {"k": "k", "g": "g", "sw": "s_w", "beta": "beta",
                    "gamma": "gamma"}
        for r in range(read_heads):
            for part in head_parts:
                base = f"ntm/memory/read/{scope_of[part]}/Linear/{scope_of[part]}_{r}"
                name_map[base + "_w"] = f"read{r}_{part}_w"
                name_map[base + "_b"] = f"read{r}_{part}_b"
        for w in range(write_heads):
            for part in head_parts:
                base = f"ntm/memory/write/{scope_of[part]}/Linear/{scope_of[part]}_{w}"
                name_map[base + "_w"] = f"write{w}_{part}_w"
                name_map[base + "_b"] = f"write{w}_{part}_b"
            for part in ("erase", "add"):
                base = f"ntm/memory/write/Linear/{part}_{w}"
                name_map[base + "_w"] = f"write{w}_{part}_w"
                name_map[base + "_b"] = f"write{w}_{part}_b"
        name_map["ntm/output/Linear/output_w"] = "out_w"
        name_map["ntm/output/Linear/output_b"] = "out_b"
        # init-state: only the biases matter (Linear input is the zero dummy)
        name_map["ntm/init_cell/Linear/M_init_linear_b"] = "init_M"
        for r in range(read_heads):
            name_map[f"ntm/init_cell/Linear/read_w_{r}_b"] = ("init_read_w", r)
            name_map[f"ntm/init_cell/Linear/read_init_{r}_b"] = ("init_read", r)
        for w in range(write_heads):
            name_map[f"ntm/init_cell/Linear/write_w_{w}_b"] = ("init_write_w", w)
        for layer in range(layers):
            name_map[f"ntm/init_cell/Linear/output_init_{layer}_b"] = ("init_output", layer)
            name_map[f"ntm/init_cell/Linear/hidden_init_{layer}_b"] = ("init_hidden", layer)

        sess.run(tf.global_variables_initializer())
        gvars = {v.op.name: v for v in tf.global_variables()}
        unmapped = set(name_map) - set(gvars)
        assert not unmapped, sorted(unmapped)
        # the ONLY unseeded variables may be deterministic init_cell
        # artifacts: the dummy-input weights (zero input -> no effect), the
        # dummy constant Variable itself, and the zero-initialized
        # new_output bias (ntm.py:278,318 — constant initializers, so the
        # golden stays reproducible); anything else unseeded would make the
        # golden depend on random initialization
        extra = set(gvars) - set(name_map)
        bad = [
            n for n in extra
            if not (
                (n.startswith("ntm/init_cell/Linear/") and n.endswith("_w"))
                or n == "ntm/init_cell/Variable"
                or n == "ntm/init_cell/Linear/new_output_b"
            )
        ]
        assert not bad, f"unseeded non-deterministic variables: {sorted(bad)}"
        for vname, key in name_map.items():
            value = params[key] if isinstance(key, str) else params[key[0]][key[1]]
            assert tuple(gvars[vname].shape.as_list()) == value.shape, (
                vname, gvars[vname].shape, value.shape)
            gvars[vname].load(value, sess)

        outputs, logits, final = sess.run([outputs_t, logits_t, states[-1]])

    out = {
        "inputs": inputs,
        "target": target,
        "outputs": outputs,
        "logits": logits,
        "final_M": final["M"],
        "final_read_w": np.stack(final["read_w"]),
        "final_write_w": np.stack(final["write_w"]),
        "final_read": np.stack(final["read"]),
        "final_output": np.stack(final["output"]),
        "final_hidden": np.stack(final["hidden"]),
        "config": np.array(
            [steps, input_size, num_features, mem_size, mem_dim, shift_range,
             controller_dim, layers, read_heads, write_heads], np.int64,
        ),
    }
    for key, val in params.items():
        out["param_" + key] = val
    return out


def gen_mining_golden():
    """Execute the reference's pure-Python gen_sequences
    (sequence_generator.py:76-154) on the seeded synthetic statistics and
    pickle its output. The module's import-time TF graph construction
    (feature_matcher.get_vgg_sizes) is stubbed out; gen_sequences itself is
    untouched."""
    import pickle

    sys.path.insert(0, os.path.dirname(__file__))
    from fixture_params import seeded_mining_stats

    ref_sg = _load_patched_module(
        "sequence_generator.py", "_ref_seqgen",
        extra_globals={"matches": None, "get_seq_statistics": None},
        extra_patches=[
            ("from ilsvrc_visualizer import get_statistics as get_seq_statistics", ""),
            ("from feature_matcher import matches, get_vgg_sizes", ""),
            ("VGG_sizes, size_list = get_vgg_sizes()", "VGG_sizes, size_list = None, []"),
        ],
    )
    seqs = ref_sg.gen_sequences(seeded_mining_stats(), 0.5)
    path = os.path.join(FIXTURE_DIR, "ref_gen_sequences.pkl")
    with open(path, "wb") as f:
        pickle.dump(seqs, f)
    print(f"  wrote ref_gen_sequences.pkl ({len(seqs)} sequences)")


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    print("executing reference gen_sequences (pure python) ...")
    gen_mining_golden()

    print("generating op-level goldens ...")
    ops = gen_op_goldens()
    ops.update(gen_vgg_golden())
    print("executing reference DNC addressing (stubbed sonnet) ...")
    ops.update(gen_dnc_addressing_goldens())
    print("executing reference DNC MemoryAccess (stubbed sonnet) ...")
    ops.update(gen_dnc_access_goldens())
    print("executing reference repeat-copy cost (all variants) ...")
    ops.update(gen_repeat_copy_cost_goldens())
    np.savez_compressed(os.path.join(FIXTURE_DIR, "tf_goldens_ops.npz"), **ops)
    print(f"  wrote tf_goldens_ops.npz ({len(ops)} arrays)")

    print("executing reference DNC core (stubbed sonnet LSTM) ...")
    core = gen_dnc_core_goldens()
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_dnc_core.npz"), **core
    )
    print(f"  wrote tf_goldens_dnc_core.npz ({len(core)} arrays)")

    print("Saver round trip of the reference training graph (ckpt "
          "converter oracle) ...")
    ck = gen_ckpt_convert_fixture()
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_ckpt_convert.npz"), **ck
    )
    print(f"  wrote tf_goldens_ckpt_convert.npz ({len(ck)} arrays)")

    print("Saver round trip of the reference DNC core (convert-dnc oracle) ...")
    dck = gen_dnc_ckpt_convert_fixture()
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_dnc_ckpt_convert.npz"), **dck
    )
    print(f"  wrote tf_goldens_dnc_ckpt_convert.npz ({len(dck)} arrays)")

    print("executing reference NTM cell: flagship config, 65-step rollout ...")
    flagship = gen_cell_rollout(
        seed=1, batch=2, steps=65, input_size=30, mem_size=128, mem_dim=20,
        shift_range=1, hidden=200, num_layers=1, read_heads=4, write_heads=1,
        write_first=False,
    )
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_cell.npz"), **flagship
    )
    print("  wrote tf_goldens_cell.npz")

    print("executing reference NTM cell: variant config (write_first, "
          "shift_range=2, 2 write heads, 2 controller layers) ...")
    variant = gen_cell_rollout(
        seed=2, batch=2, steps=20, input_size=10, mem_size=32, mem_dim=8,
        shift_range=2, hidden=32, num_layers=2, read_heads=2, write_heads=2,
        write_first=True,
    )
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_cell_variant.npz"), **variant
    )
    print("  wrote tf_goldens_cell_variant.npz")

    for two_step in (False, True):
        name = "twostep" if two_step else "plain"
        print(f"executing reference NTMTracker wrapper ({name}) ...")
        roll = gen_tracker_rollout(
            seed=7 + int(two_step), two_step=two_step, batch=2, frames=4,
            input_size=6, target_size=3, mem_size=16, mem_dim=8, hidden=24,
            read_heads=2,
        )
        np.savez_compressed(
            os.path.join(FIXTURE_DIR, f"tf_goldens_tracker_{name}.npz"), **roll
        )
        print(f"  wrote tf_goldens_tracker_{name}.npz")

    print("executing reference LEGACY ntm.py tracker ...")
    legacy = gen_legacy_rollout(
        seed=5, steps=12, input_size=10, num_features=4, mem_size=16,
        mem_dim=8, shift_range=1, controller_dim=24, layers=2, read_heads=2,
        write_heads=1,
    )
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_legacy.npz"), **legacy
    )
    print("  wrote tf_goldens_legacy.npz")

    print("executing reference LEGACY ntm.py tracker (2 write heads, s=2) ...")
    legacy2 = gen_legacy_rollout(
        seed=6, steps=8, input_size=6, num_features=3, mem_size=8,
        mem_dim=4, shift_range=2, controller_dim=12, layers=1, read_heads=1,
        write_heads=2,
    )
    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "tf_goldens_legacy_variant.npz"), **legacy2
    )
    print("  wrote tf_goldens_legacy_variant.npz")


def gen_ckpt_convert_fixture():
    """Build the reference cell under the TRAINING graph's variable scoping
    (tf.variable_scope('ntm-tracker') + cell default 'ntm-cell' + zero_state
    'init_state', direct_offset_output.py:529-543), randomize every
    variable, run a real tf.train.Saver save -> load_checkpoint round trip,
    and execute a rollout — the oracle for tools/convert_ntm_ckpt.py."""
    import tempfile

    _load_reference_stack()
    ref_cell_mod = _load_patched_module(
        "ntm_cell.py", "_ref_ntm_cell_ckpt",
        extra_globals={
            "_SHIM_MultiRNNCell": _ShimMultiRNNCell,
            "_SHIM_BasicLSTMCell": _ShimBasicLSTMCell,
        },
    )
    rs = np.random.RandomState(17)
    B, steps, input_size = 2, 12, 10
    mem_size, mem_dim, hidden, L, R, W = 16, 8, 24, 2, 2, 1
    inputs = rs.uniform(-1, 1, (steps, B, input_size)).astype(np.float32)

    with tf.Graph().as_default(), tf.Session() as sess:
        with tf.variable_scope("ntm-tracker"):
            cell = ref_cell_mod.NTMCell(
                output_dim=2, mem_size=mem_size, mem_dim=mem_dim,
                shift_range=1, controller_hidden_size=hidden,
                controller_num_layers=L, read_head_size=R, write_head_size=W,
            )
            state = cell.zero_state(B)
            logits = []
            for t in range(steps):
                if t > 0:
                    tf.get_variable_scope().reuse_variables()
                (_o, logit, state, _dbg, _M, _w, _r, _cs) = cell(
                    tf.constant(inputs[t]), state
                )
                logits.append(logit)

        sess.run(tf.global_variables_initializer())
        for v in tf.global_variables():
            v.load(
                rs.uniform(-0.3, 0.3, v.shape.as_list()).astype(np.float32),
                sess,
            )
        logits_v = sess.run(logits)

        tmp = tempfile.mkdtemp(prefix="ref_ckpt_")
        save_path = tf.train.Saver().save(sess, os.path.join(tmp, "model.ckpt"))

    reader = tf.train.load_checkpoint(save_path)
    names = sorted(reader.get_variable_to_shape_map())
    out = {
        "ckptcv_config": np.array(
            [B, steps, input_size, mem_size, mem_dim, hidden, L, R, W],
            np.int64,
        ),
        "ckptcv_inputs": inputs,
        "ckptcv_logits": np.stack(logits_v),
        "ckptcv_names": np.array(names, np.str_),
    }
    for i, n in enumerate(names):
        out[f"ckptcv_var_{i}"] = reader.get_tensor(n)
    return out


def gen_repeat_copy_cost_goldens():
    """Execute the reference's masked_sigmoid_cross_entropy
    (dnc/repeat_copy.py:29-66) for all four (time_average,
    log_prob_in_bits) variants on seeded time-major logits/targets/mask."""
    rc = _load_patched_module(
        "dnc/repeat_copy.py", "_ref_repeat_copy",
        # sonnet import only feeds the RepeatCopy module class, which the
        # cost function does not touch
        extra_patches=[("import sonnet as snt", "")],
        extra_globals={"snt": types.SimpleNamespace(AbstractModule=object)},
    )
    rs = np.random.RandomState(23)
    T, B, C = 9, 4, 5
    logits = rs.uniform(-3, 3, (T, B, C)).astype(np.float32)
    target = (rs.rand(T, B, C) > 0.5).astype(np.float32)
    mask = (rs.rand(T, B) > 0.3).astype(np.float32)
    out = {
        "rccost_logits": logits,
        "rccost_target": target,
        "rccost_mask": mask,
    }
    with tf.Graph().as_default(), tf.Session() as sess:
        for ta in (False, True):
            for bits in (False, True):
                val = sess.run(rc.masked_sigmoid_cross_entropy(
                    tf.constant(logits), tf.constant(target),
                    tf.constant(mask), time_average=ta, log_prob_in_bits=bits,
                ))
                out[f"rccost_ta{int(ta)}_bits{int(bits)}"] = np.float32(val)
    return out


if __name__ == "__main__":
    main()


