"""Experiment builders: the offset tracker (NTM or DNC core) and the
copy-paste sanity task.

The graph-construction of the reference's L5 layer (ntm_offsets,
direct_offset_output.py:401-653; DNC twin :399-621; copy_paste,
main.py:1540-1644) re-expressed as pure loss/step functions the harness
jits over a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ntm_tracker_tpu.config import NTMConfig, TrackerConfig
from ntm_tracker_tpu.data.image_ops import preprocess_frame
from ntm_tracker_tpu.models.core import MemoryCore, make_core
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
from ntm_tracker_tpu.models.vgg import extract_features, vgg16_features
from ntm_tracker_tpu.train.optim import reference_optimizer
from ntm_tracker_tpu.train.serialize import (
    gather_delimiter_outputs,
    offsets_loss,
    serialize_tokens,
)


def frame_tokens(cfg: TrackerConfig, vgg_params, crops: jax.Array) -> jax.Array:
    """[N, crop, crop, 3] mean-subtracted crops -> [N, F, C] frozen VGG
    tokens (extract_features(conv4_3), direct_offset_output.py:417-428).

    Takes the exact fast path (vgg16_conv43_tokens) whenever it applies;
    shared by the experiments, the streaming tracker and the feature cache
    so all three compute identical tokens."""
    if (
        cfg.fast_conv43
        and cfg.feature_points is None
        and crops.shape[1] == crops.shape[2] == 224
    ):
        if cfg.vgg_int8:
            # opt-in quantized serving mode (models/vgg_int8.py docstring)
            from ntm_tracker_tpu.models.vgg_int8 import vgg16_conv43_tokens_int8

            return vgg16_conv43_tokens_int8(vgg_params, crops)
        from ntm_tracker_tpu.models.vgg import vgg16_conv43_tokens

        return vgg16_conv43_tokens(
            vgg_params, crops, compute_dtype=cfg.compute_dtype
        )
    if cfg.vgg_int8:
        # never silently serve the exact path when the user asked for the
        # quantized one: int8 exists only as the 224/canonical-grid twin
        raise ValueError(
            "vgg_int8=True requires the canonical fast-conv43 config "
            "(fast_conv43=True, feature_points=None, 224x224 crops); got "
            f"crop {crops.shape[1]}x{crops.shape[2]}, feature_points="
            f"{'custom' if cfg.feature_points is not None else 'None'}, "
            f"fast_conv43={cfg.fast_conv43}"
        )
    feats = vgg16_features(vgg_params, crops, compute_dtype=cfg.compute_dtype)
    if cfg.feature_points is None:
        return extract_features(feats)
    return extract_features(feats, list(cfg.feature_points))


@dataclasses.dataclass
class OffsetExperiment:
    """The primary pipeline: VID crops -> VGG tokens -> memory core ->
    per-frame (dy,dx) offsets with L2-on-tanh loss."""

    cfg: TrackerConfig
    vgg_params: Any
    core: MemoryCore = None  # type: ignore[assignment]
    image_mode: str = "cropped"  # "raw" | "resized" | "cropped"

    # subclasses with non-offset heads (HeatmapExperiment) opt out of the
    # (dy, dx[, ds]) output_dim check
    _offsets_head = True

    def __post_init__(self):
        if self._offsets_head:
            from ntm_tracker_tpu.config import validate_head

            validate_head(self.cfg)
        if self.core is None:
            self.core = make_core(self.cfg)

    # ---- parameter/optimizer construction -------------------------------
    def init(self, rng: jax.Array):
        params = self.core.init_params(rng, self.cfg.input_depth)
        opt = self.optimizer()
        return params, opt.init(params)

    def _targets(self, batch: Dict[str, jax.Array], B: int) -> jax.Array:
        """[B, L, head_dim] supervision: (dy, dx) center offsets, plus the
        normalized log-scale target when cfg.predict_scale (batch["scales"]
        = geometry.calculate_scale / cfg.scale_range, see demo/loader)."""
        cfg = self.cfg
        L = cfg.train.sequence_length
        t = jnp.stack([batch["y_offsets"], batch["x_offsets"]], axis=1)
        t = t.reshape(B, L, 2)
        if cfg.predict_scale:
            t = jnp.concatenate(
                [t, batch["scales"].reshape(B, L, 1)], axis=-1
            )
        return t

    def optimizer(self) -> optax.GradientTransformation:
        t = self.cfg.train
        eps = 1e-10
        return reference_optimizer(
            t.learning_rate, t.decay, t.momentum, eps, t.max_gradient_norm
        )

    # ---- forward pieces --------------------------------------------------
    def images_to_crops(self, images: jax.Array, cropboxes: jax.Array) -> jax.Array:
        """[B*L, H, W, 3] raw/resized frames -> [B*L, 224, 224, 3] crops."""
        d = self.cfg.data
        if self.image_mode == "cropped":
            return images.astype(jnp.float32)
        do_resize = self.image_mode == "raw"
        fn = lambda im, cb: preprocess_frame(
            im, cb, resize_hw=d.resize_hw, crop_size=d.crop_size,
            do_resize=do_resize,
        )
        return jax.vmap(fn)(images, cropboxes)

    def crops_to_tokens(self, crops: jax.Array, vgg_params=None) -> jax.Array:
        """[B*L,224,224,3] -> [B, L, 64, 512] frozen VGG tokens."""
        toks = frame_tokens(
            self.cfg,
            self.vgg_params if vgg_params is None else vgg_params,
            crops,
        )
        L = self.cfg.train.sequence_length
        B = toks.shape[0] // L
        return toks.reshape(B, L, self.cfg.num_features, self.cfg.feature_depth)

    def batch_features(self, batch: Dict[str, jax.Array]) -> jax.Array:
        """[B, L, F, C] float32 tokens for a batch.

        Batches carry either decoded frames ("images" + "cropboxes": run the
        frozen VGG here, the reference's every-step path) or precomputed
        tokens ("features" from data/feature_cache.py: VGG is frozen, so its
        tokens are a pure function of the dataset — skip it entirely)."""
        if "features" in batch:
            cfg = self.cfg
            L = cfg.train.sequence_length
            f = batch["features"].astype(jnp.float32)
            B = f.shape[0] // L
            return f.reshape(B, L, cfg.num_features, cfg.feature_depth)
        crops = self.images_to_crops(batch["images"], batch["cropboxes"])
        # "vgg_params" in the batch overrides the experiment's frozen VGG:
        # the train_step_with_bptt_fallback wrapper injects it so the VGG
        # enters the jitted step as an ARGUMENT, not a 59 MB closure
        # constant (shared compiles + small cache entries — same design
        # as tracking/tracker.build_frame_step)
        if "vgg_params" in batch:
            return self.crops_to_tokens(crops, batch["vgg_params"])
        return self.crops_to_tokens(crops)

    def loss_fn(self, params: Any, batch: Dict[str, jax.Array]) -> Tuple[jax.Array, Dict]:
        cfg = self.cfg
        L = cfg.train.sequence_length
        features = self.batch_features(batch)
        B = features.shape[0]
        gts = batch["gts"].reshape(B, L, cfg.num_features)
        tokens = serialize_tokens(features, gts[:, 0, :])
        logits, _ = self.core.unroll(params, tokens)
        loss = offsets_loss(logits, self._targets(batch, B), cfg.num_features)
        preds = jnp.tanh(gather_delimiter_outputs(logits, cfg.num_features))
        return loss, {"loss": loss, "pred_offsets": preds}

    # ---- steps -----------------------------------------------------------
    def make_train_step(self) -> Callable:
        opt = self.optimizer()

        def train_step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss}

        return train_step

    def make_eval_step(self) -> Callable:
        def eval_step(params, batch):
            loss, aux = self.loss_fn(params, batch)
            return aux

        return eval_step

    def _tokens(self, params, batch: Dict[str, jax.Array]) -> Tuple[jax.Array, Any]:
        """(token stream, the CORE's param subtree) for this experiment."""
        cfg = self.cfg
        L = cfg.train.sequence_length
        features = self.batch_features(batch)
        B = features.shape[0]
        gts = batch["gts"].reshape(B, L, cfg.num_features)
        return serialize_tokens(features, gts[:, 0, :]), params

    def memory_states(
        self,
        params,
        batch: Dict[str, jax.Array],
        stride: Optional[int] = None,
        max_snapshots: int = 256,
    ):
        """Memory observables over the token stream for dashboards
        (the reference's Ms/ws/reads summaries, main.py:1186-1214).

        stride=None picks the smallest stride that keeps at most
        `max_snapshots` snapshots (token-stream lengths differ per
        serialization; a trailing partial chunk is unrecorded). Returns
        {"M": [B,T//stride,N,D], "w": ..., "read": ...}."""
        from ntm_tracker_tpu.models.core import unroll_states

        tokens, core_params = self._tokens(params, batch)
        if stride is None:
            T = tokens.shape[1]
            stride = max(1, -(-T // max_snapshots))
        _logits, views, _final = unroll_states(
            self.core, core_params, tokens, stride=stride
        )
        return views

    def eval_with_views(
        self,
        params,
        batch: Dict[str, jax.Array],
        max_snapshots: int = 256,
    ) -> Tuple[Dict, Dict]:
        """(eval aux, memory views) in a SINGLE forward pass: the VGG tokens
        and the T-step unroll are computed once, serving both the validation
        loss/predictions and the memory dashboards (the --save_imgs path —
        running make_eval_step and memory_states separately doubles the
        device work per validation batch)."""
        from ntm_tracker_tpu.models.core import unroll_states

        tokens, core_params = self._tokens(params, batch)
        T = tokens.shape[1]
        stride = max(1, -(-T // max_snapshots))
        logits, views, _final = unroll_states(
            self.core, core_params, tokens, stride=stride, full_logits=True
        )
        return self._eval_aux_from_logits(logits, batch), views

    def _eval_aux_from_logits(self, logits: jax.Array, batch) -> Dict:
        """Eval aux from the full [B, T, out] logits — must agree with
        loss_fn's aux (asserted in tests); overridden per serialization."""
        cfg = self.cfg
        B = logits.shape[0]
        loss = offsets_loss(logits, self._targets(batch, B), cfg.num_features)
        preds = jnp.tanh(gather_delimiter_outputs(logits, cfg.num_features))
        return {"loss": loss, "pred_offsets": preds}


def synthetic_offset_batch(
    cfg: TrackerConfig, rng: np.random.RandomState, image_mode: str = "cropped"
) -> Dict[str, np.ndarray]:
    """A fabricated batch with the loader's layout — for tests and for the
    throughput benchmark (no ILSVRC on disk)."""
    B, L = cfg.train.batch_size, cfg.train.sequence_length
    d = cfg.data
    n = B * L
    if image_mode == "cropped":
        images = rng.rand(n, d.crop_size, d.crop_size, 3).astype(np.float32) * 50
    elif image_mode == "resized":
        images = (rng.rand(n, *d.resize_hw, 3) * 255).astype(np.float32)
    else:
        images = (rng.rand(n, 360, 640, 3) * 255).astype(np.float32)
    gts = rng.rand(n, d.gt_width, d.gt_width).astype(np.float32)
    gts /= gts.sum(axis=(1, 2), keepdims=True)
    batch = {
        "images": images,
        "cropboxes": np.tile(
            np.array([0.2, 0.2, 0.8, 0.8], np.float32), (n, 1)
        ),
        "gts": gts,
        "y_offsets": (rng.rand(n).astype(np.float32) - 0.5) * 0.4,
        "x_offsets": (rng.rand(n).astype(np.float32) - 0.5) * 0.4,
    }
    if cfg.predict_scale:
        batch["scales"] = (rng.rand(n).astype(np.float32) - 0.5) * 0.8
    return batch


def synthetic_cached_batch(
    cfg: TrackerConfig, rng: np.random.RandomState
) -> Dict[str, Any]:
    """A fabricated PRE-TOKENIZED batch with the feature-cache layout
    (train-offsets --feature_cache): float16 conv4_3-scale tokens instead
    of images. The single definition shared by benchmarks.py's headline
    cached-train measurement and tools/profile_train.py's attribution
    sweep — the two must measure the identical workload."""
    import jax.numpy as jnp

    B, L = cfg.train.batch_size, cfg.train.sequence_length
    raw = synthetic_offset_batch(cfg, rng)
    n = B * L
    batch = {
        "features": jnp.asarray(
            (rng.rand(n, cfg.num_features, cfg.feature_depth) * 40).astype(
                np.float16
            )
        ),
        "gts": jnp.asarray(raw["gts"]),
        "y_offsets": jnp.asarray(raw["y_offsets"]),
        "x_offsets": jnp.asarray(raw["x_offsets"]),
    }
    if cfg.predict_scale:
        batch["scales"] = jnp.asarray(raw["scales"])
    return batch


@dataclasses.dataclass
class HeatmapExperiment(OffsetExperiment):
    """Heatmap-output variants: the NTM emits per-location logits and the
    loss is softmax-CE against the gt heatmap at the gathered steps.

    serialization='sequential': the REFERENCE structure — ntm_sevenbyseven,
                                ntm_8by8 and ntm_sequential all use the
                                per-feature 2F+1 token stream with scalar
                                outputs at feature-delimiter steps
                                (main.py:1646-2297, :979-1291, :2040-2135).
    serialization='frame':      TPU-friendly NON-reference variant — 64
                                tokens + one delimiter per frame, the
                                F-dim heatmap read at delimiter steps
                                (20x fewer sequential steps; same loss).
    compress_dim>0 adds the learned 1x1-conv input compressor; its weight
    lives in params['compressor'] and trains with the core.
    """

    serialization: str = "sequential"
    compress_dim: int = 0
    _offsets_head = False

    def init(self, rng: jax.Array):
        from ntm_tracker_tpu.train.zoo import init_compressor

        k1, k2 = jax.random.split(rng)
        depth = self.compress_dim or self.cfg.feature_depth
        if self.serialization == "sequential":
            input_size = depth + 3  # feature-delim + frame-delim + target
        else:
            input_size = depth + 2
        core_params = self.core.init_params(k1, input_size)
        params = {"core": core_params}
        if self.compress_dim:
            params["compressor"] = init_compressor(
                k2, self.cfg.feature_depth, self.compress_dim
            )
        opt = self.optimizer()
        return params, opt.init(params)

    def loss_fn(self, params: Any, batch: Dict[str, jax.Array]):
        from ntm_tracker_tpu.train.serialize import heatmap_loss
        from ntm_tracker_tpu.train.zoo import (
            compress_features,
            sequential_ce_loss,
            serialize_sequential_tokens,
        )

        cfg = self.cfg
        L = cfg.train.sequence_length
        features = self.batch_features(batch)
        if self.compress_dim:
            features = compress_features(features, params["compressor"])
        B = features.shape[0]
        gts = batch["gts"].reshape(B, L, cfg.num_features)
        if self.serialization == "sequential":
            tokens = serialize_sequential_tokens(features, gts[:, 0, :])
            logits, _ = self.core.unroll(params["core"], tokens)
            loss = sequential_ce_loss(logits, gts, cfg.num_features)
        else:
            tokens = serialize_tokens(features, gts[:, 0, :])
            logits, _ = self.core.unroll(params["core"], tokens)
            loss = heatmap_loss(logits, gts, cfg.num_features)
        return loss, {"loss": loss}

    def _tokens(self, params, batch):
        from ntm_tracker_tpu.train.zoo import (
            compress_features,
            serialize_sequential_tokens,
        )

        cfg = self.cfg
        L = cfg.train.sequence_length
        features = self.batch_features(batch)
        if self.compress_dim:
            features = compress_features(features, params["compressor"])
        B = features.shape[0]
        gts = batch["gts"].reshape(B, L, cfg.num_features)
        if self.serialization == "sequential":
            tokens = serialize_sequential_tokens(features, gts[:, 0, :])
        else:
            tokens = serialize_tokens(features, gts[:, 0, :])
        return tokens, params["core"]

    def _eval_aux_from_logits(self, logits: jax.Array, batch) -> Dict:
        from ntm_tracker_tpu.train.serialize import heatmap_loss
        from ntm_tracker_tpu.train.zoo import sequential_ce_loss

        cfg = self.cfg
        L = cfg.train.sequence_length
        B = logits.shape[0]
        gts = batch["gts"].reshape(B, L, cfg.num_features)
        if self.serialization == "sequential":
            loss = sequential_ce_loss(logits, gts, cfg.num_features)
        else:
            loss = heatmap_loss(logits, gts, cfg.num_features)
        return {"loss": loss}


# ---------------------------------------------------------------------------
# copy-paste sanity task (main.py:1540-1644): present a random bit pattern,
# then a delimiter, then ask the NTM to reproduce it. Validates the memory
# core independently of tracking.
# ---------------------------------------------------------------------------

def make_copy_paste_batch(
    rng: np.random.RandomState, batch: int, width: int, length: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (inputs [B, 2L+1, width+1], labels [B, 2L+1, width+1])."""
    bits = rng.randint(0, 2, size=(batch, width, length)).astype(np.float32)
    inp = np.concatenate([bits, np.zeros((batch, 1, length), np.float32)], 1)
    delim = np.concatenate(
        [np.zeros((batch, width, 1), np.float32), np.ones((batch, 1, 1), np.float32)], 1
    )
    pad = np.zeros_like(inp)
    labels = np.concatenate([pad, np.zeros_like(delim), inp], 2)
    inputs = np.concatenate([inp, delim, pad], 2)
    return inputs.transpose(0, 2, 1), labels.transpose(0, 2, 1)


def copy_paste_loss(params, cfg: NTMConfig, inputs, labels):
    """log loss on sigmoids (tf.losses.log_loss, main.py:1612)."""
    _, logits, _ = ntm_tracker_unroll(params, cfg, inputs)
    p = jax.nn.sigmoid(logits)
    eps = 1e-7
    return -jnp.mean(labels * jnp.log(p + eps) + (1 - labels) * jnp.log(1 - p + eps))


@dataclasses.dataclass
class WholeFrameExperiment:
    """The original ntm()/ntm_two_step() experiments (main.py:780-977):
    whole feature map presented per frame (optionally via the two-step
    present/ask protocol), CE against softmax(gt heatmap), fed by the
    pickle-based mined dataset (data/pickle_dataset.py).

    endpoint='pool5' gives the 7x7 (49-feature) grid these experiments ran
    on; a learned 1x1-conv compressor shrinks channels before flattening
    (main.py:710-715 — always on in the reference)."""

    cfg: TrackerConfig
    vgg_params: Any
    endpoint: str = "pool5"
    two_step: bool = False
    compress_dim: int = 128
    core: MemoryCore = None  # type: ignore[assignment]

    def __post_init__(self):
        from ntm_tracker_tpu.data.mining import vgg_layer_sizes

        sizes = vgg_layer_sizes(self.cfg.data.crop_size)
        key = self.endpoint.split("/")[-1]
        _, h, w, _ = sizes[key]
        self.num_features = h * w
        # two_step adds the "background" output bit (main.py:891)
        out_dim = self.num_features + (1 if self.two_step else 0)
        cfg_core = dataclasses.replace(
            self.cfg,
            ntm=dataclasses.replace(self.cfg.ntm, output_dim=out_dim),
            dnc=dataclasses.replace(self.cfg.dnc, output_dim=out_dim),
        )
        self.cfg = cfg_core
        if self.core is None:
            self.core = make_core(cfg_core)

    def init(self, rng: jax.Array):
        from ntm_tracker_tpu.train.zoo import init_compressor

        k1, k2 = jax.random.split(rng)
        F = self.num_features
        input_size = F * self.compress_dim + F  # flat features + indicator
        if self.two_step:
            input_size += 1  # the ask/present switch bit
        params = {
            "core": self.core.init_params(k1, input_size),
            "compressor": init_compressor(
                k2, self.cfg.feature_depth, self.compress_dim
            ),
        }
        opt = self.optimizer()
        return params, opt.init(params)

    def optimizer(self):
        t = self.cfg.train
        return reference_optimizer(
            t.learning_rate, t.decay, t.momentum, 1e-10, t.max_gradient_norm
        )

    def loss_fn(self, params, batch):
        from ntm_tracker_tpu.train.zoo import (
            compress_features,
            whole_frame_ce_loss,
            whole_frame_tokens,
        )

        from ntm_tracker_tpu.models.vgg import VGG_MEAN

        L = self.cfg.train.sequence_length
        # read_imgs subtracts the VGG mean after the 224 resize (main.py:311)
        images = batch["images"].astype(jnp.float32) - jnp.asarray(VGG_MEAN)
        feats = vgg16_features(
            self.vgg_params, images,
            endpoint=self.endpoint,
            compute_dtype=self.cfg.compute_dtype,
        )
        BL, h, w, C = feats.shape
        B = BL // L
        feats = feats.reshape(B, L, h * w, C)
        feats = compress_features(feats, params["compressor"])
        if batch["gts"].shape[-1] != self.num_features:
            raise ValueError(
                f"gt masks have {batch['gts'].shape[-1]} features but "
                f"endpoint {self.endpoint!r} yields {self.num_features}; "
                "mine-sequences --layers must match --feature_layer"
            )
        gts = batch["gts"].reshape(B, L, self.num_features)
        tokens = whole_frame_tokens(feats, gts[:, 0, :], self.two_step)
        logits, _ = self.core.unroll(params["core"], tokens)
        loss = whole_frame_ce_loss(logits, gts, self.two_step)
        return loss, {"loss": loss}

    def make_train_step(self):
        opt = self.optimizer()

        def train_step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss}

        return train_step


def disable_fused_bptt(exp):
    """A copy of `exp` pinned to the XLA-scan BPTT (fused_bptt=False).

    The core is rebuilt from the new config (a core constructed earlier
    closed over the old TrainConfig), so the returned experiment cannot
    reach ops/pallas/scan_bptt at all."""
    cfg = dataclasses.replace(
        exp.cfg, train=dataclasses.replace(exp.cfg.train, fused_bptt=False)
    )
    return dataclasses.replace(exp, cfg=cfg, core=None)


def train_step_with_bptt_fallback(exp, build=None):
    """Guarded train step: fall back to the XLA scan if the fused Pallas
    BPTT fails to COMPILE.

    The fused kernel's compiles have a failure class the training code
    cannot predict: the tunneled backend's compile service returned an
    opaque HTTP 500 on the 8-tile B=512 program (ops/pallas/scan_bptt.py
    module docstring), and narrow-tile Mosaic compiles can take ~5 min.
    With fused_bptt="auto" as the default training path, such a failure
    must degrade to the XLA scan (measured 1.39-1.61x slower at the knee —
    slower, not broken), never kill the run.

    `build(exp) -> step` constructs the compiled step (defaults to
    jax.jit(exp.make_train_step(), donate_argnums=(0, 1)); the CLI passes
    its parallel_train_step wrapper). The FIRST invocation is guarded:
    on any exception while the fused path could have been active
    (core="ntm", fused_bptt not already False), the experiment is rebuilt
    via disable_fused_bptt and the call retried once on the XLA scan —
    a second failure propagates chained to the original (the error was
    never the kernel's — or, for a RUNTIME failure after donation already
    consumed params/opt_state, the retry's deleted-buffer error carries
    the real first error as its __cause__). Donated buffers are safe to
    retry after COMPILE failures, which raise before execution starts.

    The returned callable exposes `.fell_back` (bool) for tests/logs.
    """
    import sys

    if build is None:
        def build(e):
            jitted = jax.jit(e.make_train_step(), donate_argnums=(0, 1))
            vgg = getattr(e, "vgg_params", None)
            if vgg is None:
                return jitted

            # inject the frozen VGG into the batch OUTSIDE the jit: it
            # enters the step as an argument pytree, so the compiled
            # executable embeds no weight constants (trains with
            # different inits share one compile; cache entries shrink
            # from ~65 MB to ~2 MB). The pjit build path (CLI) keeps its
            # own build fn — its batch sharding must not see extra keys.
            def call(params, opt_state, batch):
                b = dict(batch)
                b["vgg_params"] = vgg
                return jitted(params, opt_state, b)

            return call

    state = {"step": build(exp), "first": True}

    def step(*args, **kwargs):
        if not state["first"]:
            return state["step"](*args, **kwargs)
        try:
            out = state["step"](*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — intentionally broad: the
            # compile-service failure class is opaque (HTTP 500 with no
            # diagnostic); misattributed errors re-raise from the retry
            if exp.cfg.core != "ntm" or exp.cfg.train.fused_bptt is False:
                raise
            print(
                "train_step_with_bptt_fallback: first compile failed "
                f"({type(e).__name__}: {e}); retrying with the XLA-scan "
                "BPTT (fused_bptt=False)",
                file=sys.stderr, flush=True,
            )
            state["step"] = build(disable_fused_bptt(exp))
            try:
                out = state["step"](*args, **kwargs)
            except Exception as e2:
                # e.g. a RUNTIME failure after donation consumed the
                # params/opt_state buffers makes the retry see
                # "Array has been deleted" — chain the ORIGINAL error so
                # it stays diagnosable instead of being masked
                raise e2 from e
            step.fell_back = True
        state["first"] = False
        return out

    step.fell_back = False
    return step
