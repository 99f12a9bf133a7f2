"""AOT-compiled serving artifact: export the whole-frame tracking step.

Production serving wants neither a Python model definition nor a per-process
retrace/compile (the tunneled-TPU first compile of the frame step is tens of
seconds). `jax.export` lowers a jitted function to versioned StableHLO that
a fresh process — with no access to this package's model code or weights —
deserializes and runs. This tool packages the streaming tracker's THREE
serving entry points into one `.npz`:

  init   ()                          -> state leaves [B,...]  (learnable)
  first  (crops [1,S,S,3], gt [1,F]) -> (offsets [1,2], B=1 state leaves)
  step   (crops [B,S,S,3], leaves)   -> (offsets [B,2], state leaves)

plus, with `device_loop=(H, W)` (CLI `--device_loop HxW`), the fully
device-resident loop of tracking/tracker.py:make_device_track_step — crop
geometry, VGG, 65 cell steps AND the recrop feedback in one program, for
pipelines whose frames are already on device (raw RGB, fixed HxW):

  dinit  (frames [B,H,W,3], bbox0 [B,4], leaves) -> state leaves
  dstep  (frames [B,H,W,3], bbox [B,4], leaves)
         -> (region [B,4] x,y,w,h px, next_bbox [B,4], state leaves)

first is ALWAYS baked at batch 1 — presenting a first frame is a per-track
event (StreamingTracker serves B=1; FleetTracker.add presents one track and
merges its state into the batch), while init/step carry the artifact batch
(--batch N exports a fleet-servable artifact: FleetTracker.from_serving).

Weights (VGG + cell + learnable initial state) are baked into the artifact
as constants, so the artifact is the complete serving unit — the frame math
is exactly tracking/tracker.py's build_frame_step (one device call per
frame; test_tracker.py:284-299 did 65 sess.run round trips). State crosses
the boundary as flat leaves to keep the artifact free of pytree
registrations; the loader re-assembles nothing — callers thread the tuple.

The fused single-stream Pallas kernel is disabled in the exported program
(fused_inference=False): exported artifacts should be portable across
lowering platforms, and the jnp scan is the reference-semantics path.

Host-side bbox decode / recrop geometry stays host-side by design (cheap
scalar math; see tracking/tracker.py) — drive the artifact with
`StreamingTracker.from_serving(ServingModel(path))`, or from any StableHLO
runtime. Crops fed to first/step are mean-subtracted, crop-and-resized RGB
exactly as build_frame_step documents; from_serving handles that host side.

Usage:
  python -m ntm_tracker_tpu export-serving --out serving.npz \
      [model flags] [--batch 1] [--platforms tpu,cpu] [--delimiter_first]
"""

from __future__ import annotations

import json
from typing import Any, Optional, Sequence, Tuple

import numpy as np

_FORMAT = "ntm-tracker-serving-v1"


def export_serving(
    cfg,
    core,
    vgg_params: Any,
    params: Any,
    batch: int = 1,
    delimiter_first: bool = False,
    platforms: Optional[Sequence[str]] = None,
    device_loop: Optional[Tuple[int, int]] = None,
) -> dict:
    """Export init/first/step as serialized StableHLO; returns the artifact
    dict (np.savez-able). device_loop=(H, W) additionally bakes the
    device-resident track loop at that frame geometry (dinit/dstep)."""
    import jax
    from jax import export as jexport

    from ntm_tracker_tpu.tracking.tracker import build_frame_step

    portable = _portable(cfg)
    if portable is not cfg:
        # the core captured the original cfg at make_core time; rebuild it
        # from the portable one so the pinned dispatch flags actually apply
        # (params are structurally identical — the flags only pick kernels)
        from ntm_tracker_tpu.models.core import make_core

        core = make_core(portable)
    cfg = portable
    step_first, _ = build_frame_step(
        cfg, core, vgg_params, params,
        donate_state=False, delimiter_first=delimiter_first,
    )
    frame_fn = step_first.frame_fn

    state0 = jax.eval_shape(lambda: core.init_state(params, batch))
    leaves0, treedef = jax.tree_util.tree_flatten(state0)
    state1 = jax.eval_shape(lambda: core.init_state(params, 1))
    leaves1 = jax.tree_util.tree_flatten(state1)[0]

    def flat_init():
        return tuple(jax.tree_util.tree_leaves(core.init_state(params, batch)))

    def flat_first(crops, gt, *leaves):
        # ALWAYS batch 1: first-frame presentation is a per-track event
        # (FleetTracker.add runs it at B=1 and merges the slot state), and
        # the batch-1 StreamingTracker is unchanged by this
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        offsets, new_state = frame_fn(crops, gt, state)
        return (offsets, *jax.tree_util.tree_leaves(new_state))

    def flat_step(crops, *leaves):
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        offsets, new_state = frame_fn(crops, None, state)
        return (offsets, *jax.tree_util.tree_leaves(new_state))

    S = cfg.data.crop_size
    crops_spec = jax.ShapeDtypeStruct((batch, S, S, 3), np.float32)
    crops1_spec = jax.ShapeDtypeStruct((1, S, S, 3), np.float32)
    gt1_spec = jax.ShapeDtypeStruct((1, cfg.num_features), np.float32)
    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves0]
    leaf1_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves1]

    kw = {"platforms": list(platforms)} if platforms else {}
    exp_init = jexport.export(jax.jit(flat_init), **kw)()
    exp_first = jexport.export(jax.jit(flat_first), **kw)(
        crops1_spec, gt1_spec, *leaf1_specs)
    exp_step = jexport.export(jax.jit(flat_step), **kw)(
        crops_spec, *leaf_specs)

    exp_dinit = exp_dstep = None
    if device_loop is not None:
        from ntm_tracker_tpu.tracking.tracker import make_device_track_step

        H, W = int(device_loop[0]), int(device_loop[1])
        if H < 2 or W < 2:
            raise ValueError(f"device_loop frame geometry too small: {H}x{W}")
        dinit_fn, dstep_fn = make_device_track_step(
            cfg, core, vgg_params, params, delimiter_first=delimiter_first)

        def flat_dinit(frames, bbox0, *leaves):
            state = jax.tree_util.tree_unflatten(treedef, leaves)
            new_state = dinit_fn(frames, bbox0, state)
            return tuple(jax.tree_util.tree_leaves(new_state))

        def flat_dstep(frames, bbox, *leaves):
            state = jax.tree_util.tree_unflatten(treedef, leaves)
            region, nbbox, new_state = dstep_fn(frames, bbox, state)
            return (region, nbbox, *jax.tree_util.tree_leaves(new_state))

        frames_spec = jax.ShapeDtypeStruct((batch, H, W, 3), np.float32)
        bbox_spec = jax.ShapeDtypeStruct((batch, 4), np.float32)
        exp_dinit = jexport.export(jax.jit(flat_dinit), **kw)(
            frames_spec, bbox_spec, *leaf_specs)
        exp_dstep = jexport.export(jax.jit(flat_dstep), **kw)(
            frames_spec, bbox_spec, *leaf_specs)

    import dataclasses

    meta = {
        "format": _FORMAT,
        "batch": batch,
        "first_batch": 1,  # first is a per-track event (FleetTracker.add)
        "crop_size": S,
        "num_features": cfg.num_features,
        "core": cfg.core,
        "data": dataclasses.asdict(cfg.data),  # host recrop geometry
        "feature_points": (None if cfg.feature_points is None else
                           [list(p) for p in cfg.feature_points]),
        "delimiter_first": delimiter_first,
        # the host decode branches on these (tracker.decode_head): scale
        # head emits (dy, dx, ds) and the box is rescaled before the shift
        "predict_scale": bool(cfg.predict_scale),
        "scale_range": float(cfg.scale_range),
        # provenance only: the token path (exact or int8) is baked into the
        # lowered programs; nothing host-side branches on this
        "vgg_int8": bool(getattr(cfg, "vgg_int8", False)),
        "platforms": list(exp_step.platforms),
        # frame geometry the device-resident loop was baked at (or None)
        "device_loop": (None if device_loop is None
                        else [int(device_loop[0]), int(device_loop[1])]),
        "state_leaves": [
            {"shape": list(l.shape), "dtype": str(np.dtype(l.dtype))}
            for l in leaves0
        ],
        "jax_version": jax.__version__,
    }
    artifact = {
        "meta": np.asarray(json.dumps(meta)),
        "init": np.frombuffer(bytes(exp_init.serialize()), np.uint8),
        "first": np.frombuffer(bytes(exp_first.serialize()), np.uint8),
        "step": np.frombuffer(bytes(exp_step.serialize()), np.uint8),
    }
    if exp_dinit is not None:
        artifact["dinit"] = np.frombuffer(
            bytes(exp_dinit.serialize()), np.uint8)
        artifact["dstep"] = np.frombuffer(
            bytes(exp_dstep.serialize()), np.uint8)
    return artifact


def _portable(cfg):
    """Exported programs must not depend on the trace-time backend: pin the
    reference-semantics jnp scan (no Pallas kernel in the artifact) — both
    the fused single-stream scan AND the per-step Mosaic addressing kernel
    (NTMConfig.use_pallas), which cannot lower for non-TPU platforms."""
    import dataclasses

    if cfg.fused_inference is False and not cfg.ntm.use_pallas:
        return cfg
    return dataclasses.replace(
        cfg, fused_inference=False,
        ntm=dataclasses.replace(cfg.ntm, use_pallas=False))


def save_serving(path: str, artifact: dict) -> None:
    np.savez(path, **artifact)


def config_from_meta(meta: dict):
    """Reconstruct the host-geometry TrackerConfig from artifact meta — the
    ONE decoder for every from_serving constructor (StreamingTracker and
    FleetTracker). Weights/programs stay in the artifact; this config only
    drives host-side crop/recrop geometry."""
    from ntm_tracker_tpu.config import DataConfig, TrackerConfig

    data = dict(meta["data"])
    data["resize_hw"] = tuple(data["resize_hw"])  # JSON round trip
    fp = meta.get("feature_points")
    if fp is not None and len(fp) != meta["num_features"]:
        raise ValueError(
            f"corrupt artifact meta: {len(fp)} feature_points vs "
            f"num_features={meta['num_features']}")
    return TrackerConfig(
        core=meta["core"], data=DataConfig(**data),
        num_features=meta["num_features"],
        feature_points=(None if fp is None else
                        tuple(tuple(p) for p in fp)),
        # .get: artifacts exported before the scale head default to the
        # reference offsets-only decode
        predict_scale=bool(meta.get("predict_scale", False)),
        scale_range=float(meta.get("scale_range", 0.15)))


class ServingModel:
    """Load an exported artifact and serve it — no model code, no weights.

    step/first return (offsets [B,2] np.ndarray, state leaves tuple).
    """

    def __init__(self, path: str):
        import jax
        from jax import export as jexport

        with np.load(path) as z:
            self.meta = json.loads(str(z["meta"]))
            if self.meta.get("format") != _FORMAT:
                raise ValueError(f"not a serving artifact: {path}")
            self._init = jexport.deserialize(z["init"].tobytes())
            self._first = jexport.deserialize(z["first"].tobytes())
            self._step = jexport.deserialize(z["step"].tobytes())
            self._dinit = (jexport.deserialize(z["dinit"].tobytes())
                           if "dinit" in z else None)
            self._dstep = (jexport.deserialize(z["dstep"].tobytes())
                           if "dstep" in z else None)
        # jit the .call wrappers once: eager Exported.call re-traces per
        # invocation (~0.6 ms/call host overhead measured on CPU — ~30% of
        # the whole B=1 frame step), defeating the artifact's latency point
        self._init_call = jax.jit(self._init.call)
        self._first_call = jax.jit(self._first.call)
        self._step_call = jax.jit(self._step.call)
        self._dinit_call = (jax.jit(self._dinit.call)
                            if self._dinit is not None else None)
        self._dstep_call = (jax.jit(self._dstep.call)
                            if self._dstep is not None else None)

    @staticmethod
    def _f32(x):
        # keep device arrays on device (a per-frame host copy of the crop
        # would undo the one-device-call-per-frame design); numpy inputs
        # get the usual conversion
        import jax

        if isinstance(x, jax.Array):
            return x.astype("float32") if x.dtype != np.float32 else x
        return np.asarray(x, np.float32)

    def init_state(self) -> Tuple:
        return tuple(self._init_call())

    def first(self, crops, gt, leaves) -> Tuple[np.ndarray, Tuple]:
        out = self._first_call(self._f32(crops), self._f32(gt), *leaves)
        return np.asarray(out[0]), tuple(out[1:])

    def step(self, crops, leaves) -> Tuple[np.ndarray, Tuple]:
        out = self._step_call(self._f32(crops), *leaves)
        return np.asarray(out[0]), tuple(out[1:])

    # -- device-resident loop (export-serving --device_loop HxW) ----------
    @property
    def has_device_loop(self) -> bool:
        return self._dstep is not None

    def _need_device_loop(self):
        if self._dstep is None:
            raise ValueError(
                "artifact has no device-resident loop; re-export with "
                "export-serving --device_loop HxW")

    def device_init(self, frames, bbox0, leaves) -> Tuple:
        """frames [B,H,W,3] raw RGB at the baked geometry, bbox0 [B,4]
        y1x1y2x2 in the tracker's /(dim-1) normalization -> state leaves."""
        self._need_device_loop()
        return tuple(self._dinit_call(
            self._f32(frames), self._f32(bbox0), *leaves))

    def device_step(self, frames, bbox, leaves):
        """-> (region [B,4] x,y,w,h px np.ndarray, next_bbox [B,4] jax
        array, state leaves). next_bbox stays on device: it feeds straight
        back into the next device_step."""
        self._need_device_loop()
        out = self._dstep_call(self._f32(frames), self._f32(bbox), *leaves)
        return np.asarray(out[0]), out[1], tuple(out[2:])
