"""Fleet tracking: many simultaneous tracks in one batched device step.

The serving-scale counterpart of StreamingTracker: N independent tracks
share ONE jitted frame step (crops [N,224,224,3] -> offsets [N,2] + batched
state), so the chip amortizes the VGG + NTM work across the fleet — this is
exactly the configuration the headline benchmark measures (~7950 tracked
frames/s/chip at N=256 on v5e, BENCH_r02.json). Host-side crop/decode geometry stays per-track
(cheap numpy).

Tracks are slot-based: `add(image, region)` claims a slot, `step(images)`
advances every active track one frame, `remove(i)` frees a slot (its state
is reset to the learnable initial state so it can be reused). The batch
width is fixed at construction (static shapes for jit); inactive slots are
fed zero crops and their outputs ignored.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import TrackerConfig
from ntm_tracker_tpu.data import geometry
from ntm_tracker_tpu.data.image_ops import crop_and_resize_mm
from ntm_tracker_tpu.models.core import MemoryCore, make_core
from ntm_tracker_tpu.models.vgg import VGG_MEAN
from ntm_tracker_tpu.tracking.tracker import (
    build_frame_step,
    decode_head,
    decode_region,
    first_frame_gt,
    region_geometry,
)


@dataclasses.dataclass
class _Track:
    image_size: Tuple[int, int]
    normalized_bbox: Any = None
    cropbox: Any = None
    transformation: Any = None


class FleetTracker:
    """N-slot batched streaming tracker."""

    def __init__(
        self,
        cfg: TrackerConfig,
        vgg_params: Any,
        params: Any,
        capacity: int = 16,
        core: Optional[MemoryCore] = None,
        delimiter_first: bool = False,
        mesh: Any = None,
        serving_model: Any = None,
    ):
        """mesh: optional jax.sharding.Mesh — shards the slot axis over its
        devices so the fleet step runs SPMD across the local chips (each
        chip serves capacity/n_devices tracks; GSPMD propagates the batch
        sharding from the crop/state operands through the jitted step).

        serving_model: a tools/export_serving.ServingModel exported with
        --batch == capacity — the AOT programs replace the jitted steps
        (vgg_params/params/core unused); build via FleetTracker.from_serving."""
        self.cfg = cfg
        self.capacity = capacity
        self._serving = serving_model
        self.params = params
        self._sharding = None
        if mesh is not None:
            if serving_model is not None:
                raise ValueError(
                    "mesh-sharded fleets need the jitted step (GSPMD "
                    "propagation); AOT artifacts bake an unsharded program")
            n_dev = int(mesh.devices.size)
            if capacity % n_dev:
                raise ValueError(
                    f"capacity {capacity} must divide over the {n_dev}-device mesh"
                )
            from ntm_tracker_tpu.parallel.mesh import batch_sharding

            self._sharding = batch_sharding(mesh)
        if serving_model is not None:
            baked = serving_model.meta.get("batch")
            if baked != capacity:
                raise ValueError(
                    f"serving artifact bakes batch {baked} but fleet "
                    f"capacity is {capacity}; use FleetTracker.from_serving "
                    "(capacity comes from the file) or re-export with "
                    f"export-serving --batch {capacity}")
            self.core = core  # unused; kept for introspection only
            self._init_full = serving_model.init_state()  # leaves at capacity
            self._step_first = serving_model.first  # baked at B=1
            self._step_rest = serving_model.step  # baked at B=capacity
        else:
            self.core = core or make_core(cfg)
            self._init_full = None
            self._step_first, self._step_rest = build_frame_step(
                cfg, self.core, vgg_params, params,
                donate_state=False, delimiter_first=delimiter_first,
            )
        d = cfg.data
        # separable-matmul crop: the gather form's full-frame HBM gathers
        # were the r3 device-loop gap (tools/probe_devloop.py). HIGHEST
        # keeps it f32-exact vs the gather sampler (1.2e-7 of full scale;
        # HIGH's 4.2e-5 residue tripped the r4 drift tripwire through the
        # NTM recrop feedback) and measures within 1% of HIGH on the
        # closed loop — correctness is free here.
        self._crop_jit = jax.jit(
            lambda imgs, boxes: crop_and_resize_mm(
                imgs.astype(jnp.float32) - jnp.asarray(VGG_MEAN),
                boxes, (d.crop_size, d.crop_size),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        self.state = self._shard(self._fresh_state(capacity))
        self._tracks: List[Optional[_Track]] = [None] * capacity

    @classmethod
    def from_serving(cls, model):
        """Fleet-serve an AOT artifact (export-serving --batch N): capacity,
        geometry, token order, weights and programs all come from the file —
        no model code, no weights, no compile."""
        from ntm_tracker_tpu.tools.export_serving import config_from_meta

        meta = model.meta
        if meta.get("first_batch") != 1:
            raise ValueError(
                "artifact predates fleet serving (its first-frame program "
                "is not batch-1); re-export with export-serving --batch "
                f"{meta['batch']}")
        return cls(config_from_meta(meta), None, None,
                   capacity=meta["batch"],
                   delimiter_first=meta["delimiter_first"],
                   serving_model=model)

    def _fresh_state(self, n: int):
        """Learnable initial state for n slots. Serving artifacts bake it at
        capacity; every leaf is the same learnable state broadcast along the
        slot axis, so n < capacity is a slice."""
        if self._serving is not None:
            if n == self.capacity:
                return self._init_full
            return jax.tree.map(lambda l: l[:n], self._init_full)
        return self.core.init_state(self.params, n)

    def _shard(self, tree):
        if self._sharding is None:
            return tree
        return jax.tree.map(lambda x: jax.device_put(x, self._sharding), tree)

    # -- slot management ----------------------------------------------------
    def _slot_geometry(self, t: _Track, region_xywh):
        t.normalized_bbox, t.cropbox, t.transformation = region_geometry(
            self.cfg.data, t.image_size, region_xywh
        )

    def add(self, image: np.ndarray, region_xywh) -> int:
        """Claim a slot and present the target-indicated first frame."""
        slot = next(
            (i for i, t in enumerate(self._tracks) if t is None), None
        )
        if slot is None:
            raise RuntimeError("fleet is full")
        h, w, _ = image.shape
        t = _Track(image_size=(w, h))
        self._slot_geometry(t, region_xywh)
        self._tracks[slot] = t

        crop = self._crop_jit(
            jnp.asarray(image[None]), jnp.asarray([t.cropbox], jnp.float32)
        )
        gt = first_frame_gt(self.cfg, t.normalized_bbox, t.transformation)

        # run the first-frame step at B=1 (the jit specializes per shape, so
        # this costs one track's compute, not a full-capacity VGG pass) and
        # merge that slot's state into the fleet batch
        fresh1 = self._fresh_state(1)
        _, stepped1 = self._step_first(
            crop, jnp.asarray(gt.reshape(1, -1)), fresh1
        )
        self.state = jax.tree.map(
            lambda cur, new: cur.at[slot].set(new[0])
            if hasattr(cur, "at") else cur,
            self.state, stepped1,
        )
        return slot

    def remove(self, slot: int) -> None:
        self._tracks[slot] = None
        fresh = self._fresh_state(self.capacity)
        self.state = jax.tree.map(
            lambda cur, new: cur.at[slot].set(new[slot])
            if hasattr(cur, "at") else cur,
            self.state, fresh,
        )

    @property
    def active(self) -> List[int]:
        return [i for i, t in enumerate(self._tracks) if t is not None]

    # -- stepping -------------------------------------------------------------
    def step(self, images: Dict[int, np.ndarray]) -> Dict[int, tuple]:
        """Advance every track one frame. images: slot -> HxWx3 frame
        (frames may differ in size across slots). Returns slot -> region."""
        d = self.cfg.data
        # group same-shaped frames into batched crop calls and keep every
        # crop on device — no host round trip between cropping and stepping
        by_shape: Dict[tuple, list] = {}
        for i in self.active:
            if i in images:
                by_shape.setdefault(images[i].shape, []).append(i)
        zero_crop = jnp.zeros((d.crop_size, d.crop_size, 3), jnp.float32)
        crop_list: List[Any] = [zero_crop] * self.capacity
        for shape, slots in by_shape.items():
            imgs = jnp.asarray(np.stack([images[i] for i in slots]))
            boxes = jnp.asarray(
                np.stack([self._tracks[i].cropbox for i in slots]), jnp.float32
            )
            crops = self._crop_jit(imgs, boxes)
            for j, i in enumerate(slots):
                crop_list[i] = crops[j]
        batch = jnp.stack(crop_list)
        if self._sharding is not None:
            batch = jax.device_put(batch, self._sharding)
        prev_state = self.state
        offsets, self.state = self._step_rest(batch, self.state)
        offsets = np.asarray(offsets)

        # active tracks NOT given a frame this step must keep their previous
        # recurrent state (the batched step advanced every slot, feeding the
        # omitted ones a zero crop they should never see)
        skipped = [i for i in self.active if i not in images]
        if skipped:
            idx = jnp.asarray(skipped)
            self.state = jax.tree.map(
                lambda new, old: new.at[idx].set(old[idx])
                if hasattr(new, "at") else new,
                self.state, prev_state,
            )

        out: Dict[int, tuple] = {}
        init_bbox = geometry.initial_transformed_bbox(d.cropbox_grid, d.bbox_grid)
        for i in self.active:
            if i not in images:
                continue
            t = self._tracks[i]
            new_bbox = decode_head(self.cfg, init_bbox, offsets[i])
            region = decode_region(t.transformation, t.image_size, new_bbox)
            self._slot_geometry(t, region)
            out[i] = region
        return out
