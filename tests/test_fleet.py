"""FleetTracker: batched multi-track serving matches single-track results."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import DataConfig, NTMConfig, TrackerConfig, TrainConfig
from ntm_tracker_tpu.models.core import make_core
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.tracking.fleet import FleetTracker
from ntm_tracker_tpu.tracking.tracker import StreamingTracker


def tiny_cfg():
    return TrackerConfig(
        core="ntm",
        ntm=NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=1, sequence_length=2),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )


def setup():
    cfg = tiny_cfg()
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    core = make_core(cfg)
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
    return cfg, vgg, core, params


class TestFleet:
    def test_matches_single_tracker(self):
        cfg, vgg, core, params = setup()
        rng = np.random.RandomState(0)
        img_a = (rng.rand(100, 160, 3) * 255).astype(np.uint8)
        img_b = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
        region_a = (60.0, 30.0, 40.0, 30.0)
        region_b = (40.0, 20.0, 30.0, 24.0)

        fleet = FleetTracker(cfg, vgg, params, capacity=4, core=core)
        sa = fleet.add(img_a, region_a)
        sb = fleet.add(img_b, region_b)
        out = fleet.step({sa: img_a, sb: img_b})

        ta = StreamingTracker(cfg, vgg, params, core)
        ta.init(img_a, region_a)
        ra = ta.track(img_a)
        tb = StreamingTracker(cfg, vgg, params, core)
        tb.init(img_b, region_b)
        rb = tb.track(img_b)

        np.testing.assert_allclose(out[sa], ra, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(out[sb], rb, rtol=1e-3, atol=1e-2)

    def test_slot_reuse_and_isolation(self):
        cfg, vgg, core, params = setup()
        rng = np.random.RandomState(1)
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        fleet = FleetTracker(cfg, vgg, params, capacity=2, core=core)
        s0 = fleet.add(img, (30.0, 20.0, 20.0, 16.0))
        s1 = fleet.add(img, (50.0, 30.0, 20.0, 16.0))
        assert sorted([s0, s1]) == [0, 1]
        fleet.remove(s0)
        assert fleet.active == [s1]
        # slot is reusable
        s2 = fleet.add(img, (10.0, 10.0, 20.0, 16.0))
        assert s2 == s0
        out = fleet.step({s1: img, s2: img})
        assert set(out.keys()) == {s1, s2}
        for r in out.values():
            assert np.isfinite(r).all()

    def test_capacity_enforced(self):
        cfg, vgg, core, params = setup()
        img = np.zeros((64, 96, 3), np.uint8)
        fleet = FleetTracker(cfg, vgg, params, capacity=1, core=core)
        fleet.add(img, (30.0, 20.0, 20.0, 16.0))
        import pytest

        with pytest.raises(RuntimeError, match="full"):
            fleet.add(img, (10.0, 10.0, 20.0, 16.0))


def test_skipped_track_state_preserved():
    """An active track omitted from step()'s images must keep its state."""
    cfg, vgg, core, params = setup()
    rng = np.random.RandomState(2)
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    fleet = FleetTracker(cfg, vgg, params, capacity=2, core=core)
    s0 = fleet.add(img, (30.0, 20.0, 20.0, 16.0))
    s1 = fleet.add(img, (50.0, 30.0, 20.0, 16.0))
    m_before = np.asarray(fleet.state["M"][s1]).copy()
    fleet.step({s0: img})  # s1 active but not stepped
    np.testing.assert_array_equal(np.asarray(fleet.state["M"][s1]), m_before)
    # stepped track's state DID change
    assert not np.allclose(np.asarray(fleet.state["M"][s0]), m_before)


class TestFleetMesh:
    def test_sharded_fleet_matches_meshless(self):
        """A mesh-sharded fleet (slot axis over the 8 virtual devices)
        produces the same regions as the single-device fleet, with state
        actually distributed one-slot-per-device."""
        from ntm_tracker_tpu.parallel.mesh import make_mesh

        cfg, vgg, core, params = setup()
        rng = np.random.RandomState(3)
        imgs = [(rng.rand(64, 96, 3) * 255).astype(np.uint8) for _ in range(3)]
        regions = [(20.0 + 4 * i, 12.0, 24.0, 20.0) for i in range(3)]

        mesh = make_mesh()
        sharded = FleetTracker(cfg, vgg, params, capacity=8, core=core, mesh=mesh)
        plain = FleetTracker(cfg, vgg, params, capacity=8, core=core)
        slots_s = [sharded.add(im, r) for im, r in zip(imgs, regions)]
        slots_p = [plain.add(im, r) for im, r in zip(imgs, regions)]

        # the recurrent state really is sharded across the mesh
        m_state = sharded.state["M"] if isinstance(sharded.state, dict) else None
        assert m_state is not None
        assert len(m_state.addressable_shards) == 8
        assert m_state.addressable_shards[0].data.shape[0] == 1

        out_s = sharded.step({s: im for s, im in zip(slots_s, imgs)})
        out_p = plain.step({s: im for s, im in zip(slots_p, imgs)})
        for ss, sp in zip(slots_s, slots_p):
            np.testing.assert_allclose(out_s[ss], out_p[sp], rtol=1e-4, atol=1e-4)
        # sharding survives the step and the skipped-slot state restore
        assert len(sharded.state["M"].addressable_shards) == 8

    def test_capacity_must_divide_mesh(self):
        from ntm_tracker_tpu.parallel.mesh import make_mesh

        cfg, vgg, core, params = setup()
        import pytest

        with pytest.raises(ValueError, match="divide"):
            FleetTracker(cfg, vgg, params, capacity=6, core=core,
                         mesh=make_mesh())
