"""Feature-cache path: precomputed frozen-VGG tokens == the every-step VGG
path (same loss, same gradients), staleness detection, flip variant.

The cache is a NEW capability over the reference (which re-ran its frozen
VGG graph every step, direct_offset_output.py:417-428); correctness here
means the cached path is indistinguishable from the direct one.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.data.feature_cache import (
    build_feature_cache,
    load_token_batch,
    read_manifest,
    token_batch_iterator,
    verify_cache,
)
from ntm_tracker_tpu.data.loader import batch_iterator
from ntm_tracker_tpu.data.sequences import get_valid_sequences
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.train.experiments import OffsetExperiment

from tests.test_experiment import tiny_cfg

SEQ_LEN = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Frame records (.txt/.bin on-disk contract, preprocess.py:329-334)
    with real JPEGs, at the tiny test geometry (2x2 gt grid)."""
    from PIL import Image

    root = str(tmp_path_factory.mktemp("ds"))
    img_dir = os.path.join(root, "imgs", "train_seq00")
    seq_dir = os.path.join(root, "cropped", "train_seq00_0")
    os.makedirs(img_dir)
    os.makedirs(seq_dir)
    rng = np.random.RandomState(7)
    for i in range(6):
        arr = (rng.rand(360, 640, 3) * 255).astype(np.uint8)
        img_path = os.path.join(img_dir, f"{i:06d}.JPEG")
        Image.fromarray(arr).save(img_path, quality=95)
        crop = [0.2 + 0.01 * i, 0.25, 0.8 + 0.01 * i, 0.85]
        bbox = [0.125, 0.125, 0.875, 0.875]
        yo, xo = 0.02 * i, -0.015 * i
        with open(os.path.join(seq_dir, f"{i:06d}.txt"), "w") as f:
            f.write(",".join(
                [str(v) for v in crop] + [str(v) for v in bbox]
                + [img_path, str(yo), str(xo)]
            ))
        gt = rng.rand(2, 2)
        (gt / gt.sum()).astype(np.float64).tofile(
            os.path.join(seq_dir, f"{i:06d}.bin")
        )
    return os.path.join(root, "cropped")


def _build(dataset, cache_dir, cfg, vgg, **kw):
    seq_dirs = [
        os.path.join(dataset, x) for x in sorted(os.listdir(dataset))
    ]
    return build_feature_cache(
        cfg, vgg, seq_dirs, cache_dir, gt_width=cfg.data.gt_width, **kw
    )


class TestFeatureCache:
    def test_cached_tokens_and_loss_match_direct_path(self, dataset, tmp_path):
        cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        cache = str(tmp_path / "cache")
        man = _build(dataset, cache, cfg, vgg,
                     store_dtype="float32", frames_per_batch=4)
        assert man["num_frames"] == 6
        verify_cache(cfg, cache, vgg_params=vgg)

        _, train_seqs, _ = get_valid_sequences(dataset, SEQ_LEN)
        fb = next(batch_iterator(
            train_seqs, 1, cfg.data.gt_width, shuffle=False,
            decode_resize_hw=tuple(cfg.data.resize_hw),
        ))
        tb = next(token_batch_iterator(
            train_seqs, 1, cache, cfg.data.gt_width, shuffle=False,
        ))
        # record fields ride along unchanged
        np.testing.assert_array_equal(tb.gts, fb.gts)
        np.testing.assert_array_equal(tb.y_offsets, fb.y_offsets)
        np.testing.assert_array_equal(tb.x_offsets, fb.x_offsets)

        exp = OffsetExperiment(cfg, vgg, image_mode="resized")
        image_batch = {
            "images": jnp.asarray(fb.images),
            "cropboxes": jnp.asarray(fb.cropboxes),
            "gts": jnp.asarray(fb.gts),
            "y_offsets": jnp.asarray(fb.y_offsets),
            "x_offsets": jnp.asarray(fb.x_offsets),
        }
        token_batch = {
            "features": jnp.asarray(tb.features),
            "gts": jnp.asarray(tb.gts),
            "y_offsets": jnp.asarray(tb.y_offsets),
            "x_offsets": jnp.asarray(tb.x_offsets),
        }
        # eager vs jitted conv stacks fuse differently -> ~1e-4 relative
        # float noise; the contract is float-level equivalence, not bitwise
        direct = np.asarray(exp.batch_features(image_batch))
        scale = np.abs(direct).max()
        np.testing.assert_allclose(
            direct.reshape(tb.features.shape), tb.features,
            rtol=1e-4, atol=1e-4 * scale,
        )

        # the full training contract: identical loss AND gradients
        params, _ = exp.init(jax.random.PRNGKey(1))
        (l_img, _), g_img = jax.value_and_grad(exp.loss_fn, has_aux=True)(
            params, image_batch
        )
        (l_tok, _), g_tok = jax.value_and_grad(exp.loss_fn, has_aux=True)(
            params, token_batch
        )
        np.testing.assert_allclose(float(l_img), float(l_tok), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(g_img), jax.tree.leaves(g_tok)):
            a, b = np.asarray(a), np.asarray(b)
            gs = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3 * gs)

    def test_float16_storage_is_close(self, dataset, tmp_path):
        cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        c32 = str(tmp_path / "c32")
        c16 = str(tmp_path / "c16")
        _build(dataset, c32, cfg, vgg, store_dtype="float32",
               frames_per_batch=3)
        _build(dataset, c16, cfg, vgg, store_dtype="float16",
               frames_per_batch=3)
        _, seqs, _ = get_valid_sequences(dataset, SEQ_LEN)
        frames = [os.path.join(seqs[0][0], f) for f in seqs[0][1]]
        t32 = load_token_batch(frames, cfg.data.gt_width, c32)
        t16 = load_token_batch(frames, cfg.data.gt_width, c16)
        assert t16.features.dtype == np.float16
        scale = np.abs(t32.features).max()
        np.testing.assert_allclose(
            t16.features.astype(np.float32), t32.features,
            atol=2e-3 * max(scale, 1.0),
        )

    def test_stale_fingerprint_rejected(self, dataset, tmp_path):
        cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
        vgg_a = init_vgg_params(jax.random.PRNGKey(0))
        vgg_b = init_vgg_params(jax.random.PRNGKey(99))
        cache = str(tmp_path / "cache")
        _build(dataset, cache, cfg, vgg_a, frames_per_batch=6)
        verify_cache(cfg, cache, vgg_params=vgg_a)
        with pytest.raises(ValueError, match="stale"):
            verify_cache(cfg, cache, vgg_params=vgg_b)
        # manifest-only check still catches shape mismatches
        import dataclasses

        bad = dataclasses.replace(cfg, num_features=9)
        with pytest.raises(ValueError, match="tokens"):
            verify_cache(bad, cache)
        # vgg_int8 changes token VALUES: an exact-path cache must read as
        # stale under an int8 config (and vice versa)
        with pytest.raises(ValueError, match="stale"):
            verify_cache(dataclasses.replace(cfg, vgg_int8=True), cache,
                         vgg_params=vgg_a)

    def test_missing_cache_reports_command(self, tmp_path):
        cfg = tiny_cfg("ntm")
        with pytest.raises(FileNotFoundError, match="cache-features"):
            read_manifest(str(tmp_path / "nope"))

    def test_flip_variant(self, dataset, tmp_path):
        cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        cache = str(tmp_path / "cache")
        _build(dataset, cache, cfg, vgg, store_dtype="float32",
               frames_per_batch=6)
        _build(dataset, cache, cfg, vgg, store_dtype="float32",
               frames_per_batch=6, flip=True)
        _, seqs, _ = get_valid_sequences(dataset, SEQ_LEN)
        frames = [os.path.join(seqs[0][0], f) for f in seqs[0][1]]
        base = load_token_batch(frames, cfg.data.gt_width, cache)
        flip = load_token_batch(frames, cfg.data.gt_width, cache,
                                reverse_image=True)
        # mirrored crops -> different tokens; offsets mirror in x only
        assert np.abs(base.features - flip.features).max() > 1e-3
        np.testing.assert_array_equal(base.y_offsets, flip.y_offsets)
        np.testing.assert_array_equal(base.x_offsets, -flip.x_offsets)
        # the flipped tokens equal the direct path on flipped frames
        from ntm_tracker_tpu.data.loader import load_frame_batch

        fb = load_frame_batch(
            frames, cfg.data.gt_width, reverse_image=True,
            decode_resize_hw=tuple(cfg.data.resize_hw),
        )
        exp = OffsetExperiment(cfg, vgg, image_mode="resized")
        direct = np.asarray(exp.batch_features({
            "images": jnp.asarray(fb.images),
            "cropboxes": jnp.asarray(fb.cropboxes),
        }))
        scale = np.abs(direct).max()
        np.testing.assert_allclose(
            direct.reshape(flip.features.shape), flip.features,
            rtol=1e-4, atol=1e-4 * scale,
        )


    def test_sharded_build_matches_single_device(self, dataset, tmp_path):
        """--shard: the mesh-sharded build (batch split over the 8-device
        CPU mesh) writes float-equivalent token files to the single-device
        build (tokens are per-frame, so sharding is pure data parallelism;
        the partitioned conv schedules differently, so the contract is the
        same float-level one as eager-vs-jit above, not bitwise)."""
        from ntm_tracker_tpu.parallel.mesh import make_mesh

        cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        solo = str(tmp_path / "solo")
        shard = str(tmp_path / "shard")
        _build(dataset, solo, cfg, vgg, store_dtype="float32",
               frames_per_batch=4)
        mesh = make_mesh(batch_size=4)
        assert mesh.devices.size > 1  # conftest forces the 8-device mesh
        man = _build(dataset, shard, cfg, vgg, store_dtype="float32",
                     frames_per_batch=4, mesh=mesh)
        assert man["num_frames"] == 6
        _, seqs, _ = get_valid_sequences(dataset, SEQ_LEN)
        frames = [os.path.join(seqs[0][0], f) for f in seqs[0][1]]
        a = load_token_batch(frames, cfg.data.gt_width, solo)
        b = load_token_batch(frames, cfg.data.gt_width, shard)
        scale = np.abs(a.features).max()
        np.testing.assert_allclose(
            b.features, a.features, rtol=1e-4, atol=1e-4 * scale
        )

    def test_sharded_build_rejects_indivisible_batch(self, dataset, tmp_path):
        from ntm_tracker_tpu.parallel.mesh import make_mesh

        cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        mesh = make_mesh()  # all 8 devices
        if mesh.devices.size < 2:
            pytest.skip("needs a multi-device mesh")
        with pytest.raises(ValueError, match="must divide"):
            _build(dataset, str(tmp_path / "c"), cfg, vgg,
                   frames_per_batch=3, mesh=mesh)


def test_duplicate_sequence_basenames_rejected(tmp_path):
    """Cache entries are keyed by sequence-dir basename; two dirs sharing a
    basename under different parents would silently collide — refused."""
    cfg = tiny_cfg("ntm", batch=1, seq_len=SEQ_LEN)
    a = tmp_path / "rootA" / "seq00"
    b = tmp_path / "rootB" / "seq00"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    with pytest.raises(ValueError, match="duplicate basenames"):
        build_feature_cache(
            cfg, None, [str(a), str(b)], str(tmp_path / "cache"),
            gt_width=cfg.data.gt_width,
        )


def test_flip_rejected_with_device_resize():
    """Library-level guard: flip must follow the host resize (the TF1 grid
    is not flip-equivariant), so reverse_image + decode_resize_hw=None is
    an error rather than a silent sub-pixel parity break."""
    from ntm_tracker_tpu.data.loader import load_frame_batch

    with pytest.raises(ValueError, match="flip-equivariant"):
        load_frame_batch(["x"], 2, reverse_image=True, decode_resize_hw=None)
