"""REAL multi-process data parallelism: two JAX processes (4 CPU devices
each) rendezvous through jax.distributed, assemble process-local batches
into a global 8-way-sharded batch, and take one DP train step — the full
multi-host code path (parallel/distributed.py), not a single-process
simulation. Both processes must agree with each other AND with a
single-process 8-device run of the same global step."""

import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # drop the machine's axon sitecustomize preimport and any forced flags
    env.pop("PYTHONPATH", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


def test_two_process_dp_step_matches_single_process():
    # (hard stop comes from communicate(timeout=240) below)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker_dp.py")
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-3000:]
        m = re.search(r"RESULT loss=([0-9.eE+-]+) psum=([0-9.eE+-]+)", out)
        assert m, out[-3000:]
        results.append((float(m.group(1)), float(m.group(2))))

    # both processes see the identical replicated result
    (l0, s0), (l1, s1) = results
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert s0 == pytest.approx(s1, rel=1e-6)

    # and it matches the single-process 8-device step on the same batch
    from ntm_tracker_tpu.config import (
        DataConfig, NTMConfig, TrackerConfig, TrainConfig,
    )
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.parallel.mesh import make_mesh, parallel_train_step, shard_batch
    from ntm_tracker_tpu.train.experiments import (
        OffsetExperiment,
        synthetic_offset_batch,
    )
    import jax.numpy as jnp

    cfg = TrackerConfig(
        core="ntm",
        ntm=NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=8, sequence_length=2),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )
    vgg_params = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg_params, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    mesh = make_mesh()
    pstep = parallel_train_step(exp.make_train_step(), mesh, donate_argnums=())
    batch = shard_batch(mesh, synthetic_offset_batch(cfg, np.random.RandomState(0)))
    new_params, _o, metrics = pstep(params, opt_state, batch)
    ref_loss = float(metrics["loss"])
    ref_sum = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(new_params)
    )
    assert l0 == pytest.approx(ref_loss, rel=1e-5)
    assert s0 == pytest.approx(ref_sum, rel=1e-5)
