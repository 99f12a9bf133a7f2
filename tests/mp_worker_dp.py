"""Worker for test_multiprocess_dp.py: one JAX process of a 2-process x
4-device CPU fleet, running ONE data-parallel train step through the
repo's actual multi-host plumbing (initialize_distributed,
process_shard_sequences split semantics, global_batch_from_local,
parallel_train_step). Prints 'RESULT loss=<x> psum=<y>' for the test to
compare across processes and against the single-process reference.

Not a pytest file (no test_ prefix): launched via subprocess with a clean
environment (no axon sitecustomize preimport).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ntm_tracker_tpu.parallel.distributed import (
        global_batch_from_local,
        initialize_distributed,
        process_shard_sequences,
    )

    assert initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    from ntm_tracker_tpu.config import (
        DataConfig, NTMConfig, TrackerConfig, TrainConfig,
    )
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.parallel.mesh import make_mesh, parallel_train_step
    from ntm_tracker_tpu.train.experiments import (
        OffsetExperiment,
        synthetic_offset_batch,
    )

    cfg = TrackerConfig(
        core="ntm",
        ntm=NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=4 * nproc, sequence_length=2),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )
    vgg_params = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg_params, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))

    # every process materializes the same global batch (same seed), then
    # keeps only the rows its own devices will hold (mesh order = process
    # order); this mirrors a per-host loader reading a disjoint shard
    full = synthetic_offset_batch(cfg, np.random.RandomState(0))
    rows = full["images"].shape[0]
    per = rows // nproc
    local = {k: v[pid * per : (pid + 1) * per] for k, v in full.items()}

    # the dataset-shard helper agrees with the live topology
    assert process_shard_sequences(list(range(10)))[:1] == [pid]

    mesh = make_mesh()
    pstep = parallel_train_step(exp.make_train_step(), mesh, donate_argnums=())
    batch = global_batch_from_local(mesh, local)
    new_params, _opt, metrics = pstep(params, opt_state, batch)
    psum = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(new_params)
    )
    print(f"RESULT loss={float(metrics['loss']):.8f} psum={psum:.6f}", flush=True)


if __name__ == "__main__":
    main()
