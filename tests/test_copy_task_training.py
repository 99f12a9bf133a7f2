"""The minimum end-to-end trainability slice: the NTM learns the copy-paste
task (SURVEY.md §7 stage 2 artifact; reference main.py:1540-1644).
Also the canonical verify flow (.claude/skills/verify/SKILL.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import init_ntm_params
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
from ntm_tracker_tpu.train.experiments import make_copy_paste_batch


def test_ntm_learns_copy_task():
    WIDTH, LENGTH, BATCH = 3, 6, 16
    cfg = NTMConfig(output_dim=WIDTH + 1, mem_size=32, mem_dim=8,
                    controller_hidden_size=64, controller_num_layers=1,
                    read_head_size=1, write_head_size=1, init_scale=0.1)
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, WIDTH + 1)
    opt = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.rmsprop(3e-3, decay=0.95, momentum=0.9),
    )
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        _, logits, _ = ntm_tracker_unroll(p, cfg, x)
        return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2)

    @jax.jit
    def step(p, s, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    rng = np.random.RandomState(42)
    losses = []
    for _ in range(250):
        x, y = make_copy_paste_batch(rng, BATCH, WIDTH, LENGTH)
        params, opt_state, l = step(params, opt_state, jnp.array(x), jnp.array(y))
        losses.append(float(l))

    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.5, (first, last)

    # recall-bit accuracy beats chance
    x, y = make_copy_paste_batch(np.random.RandomState(7), BATCH, WIDTH, LENGTH)
    _, logits, _ = ntm_tracker_unroll(params, cfg, jnp.array(x))
    pred = np.asarray(jax.nn.sigmoid(logits))
    recall = slice(LENGTH + 1, 2 * LENGTH + 1)
    acc = ((pred[:, recall, :WIDTH] > 0.5) == (y[:, recall, :WIDTH] > 0.5)).mean()
    assert acc > 0.65, acc
