"""NTM cell contract tests (shapes, invariants, gradients, streaming parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import (
    head_param_sizes,
    init_ntm_params,
    init_ntm_state,
    ntm_cell_step,
)
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll

CFG = NTMConfig(
    output_dim=4, mem_size=16, mem_dim=8, controller_hidden_size=32,
    controller_num_layers=2, read_head_size=2, write_head_size=1,
)
INPUT = 10


def make():
    params = init_ntm_params(jax.random.PRNGKey(0), CFG, INPUT)
    state = init_ntm_state(params, CFG, batch=3)
    return params, state


class TestNTMCell:
    def test_head_param_sizes_match_reference_unpack(self):
        # ntm_cell.py:113-126 with H=R+W heads
        sizes = head_param_sizes(CFG)
        h = CFG.num_heads
        assert sizes == {
            "k": CFG.mem_dim * h, "beta": h, "g": h,
            "sw": (2 * CFG.shift_range + 1) * h, "gamma": h,
            "erase": CFG.mem_dim * CFG.write_head_size,
            "add": CFG.mem_dim * CFG.write_head_size,
        }

    def test_step_shapes(self):
        params, state = make()
        x = jnp.ones((3, INPUT))
        out, logit, new_state = ntm_cell_step(params, CFG, x, state)
        assert out.shape == (3, CFG.output_dim)
        assert logit.shape == (3, CFG.output_dim)
        assert new_state["M"].shape == (3, CFG.mem_size, CFG.mem_dim)
        assert new_state["w"].shape == (3, CFG.num_heads, CFG.mem_size)
        assert new_state["read"].shape == (3, CFG.read_head_size, CFG.mem_dim)

    def test_output_is_softmax_of_logit(self):
        params, state = make()
        x = jnp.ones((3, INPUT))
        out, logit, _ = ntm_cell_step(params, CFG, x, state)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jax.nn.softmax(logit, -1)), rtol=1e-6
        )

    def test_weights_near_normalized(self):
        # sharpening divides by (sum + 1e-3) so head weights sum to slightly
        # under 1 (ntm_cell.py:175-176)
        params, state = make()
        x = jnp.ones((3, INPUT)) * 0.3
        _, _, s = ntm_cell_step(params, CFG, x, state)
        sums = np.asarray(s["w"].sum(-1))
        assert np.all(sums <= 1.0 + 1e-5)
        assert np.all(sums > 0.9)

    def test_initial_state_squashing(self):
        # ntm_cell.py:292-308: M,read in (-1,1); w in (0,1); broadcast over batch
        params, state = make()
        assert np.all(np.abs(np.asarray(state["M"])) < 1.0)
        assert np.all((np.asarray(state["w"]) > 0) & (np.asarray(state["w"]) < 1))
        np.testing.assert_array_equal(
            np.asarray(state["M"][0]), np.asarray(state["M"][1])
        )

    def test_write_changes_memory(self):
        params, state = make()
        x = jnp.ones((3, INPUT))
        _, _, s1 = ntm_cell_step(params, CFG, x, state)
        assert not np.allclose(np.asarray(s1["M"]), np.asarray(state["M"]))

    def test_write_first_reads_from_new_memory(self):
        cfg_wf = NTMConfig(**{**CFG.__dict__, "write_first": True})
        params, state = make()
        x = jnp.ones((3, INPUT))
        _, _, s_rf = ntm_cell_step(params, CFG, x, state)
        _, _, s_wf = ntm_cell_step(params, cfg_wf, x, state)
        # same write weights/memory but different reads
        np.testing.assert_allclose(np.asarray(s_rf["M"]), np.asarray(s_wf["M"]), rtol=1e-6)
        assert not np.allclose(np.asarray(s_rf["read"]), np.asarray(s_wf["read"]))

    def test_gradients_flow_through_long_scan(self):
        params, _ = make()
        T = 12
        x = jax.random.normal(jax.random.PRNGKey(1), (2, T, INPUT))

        def loss(p):
            _, logits, _ = ntm_tracker_unroll(p, CFG, x)
            return jnp.sum(jnp.tanh(logits) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # every parameter (incl. learnable initial state) gets gradient
        nonzero = [float(jnp.abs(g).sum()) for g in leaves]
        assert all(v > 0 for v in nonzero), nonzero


class TestUnrollStreamingParity:
    def test_scan_equals_stepwise(self):
        """The jitted scan must match token-by-token stepping — this is the
        contract that lets training (scan) and online tracking (streaming)
        share parameters (test_tracker.py:284-299 vs ntm_tracker_new.py)."""
        params, state = make()
        T = 7
        x = jax.random.normal(jax.random.PRNGKey(2), (3, T, INPUT))
        outs_scan, logits_scan, final_scan = ntm_tracker_unroll(
            params, CFG, x, state=jax.tree.map(lambda a: a, state)
        )
        s = state
        logits_steps = []
        for t in range(T):
            _, logit, s = ntm_cell_step(params, CFG, x[:, t], s)
            logits_steps.append(logit)
        np.testing.assert_allclose(
            np.asarray(logits_scan),
            np.asarray(jnp.stack(logits_steps, axis=1)),
            rtol=2e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(final_scan["M"]), np.asarray(s["M"]), rtol=2e-5, atol=1e-6
        )

    def test_remat_matches_no_remat(self):
        params, _ = make()
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, INPUT))
        _, l1, _ = ntm_tracker_unroll(params, CFG, x, remat=True)
        _, l2, _ = ntm_tracker_unroll(params, CFG, x, remat=False)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


class TestDnLayout:
    """The transposed-memory training layout (ntm_cell_step_dn) is a pure
    perf transformation: same math as ntm_cell_step up to float
    reassociation."""

    import pytest as _pytest

    @_pytest.mark.parametrize(
        "write_first,slotwise",
        [(False, False), (True, False), (False, True)],
    )
    def test_step_matches_reference_layout(self, write_first, slotwise):
        import dataclasses

        from ntm_tracker_tpu.models.ntm_cell import (
            ntm_cell_step_dn,
            state_from_dn,
            state_to_dn,
        )

        cfg = dataclasses.replace(
            CFG, write_first=write_first, slotwise_cosine=slotwise
        )
        params = init_ntm_params(jax.random.PRNGKey(2), cfg, INPUT)
        state = init_ntm_state(params, cfg, batch=3)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.uniform(-1, 1, (3, INPUT)).astype(np.float32))
        # start from a non-trivial state (one reference step)
        _, _, state = ntm_cell_step(params, cfg, x, state)

        out_a, logit_a, new_a = ntm_cell_step(params, cfg, x, state)
        out_b, logit_b, new_b_dn = ntm_cell_step_dn(
            params, cfg, x, state_to_dn(state)
        )
        new_b = state_from_dn(new_b_dn)
        np.testing.assert_allclose(out_a, out_b, atol=1e-6)
        np.testing.assert_allclose(logit_a, logit_b, atol=1e-6)
        for key in ("M", "w", "read"):
            np.testing.assert_allclose(
                new_a[key], new_b[key], atol=1e-6, err_msg=key
            )

    def test_unroll_layouts_agree_with_grads(self):
        params = init_ntm_params(jax.random.PRNGKey(3), CFG, INPUT)
        rs = np.random.RandomState(1)
        xs = jnp.asarray(rs.uniform(-1, 1, (2, 9, INPUT)).astype(np.float32))

        def loss(p, layout):
            _, logits, final = ntm_tracker_unroll(
                p, CFG, xs, layout=layout
            )
            return jnp.mean(logits ** 2) + jnp.mean(final["M"] ** 2)

        (l_nd, g_nd) = jax.value_and_grad(lambda p: loss(p, "nd"))(params)
        (l_dn, g_dn) = jax.value_and_grad(lambda p: loss(p, "dn"))(params)
        np.testing.assert_allclose(float(l_nd), float(l_dn), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
            g_nd, g_dn,
        )
