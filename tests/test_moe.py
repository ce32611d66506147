"""MoE layer + expert parallelism (framework capability; SURVEY §2.6 notes
the reference is dense — EP ships as the remaining first-class mode).

Pins: (1) dense one-hot dispatch == a per-token python oracle when nothing
overflows; (2) capacity drops overflow tokens (output falls back to 0 for
them); (3) EP-sharded forward/backward == unsharded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aki_tpu.models.moe import MoEConfig, init_moe, moe_mlp
from aki_tpu.parallel.mesh import MeshConfig, create_mesh

D = 16


def _oracle(params, x, cfg):
    """Per-token loop, no capacity limit (set factor high in the test)."""
    b, t, d = x.shape
    xf = np.asarray(x, np.float64).reshape(-1, d)
    rw = np.asarray(params["router"]["w"], np.float64)
    probs = jax.nn.softmax(jnp.asarray(xf @ rw), axis=-1)
    probs = np.asarray(probs)
    out = np.zeros_like(xf)
    for n in range(xf.shape[0]):
        idx = np.argsort(-probs[n])[: cfg.top_k]
        gates = probs[n][idx] / probs[n][idx].sum()
        for g, e in zip(gates, idx):
            wg = np.asarray(params["w_gate"][e], np.float64)
            wu = np.asarray(params["w_up"][e], np.float64)
            wd = np.asarray(params["w_down"][e], np.float64)
            gate = xf[n] @ wg
            up = xf[n] @ wu
            h = gate / (1 + np.exp(-gate)) * up
            out[n] += g * (h @ wd)
    return out.reshape(b, t, d)


def test_moe_matches_per_token_oracle():
    cfg = MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                    capacity_factor=4.0)   # no overflow
    params = init_moe(jax.random.PRNGKey(0), D, cfg, 0.2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, D), jnp.float32)
    out, aux = moe_mlp(params, x, cfg)
    want = _oracle(params, x, cfg)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_capacity_drops_overflow():
    """With capacity 1 token/expert, most tokens overflow; the layer must
    still be finite and dropped tokens contribute zero output."""
    cfg = MoEConfig(num_experts=2, top_k=1, intermediate_size=8,
                    capacity_factor=0.01)
    params = init_moe(jax.random.PRNGKey(1), D, cfg, 0.2)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, D), jnp.float32)
    out, aux = moe_mlp(params, x, cfg)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # capacity = ceil(8 * 1 * 0.01 / 2) = 1 slot per expert -> at most 2
    # tokens produce nonzero output
    nonzero_rows = (np.abs(out[0]).max(-1) > 1e-9).sum()
    assert nonzero_rows <= 2, nonzero_rows


def test_moe_phi3_decoder_trains():
    """Phi3Config(moe=...) swaps the MLP for the routed mixture: forward
    produces finite logits + aux, and a few SGD steps on a copy task
    decrease the loss (router + experts both receive gradients)."""
    import optax

    from aki_tpu.models.configs import Phi3Config
    from aki_tpu.models.phi3 import init_phi3, phi3_forward

    cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=16,
        moe=MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                      capacity_factor=2.0),
    )
    params = init_phi3(jax.random.PRNGKey(0), cfg)
    assert "moe" in params["layers"] and "w_gate" not in params["layers"]

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 64, size=(4, 12))
    emb_ids = jnp.asarray(ids)
    positions = jnp.broadcast_to(jnp.arange(12)[None], (4, 12))
    labels = jnp.asarray(ids)

    def loss_fn(p):
        embeds = p["embed"]["table"][emb_ids]
        hidden, _, aux = phi3_forward(
            p, cfg, embeds, positions, use_flash=False, with_aux=True,
        )
        logits = jnp.einsum("btd,vd->btv", hidden, p["embed"]["table"])
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(
            logp, labels[:, 1:, None], axis=-1
        ).mean()
        return nll + 0.01 * aux, aux

    opt = optax.sgd(0.5)
    opt_state = opt.init(params)
    losses = []
    step = jax.jit(lambda p, s: _sgd_step(p, s, loss_fn, opt))
    for _ in range(6):
        params, opt_state, l, aux = step(params, opt_state)
        losses.append(float(l))
        assert np.isfinite(float(l)) and np.isfinite(float(aux))
    assert losses[-1] < losses[0], losses


def _sgd_step(p, s, loss_fn, opt):
    (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    import optax

    updates, s = opt.update(g, s, p)
    return optax.apply_updates(p, updates), s, l, aux


def test_moe_aux_reaches_the_training_step():
    """The Switch aux loss must flow through the STANDARD training path
    (make_train_step over an AKI config with a MoE decoder) — regression
    for aux being reachable only via hand-called phi3_forward."""
    import dataclasses

    import optax

    from aki_tpu.models.aki import init_aki
    from aki_tpu.models.common import F32
    from aki_tpu.models.configs import aki_tiny
    from aki_tpu.train.step import Batch, TrainState, make_train_step

    base = aki_tiny()
    cfg = dataclasses.replace(
        base, phi3=dataclasses.replace(
            base.phi3,
            moe=MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                          capacity_factor=2.0),
        ),
    )
    params = init_aki(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, t = 4, 14
    ids = rng.randint(5, cfg.initial_tokenizer_len - 1, size=(b, t))
    ids[:, 1] = cfg.media_token_id
    ids[:, 8] = cfg.assistant_token_id
    labels = ids.copy()
    labels[:, :9] = -100
    s = cfg.siglip.image_size
    batch = Batch(
        input_ids=jnp.array(ids),
        images=jnp.array(rng.randn(b, s, s, 3).astype(np.float32)),
        attn_valid=jnp.ones((b, t), jnp.int32),
        labels=jnp.array(labels),
    )
    opt = optax.sgd(1e-2)

    def run(aux_w):
        state = TrainState.create(jax.tree.map(jnp.copy, params), opt)
        step = jax.jit(make_train_step(
            cfg, opt, policy=F32, use_flash=False, moe_aux_weight=aux_w,
        ))
        state, m = step(state, batch)
        router = np.asarray(state.params["phi3"]["layers"]["moe"]["router"]["w"])
        return float(m["loss"]), router

    l0, r0 = run(0.0)
    l1, r1 = run(0.5)
    assert np.isfinite(l0) and np.isfinite(l1)
    # aux term changes both the reported loss and the router update
    assert l1 > l0, (l0, l1)
    assert np.abs(r1 - r0).max() > 0, "aux produced no router gradient"


def test_moe_expert_parallel_matches_unsharded():
    cfg = MoEConfig(num_experts=8, top_k=2, intermediate_size=32,
                    capacity_factor=2.0)
    params = init_moe(jax.random.PRNGKey(2), D, cfg, 0.2)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 8, D), jnp.float32)

    def loss(p, x, mesh=None):
        out, aux = moe_mlp(p, x, cfg, mesh=mesh)
        return jnp.sum(jnp.sin(out)) + 0.01 * aux

    ref_l, ref_g = jax.value_and_grad(loss)(params, x)

    mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=1, expert=8))
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "router" in name:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(leaf, NamedSharding(mesh, P("expert")))

    p_sh = jax.tree_util.tree_map_with_path(shard, params)
    with mesh:
        l, g = jax.jit(jax.value_and_grad(
            lambda p, x: loss(p, x, mesh=mesh)))(p_sh, x)
    np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-5)
    for k in ("w_gate", "w_down"):
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(ref_g[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )


def test_moe_scatter_matches_dense_with_overflow():
    """The scatter dispatch (default; O(N*k*D) movement) must reproduce
    the dense one-hot oracle EXACTLY — same routing, same cumsum
    positions, same drops — including under capacity overflow, in both
    the forward and the gradients."""
    cfg = MoEConfig(num_experts=4, top_k=2, intermediate_size=32,
                    capacity_factor=0.6)   # forces drops
    params = init_moe(jax.random.PRNGKey(3), D, cfg, 0.2)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 12, D), jnp.float32)

    def loss(p, x, dispatch):
        out, aux = moe_mlp(p, x, cfg, dispatch=dispatch)
        return jnp.sum(jnp.sin(out)) + 0.01 * aux, out

    (ls, outs), gs = jax.value_and_grad(loss, has_aux=True)(
        params, x, "scatter")
    (ld, outd), gd = jax.value_and_grad(loss, has_aux=True)(
        params, x, "dense")
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-6)
    for k in ("w_gate", "w_up", "w_down"):
        np.testing.assert_allclose(np.asarray(gs[k]), np.asarray(gd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(gs["router"]["w"]),
                               np.asarray(gd["router"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_moe_4b_geometry_abstract_lowering():
    """4B-width MoE decoder at a realistic token count (8 x 1280 = 10240
    tokens/step) lowers abstractly on an expert mesh — the dense one-hot
    dispatch's (N, k, E, C) transient alone would be 10240^2 * 4 / 8 * ...
    GB-scale; the scatter path must trace with static shapes and without
    materializing any N^2 intermediate (eval_shape pins the program
    builds; the transient claim is pinned by the dispatch math itself)."""
    import dataclasses

    from aki_tpu.models.configs import aki_4b
    from aki_tpu.models.phi3 import init_phi3, phi3_forward

    base = aki_4b().phi3
    cfg = dataclasses.replace(
        base, num_layers=2,
        moe=MoEConfig(num_experts=8, top_k=2, intermediate_size=8192,
                      capacity_factor=1.25),
    )
    b, t = 8, 1280
    params = jax.eval_shape(lambda k: init_phi3(k, cfg),
                            jax.random.PRNGKey(0))
    embeds = jax.ShapeDtypeStruct((b, t, cfg.hidden_size), jnp.bfloat16)
    positions = jax.ShapeDtypeStruct((b, t), jnp.int32)

    out = jax.eval_shape(
        lambda p, e, pos: phi3_forward(p, cfg, e, pos, use_flash=False,
                                       with_aux=True),
        params, embeds, positions,
    )
    hidden = out[0]
    assert hidden.shape == (b, t, cfg.hidden_size)
