"""Parity tests for the fused multi-head MLP Pallas kernel (interpret mode).

Reference semantics: GeneralMLP rank-0 (models/mlp.py:120-159) — embedded
input + feature concat, skip re-concat of the embedded input, leaky_relu on
every layer. The kernel must match forward AND all gradients (emb, feat,
every weight/bias) against jax.grad through an independent plain-JAX
replica of that math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatfields_tpu.ops import fused_mlp as fm


def _ref_head(head, emb, feat, w_tree):
    h_in = emb[:, :head.emb_cols]
    if feat is not None and feat.shape[1] > 0:
        h_in = jnp.concatenate([h_in, feat], axis=1)
    h = h_in
    for i, L in enumerate(head.layers):
        p = w_tree[head.name][f"net_{i}"]
        h = jax.nn.leaky_relu(h @ p["weight"] + p["bias"], 0.01)
        if L.skip_after:
            h = jnp.concatenate([h_in, h], axis=1)
    return h


def _make(plan, seed=0):
    rng = np.random.RandomState(seed)
    tree = {}
    for head in plan.heads:
        t = {}
        for i, L in enumerate(head.layers):
            t[f"net_{i}"] = {
                "weight": jnp.asarray(
                    rng.randn(L.fin, L.fout).astype(np.float32) * 0.3),
                "bias": jnp.asarray(
                    rng.randn(L.fout).astype(np.float32) * 0.1),
            }
        tree[head.name] = t
    return tree


@pytest.mark.parametrize("feat_dim", [6, 0])
def test_fused_heads_matches_reference(feat_dim):
    cfgs = [
        dict(name="a", emb_cols=15, hidden=16, depth=3, skips=(1,), out=3),
        dict(name="b", emb_cols=9, hidden=8, depth=2, skips=(20,), out=4),
    ]
    plan = fm.build_plan(cfgs, emb_dim=15, feat_dim=feat_dim)
    tree = _make(plan)
    rng = np.random.RandomState(3)
    n = 100  # not a multiple of block -> exercises padding
    emb = jnp.asarray(rng.randn(n, 15).astype(np.float32))
    feat = jnp.asarray(rng.randn(n, feat_dim).astype(np.float32))

    def run_fused(emb, feat, tree):
        w, b = fm.pack_params(tree, plan)
        return fm.fused_heads(plan, 32, jnp.float32, True, emb, feat, w, b)

    outs = run_fused(emb, feat, tree)
    refs = [_ref_head(h, emb, feat, tree) for h in plan.heads]
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)

    # gradients: random cotangents on every head output
    gs = [jnp.asarray(rng.randn(*r.shape).astype(np.float32)) for r in refs]

    def loss_fused(emb, feat, tree):
        outs = run_fused(emb, feat, tree)
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs))

    def loss_ref(emb, feat, tree):
        return sum(jnp.sum(_ref_head(h, emb, feat, tree) * g)
                   for h, g in zip(plan.heads, gs))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(emb, feat, tree)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(emb, feat, tree)
    for a, b_ in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_pack_unpack_roundtrip():
    cfgs = [dict(name="a", emb_cols=7, hidden=8, depth=2, skips=(0,), out=2)]
    plan = fm.build_plan(cfgs, emb_dim=7, feat_dim=3)
    tree = _make(plan)
    w, b = fm.pack_params(tree, plan)
    back = fm.unpack_grads(w, b, plan)
    for i, L in enumerate(plan.heads[0].layers):
        np.testing.assert_array_equal(
            np.asarray(back["a"][f"net_{i}"]["weight"]),
            np.asarray(tree["a"][f"net_{i}"]["weight"]))
        np.testing.assert_array_equal(
            np.asarray(back["a"][f"net_{i}"]["bias"]),
            np.asarray(tree["a"][f"net_{i}"]["bias"]))


@pytest.mark.parametrize("encoder", ["", "VarTriPlaneEncoder"])
def test_splatfields_fused_path_matches_flax(encoder):
    """SplatFields with fused_pallas='on' (interpret mode, f32) must match
    the flax layer-by-layer path — outputs and parameter gradients."""
    from splatfields_tpu.models.splatfields import SplatFields

    kw = dict(n_frames=0, radius=1.0, encoder_type=encoder,
              composition_rank=0, deform_w=32, deform_d=3, rgb_w=32,
              rgb_d=3, scale_w=16, scale_d=2, opacity_w=16, opacity_d=2,
              rotation_w=16, rotation_d=2, fused_block=64,
              deform_skips=(1,), rgb_skips=(1,), scale_skips=(1,),
              opacity_skips=(1,), rotation_skips=(20,))
    net_on = SplatFields(**kw, fused_pallas="on")
    net_off = SplatFields(**kw, fused_pallas="off")
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (150, 3)).astype(np.float32))
    variables = net_off.init(jax.random.PRNGKey(1), xyz)

    out_on = net_on.apply(variables, xyz)
    out_off = net_off.apply(variables, xyz)
    for k in ("means3D", "rgb", "scales", "opacity", "rotations"):
        np.testing.assert_allclose(
            np.asarray(out_on[k]), np.asarray(out_off[k]),
            atol=2e-5, err_msg=k)

    def loss(p, net):
        o = net.apply(dict(variables, params=p), xyz)
        return (jnp.sum(o["means3D"] ** 2) + jnp.sum(o["rgb"])
                + jnp.sum(o["scales"] * 0.1) + jnp.sum(o["opacity"])
                + jnp.sum(o["rotations"] * 0.2))

    g_on = jax.grad(loss)(variables["params"], net_on)
    g_off = jax.grad(loss)(variables["params"], net_off)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    for (pa, a), (pb, b) in zip(flat_on, flat_off):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(pa))
