"""Fused train-mode ReparamConv branches (ops/pallas/rc_train) vs the plain
XLA branch graph: forward values, batch stats, and ALL gradients (VERDICT
round-2 item 1: grad parity <= 1e-5 against the XLA vjp).

Interpret mode — the compiled path is exercised on TPU by bench/train.
Reference semantics: core/modules.py:586-600 (4 dw branches + BN + sum).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


import jax
import jax.numpy as jnp

from lmnet_tpu.ops.pallas.rc_train import (
    _flat_branch_weights,
    _rc_ref_jnp,
    rc_branch_act,
    rc_branch_stats,
)


def _make_inputs(rng, B, H, W, C, dtype=np.float32):
    e = rng.randn(B, H, W * C).astype(dtype)
    k5 = (rng.randn(5, 5, 1, C) * 0.3).astype(np.float32)
    k3 = (rng.randn(3, 3, 1, C) * 0.3).astype(np.float32)
    kv = (rng.randn(3, 1, 1, C) * 0.3).astype(np.float32)
    kh3 = (rng.randn(1, 3, 1, C) * 0.3).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.randn(4, C)).astype(np.float32)
    beta = (0.1 * rng.randn(4, C)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (e, k5, k3, kv, kh3, gamma, beta))


@pytest.mark.parametrize("hw", [(8, 8), (16, 4), (32, 16)])
def test_rc_branch_stats_matches_conv_stats(rng, hw):
    """The stats kernel's per-branch sums/sumsqs == stats of the actual
    branch conv outputs."""
    H, W = hw
    C, B = 6, 2
    e, k5, k3, kv, kh3, gamma, beta = _make_inputs(rng, B, H, W, C)
    wflat = _flat_branch_weights((k5, k3, kv, kh3), W)
    stats8 = rc_branch_stats(e, wflat, C, interpret=True)
    s = np.asarray(stats8).reshape(8, W, C).sum(axis=1)

    e4 = np.asarray(e).reshape(B, H, W, C)
    for i, k in enumerate((k5, k3, kv, kh3)):
        kh, kw = k.shape[0], k.shape[1]
        y = jax.lax.conv_general_dilated(
            jnp.asarray(e4), k, (1, 1),
            [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        y = np.asarray(y)
        np.testing.assert_allclose(
            s[2 * i], y.sum((0, 1, 2)), rtol=1e-4, atol=1e-4, err_msg=f"sum b{i}"
        )
        np.testing.assert_allclose(
            s[2 * i + 1], (y * y).sum((0, 1, 2)), rtol=1e-4, atol=1e-4,
            err_msg=f"sumsq b{i}",
        )


def test_rc_branch_act_forward_matches_ref(rng):
    """Combined-kernel forward == branch-wise XLA reference (t, sums, stats)."""
    B, H, W, C = 2, 16, 8, 4
    e, k5, k3, kv, kh3, gamma, beta = _make_inputs(rng, B, H, W, C)
    t, sums, mu, var = rc_branch_act(
        e, k5, k3, kv, kh3, gamma, beta, C, 1e-5, True
    )
    t_ref, sums_ref = _rc_ref_jnp(e, k5, k3, kv, kh3, gamma, beta, C, 1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(sums_ref), rtol=1e-4, atol=1e-4
    )
    # stats match the per-branch conv stats
    e4 = e.reshape(B, H, W, C)
    for i, k in enumerate((k5, k3, kv, kh3)):
        kh, kw = k.shape[0], k.shape[1]
        y = np.asarray(jax.lax.conv_general_dilated(
            e4, k, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        ))
        np.testing.assert_allclose(
            np.asarray(mu)[i], y.mean((0, 1, 2)), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(var)[i], y.var((0, 1, 2)), rtol=1e-3, atol=1e-5
        )


def test_rc_branch_act_grads_match_xla_vjp(rng):
    """d(e), d(k_i), d(gamma), d(beta) == grads of the unfused XLA graph,
    through a loss touching both t and the SE channel sums."""
    B, H, W, C = 2, 8, 4, 4
    e, k5, k3, kv, kh3, gamma, beta = _make_inputs(rng, B, H, W, C)

    def loss_fused(e, k5, k3, kv, kh3, gamma, beta):
        t, sums, _, _ = rc_branch_act(e, k5, k3, kv, kh3, gamma, beta, C, 1e-5, True)
        return jnp.sum(t**2) + jnp.sum(jnp.sin(sums))

    def loss_ref(e, k5, k3, kv, kh3, gamma, beta):
        t, sums = _rc_ref_jnp(e, k5, k3, kv, kh3, gamma, beta, C, 1e-5)
        return jnp.sum(t**2) + jnp.sum(jnp.sin(sums))

    args = (e, k5, k3, kv, kh3, gamma, beta)
    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ("de", "dk5", "dk3", "dkv", "dkh", "dgamma", "dbeta")
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=n
        )


def test_reparamconv_remat_grad_parity(rng):
    """nn.remat(ReparamConv, static_argnums=(2,)) == plain ReparamConv:
    identical param tree and (up to reassociation) identical grads.

    This pins the ``rc_remat`` wiring in models/lm_net.py: LMNet wraps each
    ReparamConv in nn.remat during training so the backward pass recomputes
    the 4 depthwise branches instead of spilling their activations (which
    at B=128/256² pushes XLA into compressed-remat copies the core idles on).
    """
    import flax.linen as nn

    from lmnet_tpu.models.blocks import ReparamConv

    x = jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32)
    ct = jnp.asarray(rng.randn(2, 16, 16, 12), jnp.float32)

    def run(cls):
        m = cls(18, 12, 5, 3, deploy=False)
        params = m.init(jax.random.key(0), x, True)

        def loss(p, x):
            out, _ = m.apply(p, x, True, mutable=["batch_stats"])
            return jnp.sum(out * ct)

        return params, jax.jit(jax.grad(loss))(params, x)

    p1, g1 = run(nn.remat(ReparamConv, static_argnums=(2,)))
    p2, g2 = run(ReparamConv)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g1, g2,
    )


def test_lmnet_natt_remat_grad_parity(rng):
    """LMNet(natt_remat=True) — nn.remat around each NeighborhoodTransformer
    block — matches the unremat'ed model's grads and param tree. The knob
    trades NATT-block recompute for HBM at large train batches
    (perf/remat_wide_ab.py)."""
    from lmnet_tpu.models.lm_net import LMNet

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)

    def grads(natt_remat):
        model = LMNet(num_classes=2, natt_remat=natt_remat)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True
        )

        def loss(p, x):
            out, _ = model.apply(
                p, x, train=True, rngs={"dropout": jax.random.key(3)},
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        # Param grads (argnums=0) are what training actually consumes — they
        # exercise remat's interaction with dropout rngs and BN mutation;
        # input grads (argnums=1) cover the data path.
        gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        return params, gp, gx

    p1, gp1, gx1 = grads(True)
    p2, gp2, gx2 = grads(False)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        gp1, gp2,
    )


def test_lmnet_rc_remat_branches_policy(rng):
    """LMNet(rc_remat='branches') — the save_only_these_names('rc_expand')
    policy — matches the unremat'ed model's grads, and its backward actually
    saves the expand conv output: one fewer recomputed conv per RC block
    than rc_remat=True in the grad jaxpr."""
    from lmnet_tpu.models.lm_net import LMNet

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)

    def grads(mode):
        model = LMNet(num_classes=2, rc_remat=mode)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True
        )

        def loss(p, x):
            out, _ = model.apply(
                p, x, train=True, rngs={"dropout": jax.random.key(3)},
                mutable=["batch_stats"],
            )
            logits = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        gfn = jax.grad(loss, argnums=1)
        nconvs = str(jax.make_jaxpr(gfn)(params, x)).count("conv_general_dilated")
        return jax.jit(gfn)(params, x), nconvs

    g_plain, n_plain = grads(False)
    g_br, n_br = grads("branches")
    # 16 RC blocks; full remat recomputes the expand conv, 'branches' keeps it
    assert n_br < n_plain + 16 * 7, (n_br, n_plain)
    np.testing.assert_allclose(
        np.asarray(g_br), np.asarray(g_plain), rtol=1e-4, atol=1e-4
    )


def test_reparamconv_module_fused_matches_xla(rng):
    """blocks.ReparamConv(rc_train_backend='fused') == backend 'xla': same
    output, same grads, same updated batch_stats (full module semantics:
    expand/BN/hswish -> branches -> SE -> pointwise + shortcut)."""
    from lmnet_tpu.models.blocks import ReparamConv

    B, H, W, Cin = 2, 8, 16, 3
    ec = 8  # W * ec = 128
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)

    def build(backend):
        m = ReparamConv(ec, Cin, rc_train_backend=backend)
        v = m.init(jax.random.key(0), x, train=False)
        return m, v

    m_x, v_x = build("xla")
    m_f, v_f = build("fused")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_x, v_f,
    )

    def run(m, v):
        def loss_fn(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
        return loss, mut, grads

    loss_x, mut_x, g_x = run(m_x, v_x)
    loss_f, mut_f, g_f = run(m_f, v_f)
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        mut_f, mut_x,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g_f, g_x,
    )


def test_reparamconv_module_packed_matches_xla(rng):
    """blocks.ReparamConv(rc_train_backend='packed') — the single grouped
    conv with zero-padded 5x5 kernels (VERDICT r3 ask #6) — == backend
    'xla': same output, same grads, same updated batch_stats."""
    from lmnet_tpu.models.blocks import ReparamConv

    B, H, W, Cin = 2, 8, 9, 3
    ec = 6
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)

    def build(backend):
        m = ReparamConv(ec, Cin, rc_train_backend=backend)
        v = m.init(jax.random.key(0), x, train=False)
        return m, v

    m_x, v_x = build("xla")
    m_p, v_p = build("packed")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_x, v_p,
    )

    def run(m, v):
        def loss_fn(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
        return loss, mut, grads

    loss_x, mut_x, g_x = run(m_x, v_x)
    loss_p, mut_p, g_p = run(m_p, v_p)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        mut_p, mut_x,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g_p, g_x,
    )
