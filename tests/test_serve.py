"""Serving engine and fused ReparamConv kernel equivalence tests (CPU,
Pallas interpreter mode for the fused kernels)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


from conftest import TINY, TINY_HW
from lmnet_tpu.models import LMNet, structural_reparam
from lmnet_tpu.models.blocks import ReparamConv
from lmnet_tpu.ops.pallas.rc_kernel import (
    _rc_xla,
    fold_rc_weights,
    fused_reparam_conv,
)
from lmnet_tpu.serve import deploy_forward


def _randomize_bn(vs, rng):
    vs = flax.core.unfreeze(vs)

    def walk(t):
        return {
            k: (
                walk(v)
                if isinstance(v, dict)
                else jnp.asarray(rng.uniform(0.5, 2.0, v.shape), jnp.float32)
                if k == "var"
                else jnp.asarray(rng.normal(0, 0.5, v.shape), jnp.float32)
            )
            for k, v in t.items()
        }

    vs["batch_stats"] = walk(vs["batch_stats"])
    return vs


@pytest.fixture(scope="module")
def deploy_vars(rng=np.random.RandomState(0)):
    m = LMNet(**TINY)
    x = jnp.zeros((2, TINY_HW, TINY_HW, 3))
    vs = jax.jit(lambda k: m.init(k, x, train=False))(jax.random.key(0))
    return structural_reparam(_randomize_bn(vs, rng))


def test_fused_rc_kernel_matches_block(rng):
    m = ReparamConv(expand_channels=8, out_channels=6)
    x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    vs = _randomize_bn(m.init(jax.random.key(0), x), rng)
    dv = structural_reparam(vs)
    md = ReparamConv(expand_channels=8, out_channels=6, deploy=True)
    ref = md.apply(dv, x, train=False)
    w = fold_rc_weights(dv["params"], dv["batch_stats"])
    out = fused_reparam_conv(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    # XLA fallback path agrees too
    out2 = _rc_xla(x, w)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_deploy_forward_matches_model(deploy_vars, rng):
    x = jnp.asarray(rng.randn(2, TINY_HW, TINY_HW, 3), jnp.float32)
    md = LMNet(**TINY, deploy=True)
    ref = jax.jit(lambda v, x: md.apply(v, x, train=False))(deploy_vars, x)
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="pallas", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_flat_rc_backend(deploy_vars, rng):
    """rc_backend='flat' (rc_flat fused dw+gelu+SE-sums kernel) through the
    full deploy graph matches the Flax deploy model."""
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    md = LMNet(**TINY, deploy=True)
    ref = jax.jit(lambda v, x: md.apply(v, x, train=False))(deploy_vars, x)
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="flat", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_xla_backend(deploy_vars, rng):
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    md = LMNet(**TINY, deploy=True)
    ref = jax.jit(lambda v, x: md.apply(v, x, train=False))(deploy_vars, x)
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_natt_int8(deploy_vars, rng):
    """The opt-in int8 NATT-interior path tracks the bf16 graph to within
    quantization noise (static-scale int8 is ~1-2% mean activation error;
    the logit map must stay close, not bit-exact)."""
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    ref = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla",
    )
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla", natt_int8=True,
    )
    r, o = np.asarray(ref), np.asarray(out)
    rel = np.abs(r - o).mean() / (np.abs(r).mean() + 1e-9)
    assert rel < 0.05, f"int8 interior drift too large: {rel}"


def test_autoselect_pick_fastest():
    """Pure winner selection: smallest mean step time; empty table falls
    back to the always-available XLA pair."""
    from lmnet_tpu.serve.engine import pick_fastest

    t = {("xla", "flat"): 0.010, ("flat", "flat"): 0.012, ("xla", "xla"): 0.011}
    assert pick_fastest(t) == ("xla", "flat")
    assert pick_fastest({}) == ("xla", "xla")


def test_autoselect_backends_injected_timer():
    """autoselect_backends with an injected time_fn: sweeps the candidate
    cross product, skips raising combos, picks the winner, and caches the
    choice per shape."""
    from lmnet_tpu.serve import engine

    engine._AUTOTUNE_CACHE.clear()
    calls = []

    def fake_time(rc, nat):
        calls.append((rc, nat))
        if rc == "flat":  # simulate an unsupported-shape failure
            raise ValueError("unsupported")
        return {"flat": 0.02, "xla": 0.01}[nat]

    x = jnp.zeros((1, 8, 8, 3), jnp.bfloat16)
    choice = engine.autoselect_backends({}, x, num_heads=2, time_fn=fake_time)
    assert choice == ("xla", "xla")
    assert set(calls) == {("xla", "flat"), ("xla", "xla"),
                          ("flat", "flat"), ("flat", "xla")}
    # second call with the same shape must hit the cache (no new timings)
    n = len(calls)
    assert engine.autoselect_backends({}, x, num_heads=2,
                                      time_fn=fake_time) == ("xla", "xla")
    assert len(calls) == n
    engine._AUTOTUNE_CACHE.clear()


def test_resolve_auto_pins_non_auto_slot():
    """_resolve_auto with only one slot 'auto' never times combos outside
    the pinned value of the other slot."""
    from lmnet_tpu.serve import engine

    engine._AUTOTUNE_CACHE.clear()
    calls = []

    def fake_time(rc, nat):
        calls.append((rc, nat))
        return 0.01 if rc == "flat" else 0.02

    x = jnp.zeros((1, 8, 8, 4), jnp.bfloat16)
    rc, nat = engine.autoselect_backends(
        {}, x, num_heads=2, rc_candidates=("xla", "flat"),
        nat_candidates=("xla",), time_fn=fake_time,
    )
    assert (rc, nat) == ("flat", "xla")
    assert all(n == "xla" for _, n in calls)
    engine._AUTOTUNE_CACHE.clear()


def test_serving_evaluate_auto_routes_through_autotune(deploy_vars, monkeypatch):
    """serving_evaluate(rc_backend='auto') resolves backends via the
    autotune exactly once (on the first batch) and runs with its choice."""
    from lmnet_tpu.serve import engine
    from lmnet_tpu.train.engine import create_train_state
    from lmnet_tpu.models import LMNet

    model = LMNet(**TINY)
    state = create_train_state(
        model, jax.random.key(0), (1, TINY_HW, TINY_HW, 3), steps_per_epoch=1
    )

    calls = []

    def fake_autoselect(dv, x, num_heads, **kw):
        calls.append(x.shape)
        return ("xla", "xla")

    monkeypatch.setattr(engine, "autoselect_backends", fake_autoselect)
    imgs = np.zeros((2, TINY_HW, TINY_HW, 3), np.float32)
    masks = np.zeros((2, TINY_HW, TINY_HW), np.uint8)
    loader = [(imgs, masks), (imgs, masks)]
    loss, metrics = engine.serving_evaluate(
        state, loader, num_classes=2, img_size=TINY_HW,
        rc_backend="auto", nat_backend="xla",
        num_heads=TINY["num_heads"],
    )
    assert len(calls) == 1  # resolved once, reused for every batch
    assert np.isfinite(loss)
    assert 0.0 <= metrics["iou"] <= 1.0


def test_deploy_forward_ln_fold(deploy_vars, rng):
    """ln_fold=True (LN affine folded into qkv/fc1 weights — pure deploy-time
    weight math, VERDICT r4 ask #4a) matches the unfolded graph to float
    tolerance. Measured e2e-NEUTRAL on v5e (perf/ln_fold_ab.py); kept as a
    tested opt-in."""
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    ref = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla",
    )
    out = deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla", ln_fold=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deploy_forward_skip_compose(deploy_vars, rng):
    """skip_compose=True (convl/convm/convs composed into the fuse conv —
    VERDICT r4 ask #4b) is interior-EXACT; only the outermost 1-px output
    ring of each skip's resolution may deviate (the two-pass form zero-pads
    the intermediate). The logits interior must match; the border ring must
    stay bounded."""
    x = jnp.asarray(rng.randn(1, TINY_HW, TINY_HW, 3), jnp.float32)
    ref = np.asarray(deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla",
    ))
    out = np.asarray(deploy_forward(
        deploy_vars, x, num_heads=TINY["num_heads"],
        nat_backend="xla", rc_backend="xla", skip_compose=True,
    ))
    # skips live at strides 1..8: a 1-px ring at the coarsest skip can touch
    # up to 8 px of the full-res logits; the decoder's convs spread it a bit
    # further, so compare the deep interior exactly and bound the rest.
    m = 12
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], rtol=1e-3, atol=1e-3
    )
    assert np.abs(out - ref).max() < np.abs(ref).max() * 0.5 + 1.0
