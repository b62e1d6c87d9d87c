"""Block-level golden tests against torch-CPU oracles with transplanted
weights — the strongest parity evidence short of running the reference
itself (whose NATTEN dependency is not installable here).

Each oracle is written from the documented equations (SURVEY §2.2-2.8), not
from the reference source; weights are copied from our Flax params into the
torch modules and outputs compared in eval mode.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from lmnet_tpu.models import blocks


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def _from_t(y):
    return np.transpose(y.detach().numpy(), (0, 2, 3, 1))


def _conv_w(flax_kernel):
    # HWIO -> OIHW
    return torch.from_numpy(np.transpose(np.asarray(flax_kernel), (3, 2, 0, 1)))


def _load_conv(tconv, p):
    tconv.weight.data = _conv_w(p["conv"]["kernel"])
    if tconv.bias is not None:
        tconv.bias.data = torch.from_numpy(np.asarray(p["conv"]["bias"]))


def _load_bn(tbn, p, s):
    tbn.weight.data = torch.from_numpy(np.asarray(p["scale"]))
    tbn.bias.data = torch.from_numpy(np.asarray(p["bias"]))
    tbn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]))
    tbn.running_var.data = torch.from_numpy(np.asarray(s["var"]))


@pytest.fixture(autouse=True)
def exact_gelu():
    # torch oracles use tanh GELU to match the framework default
    yield


def test_reparam_conv_matches_torch_oracle(rng):
    cin, e, cout = 3, 8, 4
    m = blocks.ReparamConv(expand_channels=e, out_channels=cout)
    x = jnp.asarray(rng.randn(2, 12, 12, cin), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    import flax

    vs = flax.core.unfreeze(vs)
    # randomize BN stats so the BN branch is non-trivial
    for name in ("expand_bn", "large_bn", "square_bn", "ver_bn", "hor_bn"):
        st = vs["batch_stats"][name]
        st["mean"] = jnp.asarray(rng.normal(0, 0.3, st["mean"].shape), jnp.float32)
        st["var"] = jnp.asarray(rng.uniform(0.5, 1.5, st["var"].shape), jnp.float32)
    ours = np.asarray(m.apply(vs, x, train=False))

    p, s = vs["params"], vs["batch_stats"]

    # torch oracle of the documented train graph (SURVEY §2.2)
    expand = tnn.Conv2d(cin, e, 1)
    bn_e = tnn.BatchNorm2d(e).eval()
    convs = {
        "large": tnn.Conv2d(e, e, 5, padding=2, groups=e, bias=False),
        "square": tnn.Conv2d(e, e, 3, padding=1, groups=e, bias=False),
        "ver": tnn.Conv2d(e, e, (3, 1), padding=(1, 0), groups=e, bias=False),
        "hor": tnn.Conv2d(e, e, (1, 3), padding=(0, 1), groups=e, bias=False),
    }
    bns = {k: tnn.BatchNorm2d(e).eval() for k in convs}
    se_fc1 = tnn.Conv2d(e, e // 4, 1)
    se_fc2 = tnn.Conv2d(e // 4, e, 1)
    pw = tnn.Conv2d(e, cout, 1)
    sc = tnn.Conv2d(cin, cout, 1)

    _load_conv(expand, p["expand_conv"])
    _load_bn(bn_e, p["expand_bn"], s["expand_bn"])
    for k in convs:
        convs[k].weight.data = _conv_w(p[f"{k}_conv"]["conv"]["kernel"])
        _load_bn(bns[k], p[f"{k}_bn"], s[f"{k}_bn"])
    se_fc1.weight.data = _conv_w(p["se"]["fc1"]["kernel"])
    se_fc1.bias.data = torch.from_numpy(np.asarray(p["se"]["fc1"]["bias"]))
    se_fc2.weight.data = _conv_w(p["se"]["fc2"]["kernel"])
    se_fc2.bias.data = torch.from_numpy(np.asarray(p["se"]["fc2"]["bias"]))
    _load_conv(pw, p["pointwise_conv"])
    _load_conv(sc, p["shortcut"])

    with torch.no_grad():
        xt = _t(x)
        e1 = torch.nn.functional.hardswish(bn_e(expand(xt)))
        branch = sum(bns[k](convs[k](e1)) for k in convs)
        g = torch.nn.functional.gelu(branch, approximate="tanh")
        pooled = g.mean(dim=(2, 3), keepdim=True)
        scale = torch.nn.functional.hardsigmoid(
            se_fc2(torch.relu(se_fc1(pooled)))
        )
        y = pw(g * scale) + sc(xt)
    np.testing.assert_allclose(ours, _from_t(y), rtol=1e-4, atol=1e-5)


def test_m3skip_matches_torch_oracle(rng):
    m = blocks.M3Skip((4, 8, 12))
    xl = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)
    xm = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
    xs = jnp.asarray(rng.randn(1, 4, 4, 12), jnp.float32)
    vs = m.init(jax.random.key(0), xl, xm, xs)
    ours = np.asarray(m.apply(vs, xl, xm, xs, train=False))

    p, s = vs["params"], vs["batch_stats"]
    convl = tnn.Conv2d(4, 8, 3, stride=2, padding=1)
    convm = tnn.Conv2d(8, 8, 3, padding=1)
    convs_ = tnn.Conv2d(12, 8, 3, padding=1)
    fuse = tnn.Conv2d(24, 8, 3, padding=1)
    bn = tnn.BatchNorm2d(8).eval()
    _load_conv(convl, p["convl"])
    _load_conv(convm, p["convm"])
    _load_conv(convs_, p["convs"])
    _load_conv(fuse, p["fuse_conv"])
    _load_bn(bn, p["fuse_bn"], s["fuse_bn"])
    with torch.no_grad():
        a = convl(_t(xl))
        b = convm(_t(xm))
        up = torch.nn.functional.interpolate(
            _t(xs), scale_factor=2, mode="bilinear", align_corners=True
        )
        c = convs_(up)
        y = torch.nn.functional.gelu(
            bn(fuse(torch.cat([a, b, c], dim=1))), approximate="tanh"
        )
    np.testing.assert_allclose(ours, _from_t(y), rtol=1e-4, atol=1e-5)


def test_global_attention_matches_torch_oracle(rng):
    dim, heads = 12, 3
    m = blocks.GlobalAttention(dim, heads)
    x = jnp.asarray(rng.randn(2, 10, dim), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    ours = np.asarray(m.apply(vs, x))

    p = vs["params"]
    qkv = tnn.Linear(dim, 3 * dim)
    proj = tnn.Linear(dim, dim)
    qkv.weight.data = torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T)
    qkv.bias.data = torch.from_numpy(np.asarray(p["qkv"]["bias"]))
    proj.weight.data = torch.from_numpy(np.asarray(p["proj"]["kernel"]).T)
    proj.bias.data = torch.from_numpy(np.asarray(p["proj"]["bias"]))
    with torch.no_grad():
        xt = torch.from_numpy(np.asarray(x))
        B, N, C = xt.shape
        hd = C // heads
        q, k, v = qkv(xt).reshape(B, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
        attn = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1)
        y = proj((attn @ v).transpose(1, 2).reshape(B, N, C))
    np.testing.assert_allclose(ours, y.numpy(), rtol=1e-4, atol=1e-5)


def test_m3skip_exact_gelu_matches_torch_oracle(rng):
    """The erf-GELU path (gelu_exact=True — torch nn.GELU default,
    reference core/modules.py:574) against torch's exact GELU."""
    m = blocks.M3Skip((4, 8, 12), gelu_exact=True)
    xl = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)
    xm = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
    xs = jnp.asarray(rng.randn(1, 4, 4, 12), jnp.float32)
    vs = m.init(jax.random.key(0), xl, xm, xs)
    ours = np.asarray(m.apply(vs, xl, xm, xs, train=False))

    p, s = vs["params"], vs["batch_stats"]
    convl = tnn.Conv2d(4, 8, 3, stride=2, padding=1)
    convm = tnn.Conv2d(8, 8, 3, padding=1)
    convs_ = tnn.Conv2d(12, 8, 3, padding=1)
    fuse = tnn.Conv2d(24, 8, 3, padding=1)
    bn = tnn.BatchNorm2d(8).eval()
    _load_conv(convl, p["convl"])
    _load_conv(convm, p["convm"])
    _load_conv(convs_, p["convs"])
    _load_conv(fuse, p["fuse_conv"])
    _load_bn(bn, p["fuse_bn"], s["fuse_bn"])
    with torch.no_grad():
        a = convl(_t(xl))
        b = convm(_t(xm))
        up = torch.nn.functional.interpolate(
            _t(xs), scale_factor=2, mode="bilinear", align_corners=True
        )
        c = convs_(up)
        y = torch.nn.functional.gelu(bn(fuse(torch.cat([a, b, c], dim=1))))
    np.testing.assert_allclose(ours, _from_t(y), rtol=1e-4, atol=1e-5)


def test_lmnet_gelu_exact_flag_changes_output(rng):
    """gelu_exact is a real config field threading to every block (no
    mutable module globals): flipping it changes the forward slightly."""
    from lmnet_tpu.models import LMNet

    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    vs = LMNet(num_classes=2).init(jax.random.key(0), x, train=False)
    y_tanh = LMNet(num_classes=2).apply(vs, x, train=False)
    y_erf = LMNet(num_classes=2, gelu_exact=True).apply(vs, x, train=False)
    diff = float(jnp.max(jnp.abs(y_tanh - y_erf)))
    assert 0 < diff < 1e-1, diff
