"""FULL-GRAPH parity vs the actual reference source (/root/reference).

Runs the reference's ``core/LM_Net.py`` on torch-CPU with a drop-in NATTEN
substitute (NATTEN's CUDA op is not installable here; the substitute
implements the documented NATTEN semantics — clamped k x k windows +
relative position bias — and is itself pinned by tests/test_nat.py's
brute-force oracle, which our ops.nat matches). Flax weights are
transplanted into the torch model and eval-mode logits plus one CE+Dice
loss value are compared.

This is the strongest available Dice-parity proxy short of a real-dataset
run (no datasets/egress in this container): identical logits on identical
weights => identical Dice trajectories up to optimizer numerics.

Skipped when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "core")), reason="reference not mounted"
)


# ---------------------------------------------------------------------------
# import the reference with stubs for its uninstallable deps
# ---------------------------------------------------------------------------


class _NATSubstitute(tnn.Module):
    """Drop-in torch NeighborhoodAttention2D with NATTEN semantics.

    Same parameter surface as natten.NeighborhoodAttention2D (qkv/proj
    linears + rpb of shape (heads, 2k-1, 2k-1)); forward is NHWC clamped
    window attention — the same math as tests/test_nat.py::naive_nat,
    vectorized over window offsets.
    """

    def __init__(self, dim, num_heads=8, kernel_size=3, qkv_bias=True, **kw):
        super().__init__()
        self.num_heads = num_heads
        self.kernel_size = kernel_size
        self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = tnn.Linear(dim, dim)
        self.rpb = tnn.Parameter(
            torch.zeros(num_heads, 2 * kernel_size - 1, 2 * kernel_size - 1)
        )

    def forward(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        kk = self.kernel_size
        c = kk // 2
        heads = self.num_heads
        hd = C // heads
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q * hd**-0.5

        def window(t, oh, ow):
            t2 = t[:, oh : H - kk + 1 + oh, ow : W - kk + 1 + ow]
            t2 = t2.permute(0, 3, 1, 2)
            t2 = torch.nn.functional.pad(
                t2, (c, kk - 1 - c, c, kk - 1 - c), mode="replicate"
            )
            return t2.permute(0, 2, 3, 1)

        def rpb_idx(size, off):
            i = np.arange(size)
            key = np.clip(i - c, 0, size - kk) + off
            return torch.from_numpy(key - i + (kk - 1)).long()

        offsets = [(a, b) for a in range(kk) for b in range(kk)]
        logits = []
        for oh, ow in offsets:
            kw_ = window(k, oh, ow)
            l = (q.reshape(B, H, W, heads, hd) * kw_.reshape(B, H, W, heads, hd)).sum(-1)
            bias = self.rpb[:, rpb_idx(H, oh)][:, :, rpb_idx(W, ow)]  # (heads,H,W)
            logits.append(l + bias.permute(1, 2, 0)[None])
        L = torch.stack(logits, dim=-1)  # (B,H,W,heads,k*k)
        attn = torch.softmax(L, dim=-1)
        out = torch.zeros(B, H, W, heads, hd, dtype=x.dtype)
        for idx, (oh, ow) in enumerate(offsets):
            vw = window(v, oh, ow).reshape(B, H, W, heads, hd)
            out = out + attn[..., idx : idx + 1] * vw
        return self.proj(out.reshape(B, H, W, C))


def _install_stubs():
    from torch.nn.modules.utils import _pair

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.to_2tuple = _pair
        layers.trunc_normal_ = lambda t, std=1.0, **kw: torch.nn.init.trunc_normal_(
            t, std=std
        )

        class DropPath(tnn.Module):
            def forward(self, x):
                return x

        layers.DropPath = DropPath
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        for sub in ("deform_conv", "ps_roi_pool", "focal_loss"):
            m = types.ModuleType(f"torchvision.ops.{sub}")
            m.__all__ = []
            setattr(ops, sub, m)
            sys.modules[f"torchvision.ops.{sub}"] = m
        sys.modules["torchvision.ops.focal_loss"].sigmoid_focal_loss = None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops

    if "natten" not in sys.modules:
        natten = types.ModuleType("natten")
        natten.NeighborhoodAttention2D = _NATSubstitute
        sys.modules["natten"] = natten


def _load_reference_lmnet():
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from core.LM_Net import LM_Net  # noqa: the reference source itself

    return LM_Net


# ---------------------------------------------------------------------------
# Flax -> torch weight transplant
# ---------------------------------------------------------------------------


def _oihw(k):
    return torch.from_numpy(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _put_conv(sd, name, p):  # TorchConv {'conv': {kernel, bias}}
    sd[f"{name}.weight"] = _oihw(p["conv"]["kernel"])
    if "bias" in p["conv"]:
        sd[f"{name}.bias"] = _t(p["conv"]["bias"])


def _put_raw_conv(sd, name, p):  # plain nn.Conv {'kernel','bias'} (SE fc)
    sd[f"{name}.weight"] = _oihw(p["kernel"])
    sd[f"{name}.bias"] = _t(p["bias"])


def _put_bn(sd, name, p, s):
    sd[f"{name}.weight"] = _t(p["scale"])
    sd[f"{name}.bias"] = _t(p["bias"])
    sd[f"{name}.running_mean"] = _t(s["mean"])
    sd[f"{name}.running_var"] = _t(s["var"])


def _put_ln(sd, name, p):
    sd[f"{name}.weight"] = _t(p["scale"])
    sd[f"{name}.bias"] = _t(p["bias"])


def _put_dense(sd, name, p):  # TorchDense {'dense': {kernel, bias}}
    sd[f"{name}.weight"] = _t(np.asarray(p["dense"]["kernel"]).T)
    sd[f"{name}.bias"] = _t(p["dense"]["bias"])


def _put_rc(sd, tname, p, s):
    _put_conv(sd, f"{tname}.expand_conv.0", p["expand_conv"])
    _put_bn(sd, f"{tname}.expand_conv.1", p["expand_bn"], s["expand_bn"])
    for br in ("large", "square", "ver", "hor"):
        sd[f"{tname}.{br}_conv.conv.weight"] = _oihw(p[f"{br}_conv"]["conv"]["kernel"])
        _put_bn(sd, f"{tname}.{br}_conv.bn", p[f"{br}_bn"], s[f"{br}_bn"])
    _put_raw_conv(sd, f"{tname}.se.fc1", p["se"]["fc1"])
    _put_raw_conv(sd, f"{tname}.se.fc2", p["se"]["fc2"])
    _put_conv(sd, f"{tname}.pointwise_conv.0", p["pointwise_conv"])
    _put_conv(sd, f"{tname}.shortcut.0", p["shortcut"])


def _put_natt(sd, tname, p):
    _put_conv(sd, f"{tname}.patchembedding.patch_embeddings", p["embed"]["proj"])
    _put_ln(sd, f"{tname}.norm1", p["norm1"])
    _put_dense(sd, f"{tname}.att1.qkv", p["attn"]["qkv"])
    _put_dense(sd, f"{tname}.att1.proj", p["attn"]["proj"])
    sd[f"{tname}.att1.rpb"] = _t(p["attn"]["rpb"])
    _put_ln(sd, f"{tname}.norm2", p["norm2"])
    _put_dense(sd, f"{tname}.mlp.fc1", p["mlp"]["fc1"])
    _put_dense(sd, f"{tname}.mlp.fc2", p["mlp"]["fc2"])


def _transplant(variables) -> dict:
    p = variables["params"]
    s = variables["batch_stats"]
    sd = {}
    for i in range(1, 5):
        _put_rc(sd, f"conv{i}.0", p[f"conv{i}_0"], s[f"conv{i}_0"])
        _put_rc(sd, f"conv{i}.1", p[f"conv{i}_1"], s[f"conv{i}_1"])
        _put_rc(sd, f"dconv{i}.0", p[f"dconv{i}_0"], s[f"dconv{i}_0"])
        _put_rc(sd, f"dconv{i}.1", p[f"dconv{i}_1"], s[f"dconv{i}_1"])
        _put_conv(sd, f"down{i}.0", p[f"down{i}"])
        _put_conv(sd, f"up{i}.1", p[f"up{i}"])
    # GFT
    g = p["gft"]
    _put_conv(sd, "gft.patchembedding.patch_embeddings", g["embed"]["proj"])
    _put_ln(sd, "gft.norm1", g["norm1"])
    sd["gft.attention.qkv.weight"] = _t(np.asarray(g["attn"]["qkv"]["kernel"]).T)
    sd["gft.attention.qkv.bias"] = _t(g["attn"]["qkv"]["bias"])
    sd["gft.attention.proj.weight"] = _t(np.asarray(g["attn"]["proj"]["kernel"]).T)
    sd["gft.attention.proj.bias"] = _t(g["attn"]["proj"]["bias"])
    _put_ln(sd, "gft.norm2", g["norm2"])
    _put_dense(sd, "gft.mlp.fc1", g["mlp"]["fc1"])
    _put_dense(sd, "gft.mlp.fc2", g["mlp"]["fc2"])
    _put_conv(sd, "gft.conv.0", g["out_conv"])
    # skips (M2 bottom: convs is index 0; M3 / M2-top: convs follows Upsample)
    _put_conv(sd, "skip1.convl.0", p["skip1"]["convl"])
    _put_conv(sd, "skip1.convs.0", p["skip1"]["convs"])
    _put_conv(sd, "skip1.fuse_conv.0", p["skip1"]["fuse_conv"])
    _put_bn(sd, "skip1.fuse_conv.1", p["skip1"]["fuse_bn"], s["skip1"]["fuse_bn"])
    for name in ("skip2", "skip3"):
        _put_conv(sd, f"{name}.convl.0", p[name]["convl"])
        _put_conv(sd, f"{name}.convm.0", p[name]["convm"])
        _put_conv(sd, f"{name}.convs.1", p[name]["convs"])
        _put_conv(sd, f"{name}.fuse_conv.0", p[name]["fuse_conv"])
        _put_bn(sd, f"{name}.fuse_conv.1", p[name]["fuse_bn"], s[name]["fuse_bn"])
    _put_conv(sd, "skip4.convl.0", p["skip4"]["convl"])
    _put_conv(sd, "skip4.convs.1", p["skip4"]["convs"])
    _put_conv(sd, "skip4.fuse_conv.0", p["skip4"]["fuse_conv"])
    _put_bn(sd, "skip4.fuse_conv.1", p["skip4"]["fuse_bn"], s["skip4"]["fuse_bn"])
    for i in range(1, 5):
        _put_natt(sd, f"natt{i}", p[f"natt{i}"])
    _put_conv(sd, "output_layer", p["output_layer"])
    return sd


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


def _compare_at(size: int, rtol: float, atol: float):
    from lmnet_tpu.models import LMNet

    LM_Net = _load_reference_lmnet()
    model = LMNet(num_classes=2, gelu_exact=True, nat_backend="xla")
    rng = np.random.RandomState(0)
    x = rng.randn(2, size, size, 3).astype(np.float32) * 0.5
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # randomize BN stats so running-stat math is exercised
    import flax

    variables = flax.core.unfreeze(variables)

    def _randomize(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "mean" in v and "var" in v:
                    v["mean"] = jnp.asarray(
                        rng.normal(0, 0.2, v["mean"].shape), jnp.float32
                    )
                    v["var"] = jnp.asarray(
                        rng.uniform(0.6, 1.4, v["var"].shape), jnp.float32
                    )
                else:
                    _randomize(v)

    _randomize(variables["batch_stats"])

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    tmodel = LM_Net(3, 2).eval()
    missing, unexpected = tmodel.load_state_dict(_transplant(variables), strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(ours, theirs, rtol=rtol, atol=atol)
    return variables, x, ours, theirs


def test_full_graph_matches_reference_64():
    _compare_at(64, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_full_graph_matches_reference_256():
    _compare_at(256, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_training_dynamics_match_reference_recipe():
    """Multi-step TRAINING-DYNAMICS parity (VERDICT r3 ask #5): transplanted
    init, identical synthetic batches, 6 optimizer steps of the reference
    recipe — AdamW(1e-3, wd 1e-4) + CosineAnnealingLR(T_max, eta_min 1e-6)
    stepped per epoch + CE(weight [1,4], ls 0.001) + Dice(weight [1,4]) +
    BN momentum 0.1 — through OUR real jitted ``train_step`` vs the
    reference's torch source. Asserts the per-step loss trajectories agree;
    this validates optimizer/BN/schedule integration that single-forward
    parity cannot (reference train.py:156-160 + train_eval_utils.py:120-166).

    Dropout (Mlp p=0.1) is disabled on BOTH sides — framework RNGs can't be
    aligned; everything else is the live training path.
    """
    from lmnet_tpu.models import LMNet
    from lmnet_tpu.train.engine import TrainState, make_optimizer, train_step

    LM_Net = _load_reference_lmnet()
    size, B, steps_per_epoch, n_steps = 48, 2, 2, 6
    epochs = 3

    model = LMNet(num_classes=2, gelu_exact=True, nat_backend="xla", rc_remat=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)), train=False)
    import flax

    variables = flax.core.unfreeze(variables)

    rng = np.random.RandomState(7)
    batches = [
        (
            rng.randn(B, size, size, 3).astype(np.float32) * 0.5,
            rng.randint(0, 2, (B, size, size)),
        )
        for _ in range(3)
    ]

    # transplant BEFORE our training loop: train_step donates the state, so
    # the init arrays inside ``variables`` are deleted after step 1
    torch_sd = _transplant(variables)

    # ---- our side: the REAL train_step, dropout forced off ---------------
    apply_det = lambda v, x, **kw: model.apply(v, x, deterministic=True, **kw)
    tx = make_optimizer(
        base_lr=1e-3, weight_decay=1e-4, epochs=epochs,
        steps_per_epoch=steps_per_epoch,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        apply_fn=apply_det,
        tx=tx,
    )
    from lmnet_tpu.metrics.confusion import ConfusionAccumulator

    cm = ConfusionAccumulator.init(2)
    ours_losses = []
    key = jax.random.key(0)
    for i in range(n_steps):
        x, y = batches[i % len(batches)]
        state, loss, cm = train_step(
            state, jnp.asarray(x), jnp.asarray(y), key, cm
        )
        ours_losses.append(float(loss))

    # ---- reference side: torch source, same init/batches/recipe ----------
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from utils.loss import DiceLoss

    tmodel = LM_Net(3, 2)
    missing, unexpected = tmodel.load_state_dict(torch_sd, strict=False)
    assert not unexpected, unexpected
    for m in tmodel.modules():  # align with deterministic=True on our side
        if isinstance(m, tnn.Dropout):
            m.p = 0.0
    tmodel.train()
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=epochs, eta_min=1e-6
    )
    ce_fn = tnn.CrossEntropyLoss(
        weight=torch.tensor([1.0, 4.0]), label_smoothing=0.001
    )
    dice_fn = DiceLoss(2)
    ref_losses = []
    for i in range(n_steps):
        x, y = batches[i % len(batches)]
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        yt = torch.from_numpy(y).long()
        out = tmodel(xt)
        loss = ce_fn(out, yt) + dice_fn(
            out, yt.unsqueeze(1).float(), weight=[1.0, 4.0], softmax=True
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))
        if (i + 1) % steps_per_epoch == 0:  # reference steps the LR per epoch
            sched.step()

    # trajectories agree step-by-step (divergence compounds through AdamW,
    # BN running stats and the schedule — agreement here means the whole
    # optimization stack matches, not just one forward)
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=5e-3)

    # and the post-training states still agree: eval-mode logits on a held
    # batch (exercises the updated params AND the updated BN running stats)
    xh = rng.randn(B, size, size, 3).astype(np.float32) * 0.5
    ours_logits = np.asarray(
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(xh), train=False,
        )
    )
    tmodel.eval()
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(np.transpose(xh, (0, 3, 1, 2))))
    ref_logits = np.transpose(ref_logits.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours_logits, ref_logits, rtol=5e-3, atol=5e-3)


def test_training_loss_matches_reference_recipe():
    """One CE(weight [1,4], ls 0.001) + weighted-Dice loss value computed on
    identical logits/labels matches the reference criterion
    (train.py:157-158 + train_eval_utils.py:133,141 + utils/loss.py:170-206)."""
    variables, x, ours, theirs = _compare_at(64, rtol=1e-3, atol=1e-4)

    rng = np.random.RandomState(1)
    labels = rng.randint(0, 2, ours.shape[:3])

    from lmnet_tpu.losses import segmentation_loss

    ours_loss = float(segmentation_loss(jnp.asarray(ours), jnp.asarray(labels)))

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from utils.loss import DiceLoss  # reference's own loss implementation

    t_logits = torch.from_numpy(np.transpose(theirs, (0, 3, 1, 2)))
    t_labels = torch.from_numpy(labels).long()
    ce = tnn.CrossEntropyLoss(weight=torch.tensor([1.0, 4.0]), label_smoothing=0.001)(
        t_logits, t_labels
    )
    dice = DiceLoss(2)(
        t_logits, t_labels.unsqueeze(1).float(), weight=[1.0, 4.0], softmax=True
    )
    ref_loss = float(ce + dice)
    np.testing.assert_allclose(ours_loss, ref_loss, rtol=1e-4)
