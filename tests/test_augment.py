"""On-device augmentation pipeline tests: determinism under fixed keys,
shape/dtype contracts, geometric sanity, val-path parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmnet_tpu.data import augment


@pytest.fixture(scope="module")
def batch(  ):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 36, 36, 3)).astype(np.uint8)
    masks = (rng.rand(2, 36, 36) > 0.5).astype(np.uint8)
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_train_pipeline_shapes_and_determinism(batch):
    imgs, masks = batch
    key = jax.random.key(7)
    x1, y1 = augment.train_pipeline(key, imgs, masks, out_size=32)
    x2, y2 = augment.train_pipeline(key, imgs, masks, out_size=32)
    assert x1.shape == (2, 32, 32, 3) and x1.dtype == jnp.float32
    assert y1.shape == (2, 32, 32) and y1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # different key -> different augmentation
    x3, _ = augment.train_pipeline(jax.random.key(8), imgs, masks, out_size=32)
    assert not np.allclose(np.asarray(x1), np.asarray(x3))


def test_mask_stays_binary(batch):
    imgs, masks = batch
    _, y = augment.train_pipeline(jax.random.key(3), imgs, masks, out_size=32)
    vals = np.unique(np.asarray(y))
    assert set(vals.tolist()) <= {0, 1}


def test_eval_pipeline_normalize(batch):
    imgs, masks = batch
    x, y = augment.eval_pipeline(imgs, masks, out_size=36)
    ref = (np.asarray(imgs, np.float32) / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-5, atol=1e-5)
    assert y.dtype == jnp.int32


def test_flip_matrix_exact():
    # hflip-only matrix must reverse columns exactly
    img = jnp.arange(16.0).reshape(4, 4)
    mat = augment._mat_scale_offset(1.0, 0.0, -1.0, 3.0)  # hflip for w=4
    out = augment._warp(img, mat, (4, 4), order=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img)[:, ::-1])


def test_photometric_ops_bounded(batch):
    imgs, _ = batch
    img = jnp.asarray(imgs[0], jnp.float32)
    key = jax.random.key(0)
    for fn in (
        augment.to_gray,
        augment.channel_shuffle,
        augment.rgb_shift,
        augment.gaussian_blur,
        augment.grid_dropout,
        augment.clahe,
        augment.hue_saturation_value,
    ):
        out = fn(key, img)
        assert out.shape == img.shape, fn.__name__
        o = np.asarray(out)
        assert np.isfinite(o).all(), fn.__name__
        assert o.min() >= -1e-3 and o.max() <= 255.0 + 1e-3, fn.__name__


def test_hsv_roundtrip():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randint(0, 256, (5, 5, 3)), jnp.float32)
    hsv = augment._rgb_to_hsv(img)
    back = jax.vmap(jax.vmap(augment._px_hsv_to_rgb))(hsv) * 255.0
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-2)


def test_channel_shuffle_is_permutation(batch):
    imgs, _ = batch
    img = jnp.asarray(imgs[0], jnp.float32)
    out = np.asarray(augment.channel_shuffle(jax.random.key(5), img))
    src = np.asarray(img)
    perms = [out[..., list(p)] for p in
             [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]]
    assert any(np.array_equal(src, p) for p in perms)
