"""Neighborhood attention vs a brute-force oracle.

The oracle implements NATTEN's definition directly (per-query clamped k x k
window, relative positional bias) in numpy — independent of both our XLA
formulation and the reference CUDA op.
"""

import numpy as np
import pytest

from lmnet_tpu.ops.nat import neighborhood_attention


def naive_nat(q, k, v, rpb, kernel_size):
    B, H, W, C = q.shape
    heads = rpb.shape[0]
    hd = C // heads
    c = kernel_size // 2
    scale = hd**-0.5
    qh = q.reshape(B, H, W, heads, hd)
    kh = k.reshape(B, H, W, heads, hd)
    vh = v.reshape(B, H, W, heads, hd)
    out = np.zeros_like(qh)
    for b in range(B):
        for i in range(H):
            si = min(max(i - c, 0), H - kernel_size)
            for j in range(W):
                sj = min(max(j - c, 0), W - kernel_size)
                for h in range(heads):
                    logits = np.empty((kernel_size, kernel_size))
                    for a in range(kernel_size):
                        for bb in range(kernel_size):
                            ki, kj = si + a, sj + bb
                            logits[a, bb] = (
                                scale * qh[b, i, j, h] @ kh[b, ki, kj, h]
                                + rpb[h, ki - i + kernel_size - 1, kj - j + kernel_size - 1]
                            )
                    w = np.exp(logits - logits.max())
                    w /= w.sum()
                    acc = np.zeros(hd)
                    for a in range(kernel_size):
                        for bb in range(kernel_size):
                            acc += w[a, bb] * vh[b, si + a, sj + bb, h]
                    out[b, i, j, h] = acc
    return out.reshape(B, H, W, C)


@pytest.mark.parametrize("hw,heads,hd,ksize", [((6, 7), 2, 3, 3), ((5, 5), 3, 1, 3), ((8, 6), 2, 4, 5)])
def test_nat_matches_bruteforce(rng, hw, heads, hd, ksize):
    H, W = hw
    C = heads * hd
    q = rng.randn(2, H, W, C).astype(np.float32)
    k = rng.randn(2, H, W, C).astype(np.float32)
    v = rng.randn(2, H, W, C).astype(np.float32)
    rpb = (0.1 * rng.randn(heads, 2 * ksize - 1, 2 * ksize - 1)).astype(np.float32)
    ours = np.asarray(neighborhood_attention(q, k, v, rpb, ksize))
    ref = naive_nat(q, k, v, rpb, ksize)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_nat_tiny_head_dim(rng):
    # the model's extreme case: dim 12, 12 heads -> head_dim 1 (LM_Net.py:84)
    q = rng.randn(1, 5, 5, 12).astype(np.float32)
    rpb = np.zeros((12, 5, 5), dtype=np.float32)
    out = np.asarray(neighborhood_attention(q, q, q, rpb, 3))
    ref = naive_nat(q, q, q, rpb, 3)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
