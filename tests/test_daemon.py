"""Serving daemon (serve/daemon.py): dynamic batching semantics, padding
buckets, error surfacing, and the HTTP transport roundtrip — all against a
real (tiny) StableHLO deploy artifact."""

import io
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size CPU compiles; excluded from the fast tier


from conftest import TINY, TINY_HW
from lmnet_tpu.models import LMNet, structural_reparam
from lmnet_tpu.serve.daemon import DynamicBatcher, _bucket, make_server
from lmnet_tpu.serve.export import export_deploy, load_deploy


@pytest.fixture(scope="module")
def deploy_fn():
    m = LMNet(**TINY)
    vs = jax.jit(
        lambda k: m.init(k, jnp.zeros((1, TINY_HW, TINY_HW, 3)), train=False)
    )(jax.random.key(0))
    blob = export_deploy(
        structural_reparam(vs), img_size=TINY_HW, num_heads=TINY["num_heads"],
        dtype=jnp.float32, platforms=("cpu",),
    )
    return load_deploy(blob)


@pytest.fixture()
def batcher(deploy_fn):
    b = DynamicBatcher(
        deploy_fn, img_size=TINY_HW, max_batch=8, max_wait_ms=1000.0,
        dtype=jnp.float32,
    )
    yield b
    b.stop()


def test_bucket():
    assert [_bucket(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == [1, 2, 4, 4, 8, 8, 8]


def test_batching_merges_and_matches(batcher, deploy_fn, rng):
    """Concurrent small requests coalesce into fewer device batches, results
    are per-request correct, and the odd total exercises pad-to-bucket."""
    xs = [rng.rand(n, TINY_HW, TINY_HW, 3).astype(np.float32) for n in (1, 2)]
    futs = [batcher.submit(x) for x in xs]
    outs = [f.result(timeout=600) for f in futs]
    for x, out in zip(xs, outs):
        ref = np.argmax(np.asarray(deploy_fn(jnp.asarray(x))), axis=-1)
        assert out.shape == x.shape[:3] and out.dtype == np.int32
        np.testing.assert_array_equal(out, ref)
    st = batcher.stats
    assert st["requests"] == 2 and st["images"] == 3
    assert st["batches"] < st["requests"]  # they coalesced
    assert st["padded"] >= 1  # 3 images -> bucket 4


def test_single_image_and_validation(batcher, rng):
    out = batcher.predict(rng.rand(TINY_HW, TINY_HW, 3).astype(np.float32))
    assert out.shape == (1, TINY_HW, TINY_HW)
    with pytest.raises(ValueError):
        batcher.submit(np.zeros((1, TINY_HW + 1, TINY_HW, 3), np.float32))
    with pytest.raises(ValueError):
        batcher.submit(np.zeros((9, TINY_HW, TINY_HW, 3), np.float32))


def test_http_roundtrip(batcher, deploy_fn, rng):
    import http.client

    srv = make_server(batcher, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        x = rng.rand(2, TINY_HW, TINY_HW, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/predict", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        mask = np.load(io.BytesIO(resp.read()), allow_pickle=False)
        ref = np.argmax(np.asarray(deploy_fn(jnp.asarray(x))), axis=-1)
        np.testing.assert_array_equal(mask, ref)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["requests"] >= 1
        # malformed body -> 400, daemon stays alive
        conn.request("POST", "/predict", body=b"not an npy")
        assert conn.getresponse().status == 400
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"]
    finally:
        srv.shutdown()
        t.join(timeout=10)
