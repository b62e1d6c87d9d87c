"""Serving-stack throughput: the dynamic-batching daemon end to end.

Measures sustained img/s through ``serve.daemon.DynamicBatcher`` (and
optionally the HTTP layer) with many concurrent small clients — the
production number that sits on top of the raw device rate bench.py
reports. The gap between the two is the batching/transport overhead;
on the tunneled single-chip host each device dispatch adds ~27 ms RTT,
so the batcher's job is to keep batches at max_batch.

Run: python -u perf/daemon_bench.py [MAX_BATCH] [CLIENTS] [SECONDS] [--http]
"""

import io
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

MAX_BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CLIENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 48  # 48 x 4-img
# requests keeps >max_batch images in flight so batches can fill
SECONDS = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
HTTP = "--http" in sys.argv
SIZE = 256


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from lmnet_tpu.models import LMNet, structural_reparam
    from lmnet_tpu.serve.daemon import DynamicBatcher, make_server
    from lmnet_tpu.serve.engine import deploy_forward

    m = LMNet()
    variables = jax.jit(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
    )(jax.random.key(0))
    deploy_vars = structural_reparam(variables)
    nat = "flat" if jax.default_backend() == "tpu" else "xla"
    fn = lambda x: deploy_forward(deploy_vars, x, nat_backend=nat)

    batcher = DynamicBatcher(fn, img_size=SIZE, max_batch=MAX_BATCH,
                             max_wait_ms=5.0)
    # warm every power-of-two bucket so steady state has no compiles
    for b in [1 << i for i in range((MAX_BATCH - 1).bit_length() + 1)]:
        if b <= MAX_BATCH:
            batcher.predict(np.zeros((b, SIZE, SIZE, 3), np.float32),
                            timeout=1800)

    target = None
    if HTTP:
        srv = make_server(batcher, "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        target = srv.server_address

    done = threading.Event()
    counts = [0] * CLIENTS

    def client(i):
        import http.client

        rng = np.random.RandomState(i)
        x = rng.rand(4, SIZE, SIZE, 3).astype(np.float32)  # small requests
        conn = (http.client.HTTPConnection(*target, timeout=600)
                if HTTP else None)
        while not done.is_set():
            if HTTP:
                buf = io.BytesIO()
                np.save(buf, x)
                conn.request("POST", "/predict", body=buf.getvalue())
                r = conn.getresponse()
                assert r.status == 200, r.status
                np.load(io.BytesIO(r.read()), allow_pickle=False)
            else:
                batcher.predict(x, timeout=600)
            counts[i] += x.shape[0]

    threads = [threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(SECONDS)
    done.set()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    st = dict(batcher.stats)
    batcher.stop()
    total = sum(counts)
    mean_batch = st["images"] / max(st["batches"], 1)
    print(f"daemon {'http' if HTTP else 'inproc'}: {total / dt:.1f} img/s "
          f"sustained ({CLIENTS} clients x 4-img requests, {dt:.1f}s); "
          f"mean device batch {mean_batch:.1f}/{MAX_BATCH}, "
          f"padding {st['padded'] / max(st['images'], 1):.1%}")


if __name__ == "__main__":
    main()
