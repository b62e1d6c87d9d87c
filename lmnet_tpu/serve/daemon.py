"""Online serving daemon: load a StableHLO deploy artifact (serve/export.py)
and serve segmentation requests over HTTP with dynamic batching.

The reference framework stops at an offline test loop (train.py:182-197);
its deployment story ends with ``switch_to_deploy``. This module is the
production half that a TPU serving stack actually needs: a long-lived
process that owns the compiled deploy graph and turns many small
concurrent requests into a few large device batches — the only way to
keep the MXU fed when individual callers send 1-4 images at a time.

Design (TPU-first):
  * one worker thread owns the device: requests queue up, the worker
    drains up to ``max_batch`` images (waiting at most ``max_wait_ms``
    after the first), concatenates, and runs ONE device call;
  * batches are padded up to a power-of-two bucket so the number of
    compiled programs is bounded (log2(max_batch) shapes), instead of
    compiling per arriving batch size — with the symbolic-batch artifact
    every bucket reuses the same StableHLO, only XLA specialization runs;
  * argmax happens on device; only the (B,H,W) int32 mask crosses the
    wire back.

Transport is stdlib ``http.server`` (ThreadingHTTPServer): POST a
``.npy``-serialized float32 (N,H,W,3) body to ``/predict`` and get a
``.npy`` int32 (N,H,W) mask back; ``GET /healthz`` reports stats. No
third-party server dependency.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch."""
    b = 1
    while b < n:
        b <<= 1
    return min(b, max_batch)


@dataclass
class _Request:
    x: np.ndarray  # (n, H, W, 3) float32
    future: Future = field(default_factory=Future)


class DynamicBatcher:
    """Queue + single worker thread that batches requests into device calls.

    ``fn`` maps a (B,H,W,3) array to (B,H,W,C) logits (e.g. a deserialized
    export artifact or ``deploy_forward`` closure). The batcher owns the
    argmax and the padding; callers get back int32 (n,H,W) masks.
    """

    def __init__(
        self,
        fn,
        img_size: int,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        dtype=jnp.bfloat16,
    ):
        self.img_size = int(img_size)
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._predict = jax.jit(
            lambda x: jnp.argmax(fn(x.astype(dtype)), axis=-1).astype(jnp.int32)
        )
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self.stats = {"requests": 0, "images": 0, "batches": 0, "padded": 0}
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ------------------------------------------------------
    def submit(self, x: np.ndarray) -> Future:
        """Enqueue (n,H,W,3) or (H,W,3) float images; future -> (n,H,W) mask."""
        x = np.asarray(x, np.float32)
        if x.ndim == 3:
            x = x[None]
        if x.ndim != 4 or x.shape[1:] != (self.img_size, self.img_size, 3):
            raise ValueError(
                f"expected (n,{self.img_size},{self.img_size},3), got {x.shape}"
            )
        if x.shape[0] > self.max_batch:
            raise ValueError(f"request of {x.shape[0]} exceeds max_batch")
        req = _Request(x)
        with self._lock:
            self.stats["requests"] += 1
            self.stats["images"] += x.shape[0]
        self._queue.put(req)
        return req.future

    def predict(self, x: np.ndarray, timeout: float = 120.0) -> np.ndarray:
        return self.submit(x).result(timeout=timeout)

    def stop(self):
        self._queue.put(None)
        self._worker.join(timeout=30)

    # -- worker side ------------------------------------------------------
    def _drain(self) -> list[_Request] | None:
        """Block for the first request, then collect more until the batch is
        full or ``max_wait_s`` has elapsed. None = shutdown."""
        first = self._queue.get()
        if first is None:
            return None
        batch, n = [first], first.x.shape[0]
        deadline = time.monotonic() + self.max_wait_s
        while n < self.max_batch:
            rest = deadline - time.monotonic()
            if rest <= 0:
                break
            try:
                nxt = self._queue.get(timeout=rest)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-post shutdown for the outer loop
                break
            if n + nxt.x.shape[0] > self.max_batch:
                self._queue.put(nxt)  # doesn't fit; leave for the next batch
                break
            batch.append(nxt)
            n += nxt.x.shape[0]
        return batch

    def _run(self):
        while True:
            batch = self._drain()
            if batch is None:
                return
            try:
                x = np.concatenate([r.x for r in batch], axis=0)
                n = x.shape[0]
                b = _bucket(n, self.max_batch)
                if b > n:
                    pad = np.zeros((b - n, *x.shape[1:]), x.dtype)
                    x = np.concatenate([x, pad], axis=0)
                masks = np.asarray(self._predict(x)[:n])
                with self._lock:
                    self.stats["batches"] += 1
                    self.stats["padded"] += b - n
                off = 0
                for r in batch:
                    k = r.x.shape[0]
                    r.future.set_result(masks[off : off + k])
                    off += k
            except Exception as e:  # surface device errors to every caller
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)


# -- HTTP layer -----------------------------------------------------------

def make_server(batcher: DynamicBatcher, host: str = "127.0.0.1", port: int = 0):
    """ThreadingHTTPServer wrapping ``batcher``; caller runs serve_forever()."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live in /healthz
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"ok": True, **batcher.stats}).encode()
                self._reply(200, body, "application/json")
            else:
                self._reply(404, b"{}", "application/json")

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, b"{}", "application/json")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                arr = np.load(io.BytesIO(self.rfile.read(length)),
                              allow_pickle=False)
                mask = batcher.predict(arr)
                out = io.BytesIO()
                np.save(out, mask)
                self._reply(200, out.getvalue(), "application/x-npy")
            except Exception as e:
                body = json.dumps({"ok": False, "error": str(e)}).encode()
                self._reply(400, body, "application/json")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser(description="LM-Net artifact serving daemon")
    p.add_argument("--artifact", required=True,
                   help="StableHLO blob from `cli.train --export`")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    args = p.parse_args(argv)

    # Honor the user's JAX_PLATFORMS even when a sitecustomize pre-registered
    # a TPU plugin and pinned jax_platforms (same re-assert as cli/train.py).
    # Safe here: main() runs before any device computation in this process.
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat.split(","):
        jax.config.update("jax_platforms", plat)
        import jax.extend.backend as _jb

        _jb.clear_backends()

    from lmnet_tpu.serve.export import load_deploy_file

    fn = load_deploy_file(args.artifact)
    batcher = DynamicBatcher(
        fn, img_size=args.img_size, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
    )
    # warm the single-image bucket so the first caller doesn't eat a compile
    # (seconds on TPU; a cold CPU compile of the full graph can take minutes)
    batcher.predict(
        np.zeros((1, args.img_size, args.img_size, 3), np.float32),
        timeout=1800.0,
    )
    srv = make_server(batcher, args.host, args.port)
    print(f"serving on http://{args.host}:{srv.server_address[1]} "
          f"(backend={jax.default_backend()}, max_batch={args.max_batch})")
    try:
        srv.serve_forever()
    finally:
        batcher.stop()


if __name__ == "__main__":
    main()
