"""Capture a device trace of the deploy forward (and optionally the train
step) and print the top HLO ops by self-time, parsed from the xplane proto.

Usage: python perf/xplane_top.py [--train] [--batch 128] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def top_ops(logdir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    totals = {}
    cats = {}
    spans = []  # (offset_ps, duration_ps, name) for gap analysis
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # ONLY the op-level lines: the "XLA Modules" / "Steps" lines
            # carry whole-program envelope events (e.g. one 685 ms
            # fori_loop body) that would swamp every category as "other"
            # exact match: 'Async XLA Ops' also contains "XLA Op" but its
            # events overlap compute (async weight prefetch) AND its event
            # offsets are relative to a different line base — mixing the
            # two lines fabricated phantom ~10 ms "idle gaps"
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                # skip the enclosing jit event and async copy spans (they
                # overlap real compute)
                if name.startswith("jit_") or name.startswith("jit("):
                    continue
                # classify on the op's OWN name (before " = "), NOT the full
                # HLO text: operand names appear after " = ", so substring
                # matching there misfiles every op that consumes a
                # copy-done (async-prefetched weight) as an async copy —
                # which silently dropped ~75% of real compute from the
                # round-2/3 bucket analyses.
                op = name.split(" = ")[0]
                if "copy-start" in op or "copy-done" in op:
                    cat = "async-weight-copy (overlapped)"
                elif "custom-call" in op or op.startswith("%attn"):
                    cat = "pallas custom-call"
                elif "%copy" in op or "transpose" in op:
                    cat = "layout copy/transpose"
                elif "convolution" in op or "%conv" in op:
                    cat = "convolution"
                elif "fusion" in op:
                    cat = "fusion"
                else:
                    cat = "other"
                d = ev.duration_ps / 1e9
                if cat != "async-weight-copy (overlapped)":
                    totals[name] = totals.get(name, 0) + d
                    spans.append((ev.offset_ps, ev.duration_ps, name))
                cats[cat] = cats.get(cat, 0) + d
    print("category totals (ms over the traced span):")
    for c, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v:9.2f}  {c}")
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    print("top events:")
    for name, ms in items[:top]:
        print(f"  {ms:9.3f} ms  {name[:110]}")
    # --- idle-gap analysis: where the core waits ------------------------
    # op self-time that doesn't cover the span = the core idling on DMA /
    # infeed / dependencies. List the largest gaps with their neighbors.
    if spans:
        spans.sort()
        covered = 0.0
        gaps = []
        cur_end = spans[0][0]
        prev_name = "(trace start)"
        for off, dur, name in spans:
            if off > cur_end:
                gaps.append((off - cur_end, prev_name, name))
            new_end = off + dur
            if new_end > cur_end:
                covered += new_end - max(off, cur_end)
                cur_end = new_end
                prev_name = name
        total_span = cur_end - spans[0][0]
        print(
            f"op coverage: {covered / 1e9:.1f} ms busy of {total_span / 1e9:.1f} ms span "
            f"({100 * covered / max(total_span, 1):.0f}% — the rest is the core waiting)"
        )
        print("largest idle gaps (ms, between which ops):")
        for g, a, b in sorted(gaps, reverse=True)[:12]:
            print(f"  {g / 1e9:9.3f}  after {a[:60]!s}")
            print(f"             before {b[:60]!s}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from lmnet_tpu.models import LMNet, structural_reparam

    B = args.batch
    logdir = "/tmp/xplane_prof"
    os.system(f"rm -rf {logdir}")

    if not args.train:
        train_model = LMNet(num_classes=2)
        variables = jax.jit(
            lambda k: train_model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
        )(jax.random.key(0))
        deploy_vars = structural_reparam(variables)
        model = LMNet(num_classes=2, deploy=True, dtype=jnp.bfloat16)
        x = jnp.ones((B, args.size, args.size, 3), jnp.bfloat16)
        f = jax.jit(lambda x: model.apply(deploy_vars, x, train=False))
        jax.block_until_ready(f(x))  # compile
        with jax.profiler.trace(logdir):
            for _ in range(3):
                out = f(x)
            jax.block_until_ready(out)
    else:
        from lmnet_tpu.metrics.confusion import ConfusionAccumulator
        from lmnet_tpu.train.engine import create_train_state, train_step

        model = LMNet(num_classes=2, dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.key(0), (1, 64, 64, 3),
            epochs=200, steps_per_epoch=100,
        )
        x = jnp.ones((B, args.size, args.size, 3), jnp.float32)
        y = jnp.zeros((B, args.size, args.size), jnp.int32)
        cm = ConfusionAccumulator.init(2)
        s2, loss, cm2 = train_step(state, x, y, jax.random.key(1), cm)
        jax.block_until_ready(loss)
        with jax.profiler.trace(logdir):
            s3, loss, cm3 = train_step(s2, x, y, jax.random.key(1), cm2)
            jax.block_until_ready(loss)
    top_ops(logdir, args.top)


if __name__ == "__main__":
    main()
