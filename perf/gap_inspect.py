"""Inspect what fills the idle gaps in the last captured xplane trace.

Lists every line in the device plane with its total event time, then dumps
all events (any line) overlapping a given window so the ~10 ms idle gaps in
xplane_top's op-coverage analysis can be attributed.

Usage: python perf/gap_inspect.py [--logdir /tmp/xplane_prof]
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/xplane_prof")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {args.logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # find the op line's largest gap first
        op_spans = []
        for line in plane.lines:
            tot = 0
            n = 0
            for ev in line.events:
                tot += ev.duration_ps
                n += 1
            print(f"  line {line.name!r}: {n} events, {tot / 1e9:.2f} ms total")
            if "XLA Op" in line.name:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    if name.startswith("jit_") or name.startswith("jit("):
                        continue
                    if "copy-start" in name or "copy-done" in name:
                        continue
                    op_spans.append((ev.offset_ps, ev.duration_ps, name))
        if not op_spans:
            continue
        op_spans.sort()
        gaps = []
        cur_end = op_spans[0][0]
        prev = "(start)"
        for off, dur, name in op_spans:
            if off > cur_end:
                gaps.append((off - cur_end, cur_end, off, prev, name))
            if off + dur > cur_end:
                cur_end = off + dur
                prev = name
        gaps.sort(reverse=True)
        for g, lo, hi, a, b in gaps[:4]:
            print(f"\n-- gap {g / 1e9:.3f} ms  [{lo / 1e9:.3f}..{hi / 1e9:.3f}] "
                  f"after {a[:70]}")
            # dump all events on all lines overlapping the window
            for line in plane.lines:
                for ev in line.events:
                    e0, e1 = ev.offset_ps, ev.offset_ps + ev.duration_ps
                    if e1 > lo and e0 < hi:
                        name = ev_meta.get(ev.metadata_id, "?")
                        if name.startswith("jit_") or name.startswith("jit("):
                            continue
                        print(f"    [{line.name[:20]:20s}] {ev.duration_ps / 1e9:8.3f} ms  "
                              f"@{e0 / 1e9:9.3f}  {name[:100]}")


if __name__ == "__main__":
    main()
