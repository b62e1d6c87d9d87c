"""Re-parse the last xplane trace with xplane_top's (fixed) accounting,
without re-running the TPU capture.  Usage: python perf/reparse.py [--top 40]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xplane_top import top_ops  # noqa: E402  (perf/ is the cwd's sibling)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/xplane_prof")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    top_ops(args.logdir, args.top)
