"""Compare 2D-vs-3D training convergence from log files.

Usage:
    python scripts/analyze_convergence.py --log2d out/2d.log --log3d out/3d.log \
        [--plot convergence.pdf] [--out summary.json]

Parity with the reference experiment analysis
(``/root/reference/scripts/experiments/analyze_results.py``), adapted to
this trainer's log format. Also consumed by run_2d_3d_comparison.sh.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from pose_splatter_tpu.utils.loganalysis import (
    convergence_summary,
    parse_training_log,
    plot_convergence_comparison,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log2d", required=True)
    parser.add_argument("--log3d", required=True)
    parser.add_argument("--plot", default="convergence_comparison.pdf")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    d2 = parse_training_log(args.log2d)
    d3 = parse_training_log(args.log3d)
    summary = convergence_summary(d2, d3)
    print(json.dumps(summary, indent=2))
    if args.plot:
        path = plot_convergence_comparison(d2, d3, save_path=args.plot)
        print(f"plot: {path}", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
