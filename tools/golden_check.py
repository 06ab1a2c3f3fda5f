"""Golden cherrypick regression CLI.

Regenerates predictions with ``Trainer.predict`` and compares them against a
golden directory (e.g. the reference's ``cherrypick/`` qualitative fixtures,
or goldens captured from a previous run of this framework). Exact matches
need the released reference weights run through the checkpoint converters
(``core/checkpoint.py``); until then this harness validates drift between
framework versions.

Usage:
    python tools/golden_check.py --config json/... --ckpt <dir> \
        --golden-dir /root/reference/cherrypick [--tolerance 0] [--visualize]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--golden-dir", required=True)
    p.add_argument("--tolerance", type=float, default=0.0)
    p.add_argument("--out-dir", default=None,
                   help="keep predictions here (default: temp dir)")
    p.add_argument("--visualize", action="store_true",
                   help="also write colorized maps next to the PNGs")
    args = p.parse_args()

    from mde_tpu.core.config import parse
    from mde_tpu.train.driver import Trainer
    from mde_tpu.utils.golden import compare_png_dirs, summarize

    opt = parse(args.config, dump_option=False)
    if args.ckpt:
        opt["resume_from"] = args.ckpt
    trainer = Trainer(opt)
    trainer.init_state()

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="golden_pred_")
    trainer.predict(out_dir, visualize=args.visualize)

    report = compare_png_dirs(out_dir, args.golden_dir,
                              tolerance=args.tolerance)
    print(summarize(report))
    print(json.dumps({"golden_pass": all(r["pass"] for r in report.values()),
                      "files": len(report)}))
    return 0 if all(r["pass"] for r in report.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
