"""Preflight-validate a real dataset drop-in (LM6d / YCB-Video / BOP).

    python tools/validate_dataset.py <root> [--format auto|lm6d|ycb_video|bop:<split>]

Checks the layout, depth factors, pose units/conventions, label id
conventions, mesh loadability/scale, and keyframe coverage the
``deepim_tpu.data`` readers assume, and prints actionable diffs.
Exit code 1 if any ERROR finding.  Logic: ``deepim_tpu/data/validate.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("root")
    p.add_argument("--format", default="auto",
                   help="auto | lm6d | ycb_video | bop:<split>")
    p.add_argument("--objects", default="",
                   help="comma-separated object list (lm6d; default: "
                        "infer from models/)")
    p.add_argument("--split", default="test",
                   help="image-set split to check (lm6d)")
    args = p.parse_args(argv)

    from deepim_tpu.data.validate import format_findings, validate

    kw = {}
    fmt = args.format
    if fmt == "auto":
        from deepim_tpu.data.validate import detect_format

        fmt = detect_format(args.root)
        print(f"detected format: {fmt}")
    if fmt == "lm6d":
        kw["split"] = args.split
        if args.objects:
            kw["objects"] = args.objects.split(",")
    findings = validate(args.root, fmt, **kw)
    print(format_findings(findings))
    return 1 if any(f.level == "ERROR" for f in findings) else 0


if __name__ == "__main__":
    raise SystemExit(main())
