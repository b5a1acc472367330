"""``polypdb`` CLI (reference ``src/ssl4polyp/polypdb/cli.py``).

Currently: ``polypdb sun corrupt --pack P --spec S --roots R --out O``
validating frame paths before rendering corruption variants.
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path
from typing import List, Optional

import yaml

from ssl4polyp_tpu.configs import resolve_config_path, resolve_data_pack_path

from .robustness import build_sun_test_corruptions

__all__ = ["main", "check_csv_paths"]


def _resolve(path: Path, resolver) -> Path:
    if path.is_absolute() or path.exists():
        return path
    return resolver(path)


def check_csv_paths(csv_path: Path, roots: dict, sample: Optional[int] = None) -> List[Path]:
    """Verify every frame_path resolves through the roots map; returns misses."""
    missing: List[Path] = []
    with open(csv_path, newline="", encoding="utf-8") as handle:
        reader = csv.DictReader(handle)
        for index, row in enumerate(reader):
            if sample is not None and index >= sample:
                break
            frame = Path(row["frame_path"])
            root = frame.parts[0]
            if root in roots:
                resolved = Path(roots[root]).joinpath(*frame.parts[1:])
            else:
                resolved = frame
            if not resolved.exists():
                missing.append(resolved)
    return missing


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(prog="polypdb")
    subparsers = parser.add_subparsers(dest="command")

    sun = subparsers.add_parser("sun")
    sun_sub = sun.add_subparsers(dest="sun_command")
    corrupt = sun_sub.add_parser("corrupt")
    corrupt.add_argument("--pack", type=Path, required=True)
    corrupt.add_argument("--spec", type=Path, required=True)
    corrupt.add_argument("--roots", type=Path, default=Path("data") / "roots.json")
    corrupt.add_argument(
        "--out", type=Path, default=Path("results") / "polypdb" / "sun_corruptions"
    )

    synth = subparsers.add_parser(
        "synth", help="generate a synthetic smoke-test pack (images + CSVs + manifest)"
    )
    synth.add_argument("--out", type=Path, required=True)
    synth.add_argument("--name", default="synthetic_pack")
    synth.add_argument("--frames-per-split", type=int, default=32)
    synth.add_argument("--image-size", type=int, default=224)
    synth.add_argument("--seed", type=int, default=0)
    synth.add_argument("--splits", nargs="+", default=["train", "val", "test"])

    args = parser.parse_args(argv)
    if args.command == "synth":
        from .synth import build_synthetic_pack

        pack_dir = build_synthetic_pack(
            args.out,
            name=args.name,
            splits=tuple(args.splits),
            frames_per_split=args.frames_per_split,
            image_size=args.image_size,
            seed=args.seed,
        )
        print(f"wrote synthetic pack to {pack_dir}")
    elif args.command == "sun" and args.sun_command == "corrupt":
        pack_dir = _resolve(args.pack, resolve_data_pack_path)
        spec_path = _resolve(args.spec, resolve_config_path)
        roots_path = _resolve(args.roots, resolve_config_path)
        spec = yaml.safe_load(spec_path.read_text(encoding="utf-8"))
        roots = json.loads(roots_path.read_text(encoding="utf-8"))
        missing = check_csv_paths(pack_dir / "test.csv", roots)
        if missing:
            raise SystemExit(
                f"{len(missing)} frame paths do not resolve; first: {missing[0]}"
            )
        build_sun_test_corruptions(pack_dir, spec, roots, args.out)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
