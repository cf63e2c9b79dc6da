"""CLI: convert released torch checkpoints to the framework's .npz cache."""
import argparse
from pathlib import Path

from ..models.weights import convert_checkpoint


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Convert a Real-ESRGAN .pth to .npz")
    parser.add_argument("pth")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()
    out = Path(args.output) if args.output else Path(args.pth).with_suffix(".npz")
    path = convert_checkpoint(Path(args.pth), out)
    print(f"Converted -> {path}")


if __name__ == "__main__":
    main()
