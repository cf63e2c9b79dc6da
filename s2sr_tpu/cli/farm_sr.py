"""CLI: farm SR pipeline (ref ``farm_sr.py`` __main__)."""
import argparse
from pathlib import Path

from ..pipelines.farm_sr import process_farm_sr


def main() -> None:
    parser = argparse.ArgumentParser(description="Farm Super-Resolution")
    parser.add_argument("input")
    parser.add_argument("-o", "--output", default="./farm_sr_output")
    parser.add_argument("-s", "--scale", type=int, default=4)
    parser.add_argument("--weights-dir", default="models")
    args = parser.parse_args()
    result = process_farm_sr(Path(args.input), Path(args.output),
                             scale=args.scale, weights_dir=args.weights_dir)
    print(f"Results: {result['outputs']}")


if __name__ == "__main__":
    main()
