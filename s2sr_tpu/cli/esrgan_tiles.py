"""CLI: high-zoom ESRGAN tiles (ref ``esrgan_tiles.py:196-312``)."""
import argparse
from pathlib import Path

from ..pipelines.esrgan_tiles import run_esrgan_and_tiles


def main() -> None:
    parser = argparse.ArgumentParser(description="ESRGAN z18-20 tiles")
    parser.add_argument("input")
    parser.add_argument("-o", "--output", default="./esrgan_tiles_output")
    parser.add_argument("--min-zoom", type=int, default=18)
    parser.add_argument("--max-zoom", type=int, default=20)
    parser.add_argument("--no-enhance", action="store_true")
    parser.add_argument("--skip-sr", action="store_true")
    parser.add_argument("--sr-output", default=None)
    args = parser.parse_args()
    result = run_esrgan_and_tiles(
        Path(args.input), Path(args.output),
        min_zoom=args.min_zoom, max_zoom=args.max_zoom,
        enhance_crops=not args.no_enhance,
        skip_sr=args.skip_sr, sr_output=args.sr_output,
    )
    print(f"{result['tile_count']} tiles -> {result['tiles_dir']}")


if __name__ == "__main__":
    main()
