"""CLI: raster -> XYZ tile pyramid (ref ``tile.py:17-70``)."""
import argparse
from pathlib import Path

from ..tiles import process_raster_to_tiles


def main() -> None:
    parser = argparse.ArgumentParser(description="Generate XYZ tiles")
    parser.add_argument("input")
    parser.add_argument("-o", "--output", default="./tiles")
    parser.add_argument("--min-zoom", type=int, default=10)
    parser.add_argument("--max-zoom", type=int, default=16)
    args = parser.parse_args()
    meta = process_raster_to_tiles(Path(args.input), Path(args.output),
                                   min_zoom=args.min_zoom,
                                   max_zoom=args.max_zoom)
    print(f"Tileset: {meta}")


if __name__ == "__main__":
    main()
