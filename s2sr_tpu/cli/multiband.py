"""CLI: multiband B04/B08/SCL fetch (ref ``fetch_multiband.py:196-210``)."""
import argparse
from pathlib import Path

from ..config import get_settings
from ..fetch.multiband import FetchConfig, fetch_and_stack_multiband
from ..fetch.smart_fetch import load_aoi_geometry


def main() -> None:
    parser = argparse.ArgumentParser(description="Fetch multiband stack")
    parser.add_argument("--aoi", default=None)
    parser.add_argument("-o", "--output", default="data/source")
    parser.add_argument("--max-days", type=int, default=30)
    parser.add_argument("--max-cloud", type=float, default=30.0)
    parser.add_argument("--size", type=int, default=1024)
    args = parser.parse_args()
    aoi = load_aoi_geometry(args.aoi or get_settings().aoi_path)
    path, meta = fetch_and_stack_multiband(
        aoi, Path(args.output),
        FetchConfig(max_age_days=args.max_days, max_cloud_pct=args.max_cloud,
                    out_size=args.size))
    print(f"Stacked multiband: {path}\n  {meta}")


if __name__ == "__main__":
    main()
