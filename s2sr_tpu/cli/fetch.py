"""CLI: smart fetch (ref ``smart_fetch.py:388-418`` / ``fetch.py:18-95``)."""
import argparse

from ..fetch.smart_fetch import ensure_best_image


def main() -> None:
    parser = argparse.ArgumentParser(description="Smart-fetch best Sentinel-2 scene")
    parser.add_argument("--max-days", type=int, default=30)
    parser.add_argument("--max-cloud", type=float, default=30.0)
    parser.add_argument("--force", action="store_true")
    args = parser.parse_args()
    path, metadata = ensure_best_image(
        max_age_days=args.max_days, max_cloud_cover=args.max_cloud,
        force_fetch=args.force,
    )
    print(f"Best image: {path}")
    print(f"  Scene ID: {metadata.get('scene_id', 'N/A')}")
    print(f"  Date: {metadata.get('acquisition_date', 'N/A')}")
    print(f"  Cloud: {metadata.get('cloud_cover_pct', 'N/A')}%")


if __name__ == "__main__":
    main()
