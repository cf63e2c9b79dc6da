"""Environment-driven application settings.

Field-name compatible with the reference pydantic-settings config
(``server/app/settings.py:11-65``), plus TPU-specific execution knobs.
``pydantic_settings`` is not available in this image, so env/.env loading
is implemented directly on top of plain pydantic.

Two reference quirks are consciously fixed (documented per SURVEY §7):
- ``mapbox_access_token`` is optional here (the reference makes it required,
  which forces a token even for fully-offline runs).
- ``max_concurrent_enhance`` / ``max_upload_mb`` are real fields; the
  reference reads them via ``getattr`` on a model that never defines them
  (``server/app/main.py:66-68``), so they were silently always 1 / 50.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path
from typing import Optional

from pydantic import BaseModel


class Settings(BaseModel):
    # UP42 credentials (optional; offline mode works without them)
    up42_username: str = ""
    up42_password: str = ""
    up42_project_id: str = ""

    # Imagery search parameters
    days_lookback: int = 30
    max_cloud_pct: float = 10.0

    # Tiling parameters
    tile_min_zoom: int = 10
    tile_max_zoom: int = 16

    # Client configuration
    mapbox_access_token: str = ""

    # Paths
    aoi_path: str = "config/aoi.geojson"
    data_dir: str = "data"

    # Server
    server_host: str = "0.0.0.0"
    server_port: int = 8080

    # UP42 API configuration
    up42_auth_url: str = (
        "https://auth.up42.com/realms/public/protocol/openid-connect/token"
    )
    up42_api_base: str = "https://api.up42.com/v2"
    up42_catalog_url: str = "https://api.up42.com/catalog/stac/search"

    # Job orchestration (fixed quirk: real fields, see module docstring)
    max_concurrent_enhance: int = 1
    max_upload_mb: int = 50

    # --- TPU execution knobs (new) ---
    sr_tile_size: int = 256      # halo-tiling grid pitch (ref tile_size=256)
    # Halo width. The reference uses tile_pad=10
    # (cnn_super_resolution.py:172); 4 is measured byte-identical to the
    # exact whole-image forward on the full 23-block model (max float
    # deviation 0.0017 LSB on uniform noise and max-contrast stripes —
    # at the bf16 rounding floor of the pipeline itself) and lifts
    # 1024² throughput 1.348 → 1.469 MPix/s (BENCH_NOTES r3).
    sr_tile_pad: int = 4
    sr_batch_size: int = 16      # tiles per device batch
    sr_dtype: str = "bfloat16"   # compute dtype for the SR model
    # Exact-path engage ceiling in pixels (0 = family default: tile²·4
    # for rrdbnet, SWINIR_EXACT_AREA for swinir — engine.py). Above
    # this area images halo-tile; for SwinIR that path is approximate.
    sr_exact_area: int = 0
    # Per-checkpoint halo-exactness probe at engine build (engine.py
    # probe_halo_margin). Results are memoized per weight-file
    # fingerprint so only the first construction ever pays the probe
    # compiles; set false to skip it entirely (ADVICE r4).
    sr_pad_probe: bool = True
    mesh_shape: str = ""         # e.g. "dp=4,sp=2"; empty = all devices on dp
    offline: bool = True         # disable all network fetches (no-egress envs)
    weights_dir: str = "models"  # converted-weight cache directory

    @property
    def data_path(self) -> Path:
        return Path(self.data_dir)

    @property
    def max_upload_bytes(self) -> int:
        return self.max_upload_mb * 1024 * 1024


def _parse_env_file(path: Path) -> dict[str, str]:
    out: dict[str, str] = {}
    if not path.exists():
        return out
    for line in path.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        out[key.strip().lower()] = value.strip().strip("'\"")
    return out


def load_settings(env_file: Optional[Path | str] = ".env", **overrides) -> Settings:
    """Build Settings from (lowest→highest precedence) defaults → .env →
    process environment → explicit overrides. Names are case-insensitive,
    matching pydantic-settings behaviour in the reference."""
    values: dict[str, object] = {}
    if env_file is not None:
        values.update(_parse_env_file(Path(env_file)))
    env_lower = {k.lower(): v for k, v in os.environ.items()}
    for name in Settings.model_fields:
        if name in env_lower:
            values[name] = env_lower[name]
    values = {k: v for k, v in values.items() if k in Settings.model_fields}
    values.update(overrides)
    return Settings(**values)


@lru_cache()
def get_settings() -> Settings:
    return load_settings()
