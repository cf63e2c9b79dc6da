"""s2sr_tpu — TPU-native Sentinel-2 super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``fieldin/sentinel2-super-resolution-poc`` (the reference service):

- x4 GAN super-resolution (RRDBNet / Real-ESRGAN family, SwinIR) as
  jit-compiled Flax models with Pallas hot kernels, batched halo-tiled
  inference sharded over a TPU device mesh (instead of the reference's
  sequential CPU per-tile loop, ``server/app/cnn_super_resolution.py:236-280``).
- The "WOW" crop-enhancement chain (CLAHE + unsharp + vegetation boost,
  ``server/app/wow_sr.py:187-209``) as one fused on-device op chain.
- GeoTIFF I/O, Web-Mercator warping and XYZ tile-pyramid generation as
  batched JAX ops (replacing GDAL subprocess calls,
  ``server/app/tiling.py``), with a native PNG encoder at the edge.
- NDVI / vegetation masking, watershed field segmentation and vector
  extraction (``server/app/vector_extraction*.py``) vectorised in JAX.
- The HTTP job API (``server/app/main.py``) on an asyncio-native server.

Layout:
    config/     env + request configuration         (ref settings.py)
    utils/      logging, retry, json, timing        (ref utils.py)
    geo/        affine, CRS math, GeoTIFF codec     (ref rasterio/GDAL usage)
    models/     RRDBNet, SwinIR, EDSR/ESPCN/LapSRN  (ref cnn_super_resolution.py, swinir.py, super_resolution.py)
    ops/        image/compute ops incl. Pallas kernels
    parallel/   mesh + batched halo tiling engine
    tiles/      mercator math, pyramid, PNG, tileset.json (ref tiling.py)
    fetch/      STAC/smart-fetch/UP42/multiband     (ref smart_fetch.py, up42_client.py, fetch_multiband.py)
    vectors/    field polygon extraction v1/v2      (ref vector_extraction*.py)
    decode/     QR codec v1-40 + serial extraction  (ref client qr-ocr.service.ts)
    pipelines/  wow/farm/standard SR + tiles        (ref wow_sr.py, farm_sr.py, super_resolution.py, esrgan_tiles.py)
    server/     HTTP API + job orchestration        (ref main.py)
    training/   optax train step, sharded over mesh (new capability)
    cli/        command line entry points
"""

__version__ = "0.1.0"
