# Developer workflow (reference parity: Makefile targets).

PY ?= python

.PHONY: test serve bench native fetch smart-fetch tile sr sr-x2 sr-tile \
        wow-file multiband vectors-v2 vectors-ndvi up down \
        pipeline pipeline-fast pipeline-farm pipeline-watch wow vectors tiles clean

test:
	$(PY) -m pytest tests/ -q

serve:
	$(PY) -m s2sr_tpu.cli.serve

bench:
	$(PY) bench.py

native:
	$(MAKE) -C s2sr_tpu/native

# --- individual CLI steps (reference Makefile fetch/tile/sr/... targets)

fetch:
	$(PY) -m s2sr_tpu.cli.fetch

smart-fetch:
	$(PY) -m s2sr_tpu.cli.fetch  # fetch IS smart-fetch here (same decision rules)

tile:
	$(PY) -m s2sr_tpu.cli.tile $(INPUT) -o data/tiles

# sr_cli takes the input GeoTIFF: make sr INPUT=data/source/x.tif
sr:
	$(PY) -m s2sr_tpu.cli.sr_cli $(INPUT) --scale 4

sr-x2:
	$(PY) -m s2sr_tpu.cli.sr_cli $(INPUT) --scale 2

sr-tile:
	$(PY) -m s2sr_tpu.cli.sr_cli $(INPUT) --scale 4 --tile --max-zoom 20

wow-file:
	@if [ -z "$(FILE)" ]; then echo "Usage: make wow-file FILE=data/source/x.tif"; exit 1; fi
	$(PY) -m s2sr_tpu.cli.wow_sr $(FILE) -o data/wow

multiband:
	$(PY) -m s2sr_tpu.cli.multiband --aoi config/aoi.geojson -o data/source

# vectors_v2 takes one raster: make vectors-v2 RASTER=data/source/x.tif
vectors-v2:
	$(PY) -m s2sr_tpu.cli.vectors_v2 $(RASTER) --aoi config/aoi.geojson \
	  -o data/vectors

vectors-ndvi: multiband
	$(PY) -m s2sr_tpu.cli.vectors_v2 $$(ls -t data/source/*_multiband.tif | head -1) \
	  --aoi config/aoi.geojson -o data/vectors --no-roads --no-zones

up:
	docker compose up --build -d

down:
	docker compose down

# --- smoke workflow against a running server (reference Makefile:279-324)
HOST ?= http://localhost:8080

pipeline:
	curl -s -X POST $(HOST)/api/pipeline -H 'Content-Type: application/json' \
	  -d '{"min_zoom":12,"max_zoom":14}'

pipeline-fast:
	curl -s -X POST $(HOST)/api/pipeline -H 'Content-Type: application/json' \
	  -d '{"run_sr": false}'

pipeline-farm:
	curl -s -X POST $(HOST)/api/pipeline -H 'Content-Type: application/json' \
	  -d '{"sr_type": "farm"}'

pipeline-watch:
	@while true; do \
	  curl -s $(HOST)/api/pipelines | $(PY) -c "import json,sys; \
	j=json.load(sys.stdin)['jobs']; \
	[print(k, v['status'], '|', v['message'][:70]) for k,v in sorted(j.items())[-3:]]"; \
	  sleep 5; done

wow:
	curl -s -X POST $(HOST)/api/wow -H 'Content-Type: application/json' -d '{}'

vectors:
	curl -s -X POST $(HOST)/api/vectors -H 'Content-Type: application/json' -d '{}'

vectors-status:
	curl -s $(HOST)/api/vectors/metadata

tiles:
	$(PY) -m s2sr_tpu.cli.tile $(INPUT) -o data/tiles

clean:
	rm -rf data/tiles data/tiles_sr data/tiles_wow data/sr data/wow data/uploads
