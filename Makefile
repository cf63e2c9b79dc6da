# Developer workflow (reference parity: Makefile targets).

PY ?= python

.PHONY: help test serve bench native fetch smart-fetch tile sr sr-x2 sr-tile \
        wow-file multiband vectors-v2 vectors-ndvi up down logs shell \
        pipeline pipeline-fast pipeline-farm pipeline-status pipeline-watch \
        pipeline-full wow vectors vectors-api vectors-status tiles clean

help:            ## list targets (reference Makefile:8)
	@grep -E '^[a-z-]+:.*##' $(MAKEFILE_LIST) | \
	  awk -F':.*##' '{printf "  %-18s %s\n", $$1, $$2}'
	@echo "  (plus: test serve bench native fetch tile sr wow-file" \
	      "multiband vectors-v2 up down pipeline* wow vectors* clean)"

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

logs:            ## tail the server container logs (reference Makefile:277)
	docker compose logs -f server

shell:           ## shell into the server container (reference Makefile:281)
	docker compose exec server /bin/bash

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

pipeline-status: ## last pipeline job status (reference Makefile:317)
	@curl -s $(HOST)/api/pipelines | $(PY) -c "import json,sys; \
	j=json.load(sys.stdin)['jobs']; \
	k=sorted(j)[-1] if j else sys.exit('no pipeline jobs'); \
	print(json.dumps(j[k], indent=2))"

pipeline-full:   ## pipeline then vectors when done (reference Makefile:457)
	@curl -s -X POST $(HOST)/api/pipeline -H 'Content-Type: application/json' -d '{}'
	@echo; echo "waiting for pipeline, then extracting vectors..."
	@while curl -s $(HOST)/api/pipelines | grep -q '"status": "processing"'; do sleep 5; done
	@curl -s -X POST $(HOST)/api/vectors -H 'Content-Type: application/json' -d '{}'

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

vectors-api:     ## trigger extraction with explicit params (reference Makefile:438)
	curl -s -X POST $(HOST)/api/vectors -H 'Content-Type: application/json' \
	  -d '{"min_area_ha": 0.5, "max_area_ha": 500, "simplify_tolerance": 1.0}'

vectors-status:
	curl -s $(HOST)/api/vectors/metadata

tiles:
	$(PY) -m s2sr_tpu.cli.tile $(INPUT) -o data/tiles

clean:
	rm -rf data/tiles data/tiles_sr data/tiles_wow data/sr data/wow data/uploads
