# Developer workflow (reference parity: Makefile targets).

PY ?= python

.PHONY: test serve bench native pipeline pipeline-watch wow vectors tiles clean

test:
	$(PY) -m pytest tests/ -q

serve:
	$(PY) -m s2sr_tpu.cli.serve

bench:
	$(PY) bench.py

native:
	$(MAKE) -C s2sr_tpu/native

# --- smoke workflow against a running server (reference Makefile:279-324)
HOST ?= http://localhost:8080

pipeline:
	curl -s -X POST $(HOST)/api/pipeline -H 'Content-Type: application/json' \
	  -d '{"min_zoom":12,"max_zoom":14}'

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
