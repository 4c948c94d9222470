# Developer entry points (the reference's Makefile/gridai.mk targets,
# minus the grid.ai cloud plumbing that doesn't apply here).

.PHONY: test test-fast native bench synth-dataset dataloader-bench \
	codec-validate clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

native:
	python -m movenet_tpu.native.build

bench:
	python bench.py

# synthesize a small kinetics-like dataset for smoke tests
synth-dataset:
	python -c "from movenet_tpu.data import make_synthetic_dataset; \
	  print(make_synthetic_dataset('datasets/kinetics_synth'))"

# dataloader stress test (the reference's gridai.mk:45-60 smoke job)
dataloader-bench:
	python -m movenet_tpu.data.bench_loader datasets/kinetics_synth

# one-time real-codec validation: synthesizes mp4s with REAL ffmpeg and
# asserts data/video.py == native/pipeline.cpp bit-identity + mp3 export.
# Run inside the Docker image (this CI image has no ffmpeg; the pytest
# suite covers the CLI contract with stub binaries instead).
codec-validate:
	python scripts/validate_codec.py

clean:
	rm -rf build *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
