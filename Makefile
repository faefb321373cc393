# Developer entry points (see README.md / CLAUDE.md for details)

.PHONY: test bench bench-train dryrun parity-real native clean

test:
	python -m pytest tests/ -q

bench:            ## serving throughput on the local chip (one JSON line)
	python bench.py

bench-train:      ## training throughput
	python bench_train.py

dryrun:           ## multi-chip sharding dry-run on an 8-device virtual mesh
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# real-data parity drill: zoo ckpt -> official val accuracy -> EvalAI
# test-dev dump (needs VQA-v2 data on disk; runbook in docs/ACCURACY.md)
parity-real:
	python -m mcan_vqa_tpu.cli.run_vqa --run=parity --model=small \
	    --ckpt_path=$(CKPT)

native:           ## (re)build the C++ batch assembler
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
	    mcan_vqa_tpu/native/batcher.cpp -o mcan_vqa_tpu/native/libbatcher.so

clean:
	rm -rf .jax_cache mcan_vqa_tpu/native/libbatcher.so \
	    $(shell find . -name __pycache__ -type d)
