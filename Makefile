# Developer entry points (see README.md / CLAUDE.md for details)

.PHONY: test bench bench-train dryrun native clean

test:
	python -m pytest tests/ -q

bench:            ## serving throughput on the local chip (one JSON line)
	python bench.py

bench-train:      ## training throughput
	python bench_train.py

dryrun:           ## multi-chip sharding dry-run on an 8-device virtual mesh
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

native:           ## (re)build the C++ batch assembler
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
	    mcan_vqa_tpu/native/batcher.cpp -o mcan_vqa_tpu/native/libbatcher.so

clean:
	rm -rf .jax_cache mcan_vqa_tpu/native/libbatcher.so \
	    $(shell find . -name __pycache__ -type d)
