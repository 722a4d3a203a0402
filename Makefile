# Top-level targets (the reference's Makefile builds six nvcc binaries,
# Makefile:1-31; here: native components + tests + bench).

.PHONY: all native test test-native bench rehearse clean

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -q

test-native: native
	python -m pytest tests/test_native.py -q

bench:
	python bench.py

# end-to-end rehearsal of the 76% recipe flag composition
# (docs/imagenet_76_recipe.md): tiny JPEG ImageFolder -> real CLI with
# SGD+warmup/step+smoothing+wd-mask+flip -> checkpoint -> fresh-process
# resume -> running-stats eval above chance
rehearse:
	python -m pytest tests/test_rehearsal.py -q

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
