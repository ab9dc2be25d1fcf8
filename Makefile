.PHONY: test bench native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-all:
	python benchmarks/bench_all.py

native:
	$(MAKE) -C native

dryrun:
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
