.PHONY: test bench format

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

format:
	python -m ruff format lanczos_adjoints_tpu tests experiments 2>/dev/null || true
