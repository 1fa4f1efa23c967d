# vqatpu developer entry points

.PHONY: test bench native native-test tsan clean runbook-smoke

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

native-test:
	$(MAKE) -C native test

tsan:
	$(MAKE) -C native tsan_test

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -prune -exec rm -rf {} +

runbook-smoke:
	python scripts/runbook_smoke.py
