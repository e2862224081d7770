# Test tiers (this environment is single-core; budget accordingly).
#
# fast  (~4-5 min): per-component smoke across every layer the build plan
#        names (SURVEY §7) — DSP contract (stft/ops), data protocol,
#        loss+metrics, closed-loop scoring machinery, and the end-to-end
#        pipeline graph — with the multi-minute tiny training loops
#        (marker `e2e`) excluded. Run after every change.
# full  (~70 min single process): the whole suite, one process, the
#        known-green gate (module-scoped jax cache clearing in
#        tests/conftest.py bounds XLA-CPU growth; three consecutive green
#        runs recorded round 3). Includes the e2e loops.
# full-sharded (~70 min, bounded memory): one pytest process per test
#        module — the recipe that is green even without the in-process
#        cache discipline; use when debugging a suspected cross-module
#        resource interaction.
#
# `-m slow` tests (full-size model on CPU) stay opt-in: pytest -m slow.

FAST_MODULES = tests/test_stft.py tests/test_ops.py tests/test_data.py \
  tests/test_loss_metrics.py tests/test_closed_loop.py tests/test_pipeline.py \
  tests/test_pallas.py tests/test_band_probe.py

.PHONY: test-fast test-full test-full-sharded

test-fast:
	python -m pytest -q -m "not slow and not e2e" $(FAST_MODULES)

test-full:
	python -m pytest -q tests/

test-full-sharded:
	@set -e; for f in tests/test_*.py; do \
	  echo "== $$f"; python -m pytest -q "$$f"; \
	done
