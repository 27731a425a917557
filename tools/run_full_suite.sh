#!/bin/bash
# Round hygiene (VERDICT r4 #6): a dated, COMMITTED green-run record of the
# FULL suite (fast + slow tiers, 284+ collected) each round, so the fast
# tier's `-m "not slow"` deselection can't silently hide rot in the slow
# tests (reference goldens, trainer e2e, sharded tiled parity).
#
# Usage: bash tools/run_full_suite.sh    (CPU-only; ~65-80 min with a warm
# .jax_cache on this 1-core box) — then commit the .ci/ log it prints.
set -u
cd "$(dirname "$0")/.."
mkdir -p .ci
# Stability defaults for this box (overridable): after a host migration
# changed the machine features, XLA-CPU codegen at the default ISA
# segfaulted two full runs (2026-08-21: once in the compile-cache write,
# once inside backend_compile_and_load — stacks in the committed .ci
# logs). Capping codegen at AVX2 and disabling cache WRITES (reads stay
# warm) ran the fast tier green; SUITE_XLA_ISA='' reverts.
ISA=${SUITE_XLA_ISA-AVX2}
if [ -n "$ISA" ]; then
    export XLA_FLAGS="${XLA_FLAGS:-} --xla_cpu_max_isa=$ISA"
    export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-1000000000}
fi
STAMP=$(date -u +%Y%m%dT%H%M%SZ)
LOG=".ci/full_suite_${STAMP}.log"
{
    echo "# full suite @ ${STAMP}  HEAD=$(git rev-parse --short HEAD)"
    python -m pytest tests/ -q 2>&1
    echo "pytest rc=$?"
} | tee "$LOG"
echo "[full-suite] record written: $LOG (commit it)"
