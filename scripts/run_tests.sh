#!/usr/bin/env bash
# Sharded test runner: splits the suite into N pytest PROCESSES run
# sequentially, so no single process accumulates the whole suite's
# compiled executables.
#
# Why: on a 1-vCPU host the full single-process suite is ~35 min of
# single-core XLA compiles and once crashed with a transient segfault
# inside pxla.compile at ~85% of the run (docs/DEVNOTES.md "Full-suite
# run on the 1-CPU round-3b box"); the same test passes in isolation.
# Bounding per-process executable accumulation is the documented
# mitigation — this script is that mitigation as checked-in code.
#
# Usage:
#   scripts/run_tests.sh [N_SHARDS] [extra pytest args...]
# Defaults to 2 shards. Shards are deterministic: the compile-heavy
# files (measured by wall time on the round-3b box) are interleaved
# across shards so each process carries roughly half the compile load.
set -u
cd "$(dirname "$0")/.."

N_SHARDS="${1:-2}"
shift || true

# Compile-heavy files first (descending measured compile weight), so the
# round-robin below balances them across shards. Everything not listed
# is appended alphabetically (catches future test files automatically).
HEAVY=(
  tests/test_sift.py
  tests/test_pipeline_harris.py
  tests/test_parallel.py
  tests/test_strict.py
  tests/test_spec_compose.py
  tests/test_compose.py
  tests/test_pallas_kernels.py
  tests/test_stages_api.py
  tests/test_bundle_compact.py
  tests/test_tpu.py
)
ALL=()
for f in "${HEAVY[@]}"; do [ -f "$f" ] && ALL+=("$f"); done
for f in tests/test_*.py; do
  skip=0
  for h in "${ALL[@]}"; do [ "$f" = "$h" ] && skip=1 && break; done
  [ "$skip" = 0 ] && ALL+=("$f")
done

# Round-robin assignment.
declare -a SHARD_FILES
for i in "${!ALL[@]}"; do
  s=$((i % N_SHARDS))
  SHARD_FILES[$s]="${SHARD_FILES[$s]:-} ${ALL[$i]}"
done

overall=0
t0=$(date +%s)
for s in $(seq 0 $((N_SHARDS - 1))); do
  files=${SHARD_FILES[$s]:-}
  [ -z "$files" ] && continue
  echo "=== shard $((s + 1))/$N_SHARDS: $files"
  ts=$(date +%s)
  # shellcheck disable=SC2086
  python -m pytest $files -q "$@"
  rc=$?
  te=$(date +%s)
  echo "=== shard $((s + 1)) rc=$rc wall=$((te - ts))s"
  [ $rc -ne 0 ] && overall=$rc
done
t1=$(date +%s)
echo "=== total wall $((t1 - t0))s overall rc=$overall"
exit $overall
