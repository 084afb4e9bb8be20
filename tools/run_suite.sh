#!/usr/bin/env bash
# Run the full test suite sharded across a few FRESH pytest processes.
#
# Why: a single long-lived pytest process accumulates hundreds of XLA:CPU
# executables and can hit a flaky compiler segfault mid-suite (observed at
# ~50% while compiling the MSG3D backbone — the same file passes in
# isolation, and each half of the suite passes cleanly).  Sharding bounds
# the per-process executable count; a shard that dies to the flake is
# retried ONCE in a fresh process before being counted as a failure.
#
# Usage:  bash tools/run_suite.sh [pytest-args...]
#   SHARDS=N   number of shard processes (default 3)
#   PARALLEL=1 run shards concurrently (default: sequential — deterministic
#              logs; the box has 4 cores and jax compiles multi-threaded)
#
# Exit 0 iff every shard (after at most one retry each) is green.
set -u
cd "$(dirname "$0")/.."
SHARDS=${SHARDS:-3}
PARALLEL=${PARALLEL:-0}
LOGDIR=$(mktemp -d /tmp/suite_XXXX)

mapfile -t FILES < <(ls tests/test_*.py | sort)
declare -a GROUP
for i in "${!FILES[@]}"; do
    s=$((i % SHARDS))
    GROUP[s]="${GROUP[s]:-} ${FILES[i]}"
done

run_shard() {
    local s=$1; shift
    local files=$1; shift
    local log="$LOGDIR/shard$s.log"
    # shellcheck disable=SC2086
    python -m pytest $files -q "$@" >"$log" 2>&1
    local rc=$?
    if [ $rc -ne 0 ]; then
        echo "[suite] shard $s rc=$rc — retrying once in a fresh process" >&2
        # shellcheck disable=SC2086
        python -m pytest $files -q "$@" >"$log.retry" 2>&1
        rc=$?
        [ $rc -eq 0 ] && mv "$log.retry" "$log"
    fi
    return $rc
}

overall=0
pids=()
for s in $(seq 0 $((SHARDS - 1))); do
    if [ "$PARALLEL" = "1" ]; then
        run_shard "$s" "${GROUP[s]}" "$@" &
        pids+=($!)
    else
        run_shard "$s" "${GROUP[s]}" "$@" || overall=1
        tail -2 "$LOGDIR/shard$s.log"
    fi
done
if [ "$PARALLEL" = "1" ]; then
    for i in "${!pids[@]}"; do
        wait "${pids[i]}" || overall=1
        tail -2 "$LOGDIR/shard$i.log"
    done
fi

echo "[suite] logs: $LOGDIR"
if [ $overall -eq 0 ]; then
    echo "[suite] GREEN ($SHARDS shards)"
else
    echo "[suite] FAILURES — see $LOGDIR"
fi
exit $overall
