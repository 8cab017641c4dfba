# Shared queue plumbing (VERDICT r4 #8: queue scripts must fail loudly).
# Source this from a queue script after setting QDIR (log directory).
#
# Provides:
#   preflight        - verifies every entry point resolves BEFORE any
#                      stage burns chip time (the r4e queue died with
#                      exit=127 on a missing console script and silently
#                      committed four empty logs)
#   run TO NAME CMD… - timeout-bounded stage; records exit in ST[NAME]
#                      and returns it
#   ok NAME…         - gate: true iff all named stages ran and exited 0
#   queue_done       - prints STATUS lines, writes $QDIR/FAILED listing
#                      every non-zero stage, and exits non-zero if any
#                      stage failed
#
# Entry points are invoked as `python -m` (P2C_TRAIN etc.) — the venv
# has no console scripts installed for this repo, which is exactly how
# the r4e queue failed.
set -u

: "${QDIR:?queue_lib.sh: set QDIR before sourcing}"
mkdir -p "$QDIR"

# persistent XLA compile cache: queue stages re-compile identical
# programs (6 staging seeds = 1 program; 6 joints = 1 program); through
# the remote-compile tunnel each compile is minutes, a cache hit is
# seconds (verified to work against the axon backend)
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

P2C_TRAIN="python -m point2cyl_tpu.train.train_pc"
P2C_TRAIN_JOINT="python -m point2cyl_tpu.train.train_joint"
P2C_EVAL="python -m point2cyl_tpu.eval.evaluator"
P2C_VISUALIZE="python -m point2cyl_tpu.recon.reconstruct"
P2C_EXPORT="python -m point2cyl_tpu.serve.export"
AB=/root/repo/tools/ab_accuracy.py

declare -A ST  # stage name -> exit status

preflight() {
  local mod rc=0
  for mod in point2cyl_tpu.train.train_pc point2cyl_tpu.train.train_joint \
             point2cyl_tpu.eval.evaluator; do
    if ! python -c "import importlib; importlib.import_module('$mod')" \
        2> "$QDIR/preflight_err.txt"; then
      echo "=== PREFLIGHT FAILED: cannot import $mod" | tee "$QDIR/FAILED"
      cat "$QDIR/preflight_err.txt"
      rc=1
    fi
  done
  [[ $rc -ne 0 ]] && exit 1
  echo "=== preflight ok $(date -u +%H:%M:%S)"
}

run() {
  local to=$1 name=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S): $*"
  timeout "$to" "$@" > "$QDIR/$name.log" 2>&1
  ST[$name]=$?
  echo "=== $name exit=${ST[$name]} $(date -u +%H:%M:%S)"
  if [[ ${ST[$name]} -ne 0 ]]; then
    echo "=== $name FAILED (exit ${ST[$name]}); log tail:"
    tail -5 "$QDIR/$name.log" | sed 's/^/    /'
  fi
  return "${ST[$name]}"
}

ok() {
  local s  # MUST be local: without it the loop clobbers the caller's $s
  for s in "$@"; do
    [[ "${ST[$s]:-missing}" == "0" ]] || {
      echo "=== SKIP (dep $s failed: ${ST[$s]:-missing})"; return 1
    }
  done
}

queue_done() {
  local s bad=0
  echo "=== queue done $(date -u +%H:%M:%S)"
  : > "$QDIR/STATUS"
  for s in "${!ST[@]}"; do
    echo "STATUS $s=${ST[$s]}" | tee -a "$QDIR/STATUS"
    [[ "${ST[$s]}" != "0" ]] && bad=1
  done
  if [[ $bad -ne 0 ]]; then
    grep -v '=0$' "$QDIR/STATUS" > "$QDIR/FAILED"
    echo "=== QUEUE HAD FAILURES (see $QDIR/FAILED)"
    exit 1
  fi
  rm -f "$QDIR/FAILED"
  exit 0
}
