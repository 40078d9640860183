#!/usr/bin/env bash
# One-command health check (used between sessions / before handing the
# repo to the driver):
#   scripts/check.sh        fast tier (~5 min) + driver contracts
#   scripts/check.sh full   full suite (~25 min) + driver contracts
# TPU is NOT required: tests force CPU; the entry compile check runs on
# whatever backend the sandbox pins (axon TPU when the tunnel is up).
set -euo pipefail
cd "$(dirname "$0")/.."

MARK='-m "not slow"'
[ "${1:-}" = "full" ] && MARK=""

echo "== pytest ${MARK:-(full)}"
if [ -n "$MARK" ]; then
  python -m pytest tests/ -m "not slow" -q
else
  python -m pytest tests/ -q
fi

echo "== dryrun_multichip(8) (virtual CPU mesh)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun ok')
"

echo "== entry() compile check"
python -c "
import __graft_entry__ as g
import jax
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print('entry compile ok')
"

echo "ALL CHECKS PASSED"
