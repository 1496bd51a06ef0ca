#!/usr/bin/env bash
# Black-box IPC benchmark — the reference's scripts/bench-go.sh:1-7 shape:
# boot the daemon, run N timed prove+verify round trips over the socket
# (BenchmarkProveVerify analog), kill the exact server PID.
set -u
cd "$(dirname "$0")/.."
SOCK="${TMPDIR:-/tmp}/dusk-uds-blindbid-bench-$$"
N="${1:-8}"

python -m dusk_blindbidproof_tpu.server --bind-path "$SOCK" --log-level warn &
SERVER_PID=$!
for _ in $(seq 1 600); do
  [ -S "$SOCK" ] && break
  kill -0 "$SERVER_PID" 2>/dev/null || { echo 'server died at boot' >&2; exit 1; }
  sleep 0.5
done

python scripts/uds_client.py --bind-path "$SOCK" --bench "$N"
STATUS=$?

kill -15 "$SERVER_PID" 2>/dev/null
wait "$SERVER_PID" 2>/dev/null
rm -f "$SOCK"
exit $STATUS
