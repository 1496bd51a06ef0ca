#!/usr/bin/env bash
# Black-box integration test — the reference's scripts/test-go.sh:1-7 shape:
# boot the daemon, run the foreign-process client against the live socket,
# kill the exact server PID, propagate the client's exit status.
set -u
cd "$(dirname "$0")/.."
SOCK="${TMPDIR:-/tmp}/dusk-uds-blindbid-test-$$"

python -m dusk_blindbidproof_tpu.server --bind-path "$SOCK" --log-level warn &
SERVER_PID=$!
for _ in $(seq 1 600); do
  [ -S "$SOCK" ] && break
  kill -0 "$SERVER_PID" 2>/dev/null || { echo 'server died at boot' >&2; exit 1; }
  sleep 0.5
done

python scripts/uds_client.py --bind-path "$SOCK"
STATUS=$?

kill -15 "$SERVER_PID" 2>/dev/null
wait "$SERVER_PID" 2>/dev/null
rm -f "$SOCK"
exit $STATUS
