#!/bin/bash
# Run a command in the warm sbt tmux session and wait for the prompt.
# Usage: tools/sbtrun.sh "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out" [timeout_s]
set -u
CMD="$1"
TIMEOUT="${2:-600}"
tmux clear-history -t sbt
tmux send-keys -t sbt "$CMD" Enter
sleep 3
start=$(date +%s)
while true; do
  last=$(tmux capture-pane -t sbt -p | grep -v '^$' | tail -1)
  if [[ "$last" == *"stakehouseetlspark"* && "$last" != *"$CMD"* ]]; then
    break
  fi
  if (( $(date +%s) - start > TIMEOUT )); then
    echo "TIMEOUT waiting for sbt" >&2
    break
  fi
  sleep 5
done
# Print compile errors and the final status line (skip Spark WARN noise).
tmux capture-pane -t sbt -pS -20000 | grep -E "^\[(error|success)\]" | grep -v " WARN " | tail -30
