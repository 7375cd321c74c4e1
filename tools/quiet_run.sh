#!/bin/bash
# Wait for a quiet CPU-steal window (< 0.5 steal-s over 15 s), then exec
# the given command. Gives up waiting after ~20 min and runs anyway
# (prints a warning) so unattended sessions cannot hang forever.
deadline=$((SECONDS + 1200))
while true; do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 15
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1 - s0))
  if [ "$d" -lt 50 ]; then break; fi
  echo "# quiet_run: steal ${d} cs / 15s — waiting" >&2
  if [ $SECONDS -gt $deadline ]; then
    echo "# quiet_run: giving up waiting, running under contention" >&2
    break
  fi
done
exec "$@"
