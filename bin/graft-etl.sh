#!/usr/bin/env bash
# Daemon process packaging for the graft billing launcher — the operational
# twin of the reference's nohup wrapper (billing-etl.sh:1-103: start/stop/
# status/log around its scheduler process). The in-process schedule loop is
# graft.pipeline.Launcher --daemon HH:mm; this script owns the OS-level
# lifecycle: background launch, pid file, liveness checks, log tailing.
#
# Usage:
#   graft-etl.sh start <odsPath> <dimPath> <targetPath> [extra Launcher args]
#   graft-etl.sh stop | status | log [-f]
#
# Configuration (env):
#   GRAFT_JAR        path to the assembled graft jar (required for start)
#   GRAFT_SPARK_SUBMIT  spark-submit binary      [default: spark-submit]
#   GRAFT_MASTER     Spark master                [default: local[*]]
#   GRAFT_DAEMON_AT  daily fire time HH:mm       [default: 05:00]
#   GRAFT_HOME       pid/log directory           [default: ~/.graft-etl]
set -euo pipefail

GRAFT_HOME="${GRAFT_HOME:-$HOME/.graft-etl}"
PID_FILE="$GRAFT_HOME/graft-etl.pid"
LOG_FILE="$GRAFT_HOME/graft-etl.log"

alive() {
  [[ -f "$PID_FILE" ]] && kill -0 "$(cat "$PID_FILE")" 2>/dev/null
}

case "${1:-}" in
  start)
    shift
    [[ $# -ge 3 ]] || { echo "usage: $0 start <odsPath> <dimPath> <targetPath> [args]" >&2; exit 2; }
    [[ -n "${GRAFT_JAR:-}" ]] || { echo "set GRAFT_JAR to the graft assembly jar" >&2; exit 2; }
    if alive; then
      echo "already running (pid $(cat "$PID_FILE"))" >&2; exit 1
    fi
    mkdir -p "$GRAFT_HOME"
    # one long-lived driver; the Launcher loop fires one tick per day.
    # setsid + nohup: survive the invoking shell/session exactly like the
    # reference wrapper's nohup-daemonization.
    setsid nohup "${GRAFT_SPARK_SUBMIT:-spark-submit}" \
      --master "${GRAFT_MASTER:-local[*]}" \
      --class graft.pipeline.Launcher \
      "$GRAFT_JAR" \
      "$@" --daemon "${GRAFT_DAEMON_AT:-05:00}" \
      >>"$LOG_FILE" 2>&1 &
    echo $! >"$PID_FILE"
    # sanity: the recorded pid must actually be the live daemon (if setsid
    # forked — job-control shells — $! is a vanished parent; fail loudly
    # instead of leaving a pid file that stop/status would mis-target)
    sleep 1
    if ! alive; then
      rm -f "$PID_FILE"
      echo "daemon failed to start or forked away; see $LOG_FILE" >&2
      exit 1
    fi
    echo "started (pid $(cat "$PID_FILE")), log: $LOG_FILE"
    ;;
  stop)
    if alive; then
      pid=$(cat "$PID_FILE")
      # Signal the daemon's ACTUAL process group, read live from ps — the
      # recorded pid need not be the group leader (under job control,
      # `setsid cmd &` forks and the shell's $! is the stale parent), and
      # assuming `-$pid` would then signal a dead or wrong group. Guard
      # against signaling our own group; fall back to the bare pid.
      pgid=$(ps -o pgid= -p "$pid" 2>/dev/null | tr -d '[:space:]')
      mygid=$(ps -o pgid= -p $$ 2>/dev/null | tr -d '[:space:]')
      term() {
        if [[ -n "$pgid" && "$pgid" != "$mygid" ]]; then
          kill "-$1" -- "-$pgid" 2>/dev/null || kill "-$1" "$pid" 2>/dev/null
        else
          kill "-$1" "$pid" 2>/dev/null
        fi
      }
      term TERM
      for _ in $(seq 1 30); do alive || break; sleep 1; done
      if alive; then term KILL; fi
      rm -f "$PID_FILE"
      echo "stopped"
    else
      rm -f "$PID_FILE"
      echo "not running"
    fi
    ;;
  status)
    if alive; then echo "running (pid $(cat "$PID_FILE"))"
    else echo "not running"; exit 1; fi
    ;;
  log)
    [[ -f "$LOG_FILE" ]] || { echo "no log at $LOG_FILE" >&2; exit 1; }
    if [[ "${2:-}" == "-f" ]]; then tail -f "$LOG_FILE"; else tail -n 200 "$LOG_FILE"; fi
    ;;
  *)
    echo "usage: $0 {start <ods> <dim> <target> [args]|stop|status|log [-f]}" >&2
    exit 2
    ;;
esac
