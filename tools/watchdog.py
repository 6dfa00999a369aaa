"""Freeze watchdog for long TPU runs (round-5, VERDICT r4 item 8).

The tunneled TPU occasionally wedges a device->host readback with no
self-recovery (r4 incident: a 1000-item eval froze at batch 141/250 with
frozen CPU time for 26 minutes). The harness already makes progress
durable (eval/test_loop.py flushes a ``.partial.npz`` every ~25 batches
and resumes from it); this wrapper supplies the detect-kill-cooloff-
restart loop around any such self-resuming command:

    python tools/watchdog.py --stall-s 180 -- python test.py ...

Detection: the child's *CPU time* (utime+stime from /proc/<pid>/stat,
the same signal used to diagnose the r3/r4 incidents by hand) is polled
every ``--poll-s``; wall time is NOT used, because a healthy sampler
spends long stretches waiting on the device while CPU time still ticks
from the polling RPCs. A frozen CPU-time reading for ``--stall-s``
seconds declares the run wedged.

Recovery: the child python process (launched directly, NO shell — so the
kill hits the TPU client itself, never a wrapper) gets SIGKILL, then the
tunnel is left completely untouched for ``--cooloff-s`` (the r3 lesson:
killing a client with in-flight work poisons the tunnel and every new
contact during cleanup re-wedges it; >=10 min of zero contact recovers),
then the command is relaunched and resumes from its partial flushes.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def cpu_time_s(pid: int) -> float | None:
    """utime+stime of pid in seconds, or None if the process is gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            fields = f.read().rsplit(")", 1)[1].split()
        # fields[11], fields[12] are utime, stime (14th/15th of full stat)
        return (int(fields[11]) + int(fields[12])) / os.sysconf("SC_CLK_TCK")
    except (FileNotFoundError, ProcessLookupError, IndexError, ValueError):
        return None


def run_once(cmd: list[str], stall_s: float, poll_s: float) -> int | None:
    """Run cmd; return its exit code, or None if it was killed as wedged."""
    child = subprocess.Popen(cmd)   # no shell: kill hits the TPU client
    last_cpu = -1.0
    last_change = time.monotonic()
    try:
        while True:
            try:
                code = child.wait(timeout=poll_s)
                return code
            except subprocess.TimeoutExpired:
                pass
            cpu = cpu_time_s(child.pid)
            if cpu is None:
                return child.wait()
            if cpu != last_cpu:
                last_cpu = cpu
                last_change = time.monotonic()
            elif time.monotonic() - last_change > stall_s:
                print(f"[watchdog] CPU time frozen at {cpu:.1f}s for "
                      f">{stall_s:.0f}s — killing pid {child.pid}",
                      file=sys.stderr, flush=True)
                child.send_signal(signal.SIGKILL)
                child.wait()
                return None
    except KeyboardInterrupt:
        child.send_signal(signal.SIGTERM)
        child.wait()
        raise


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="CPU-time stall watchdog for TPU runs",
        usage="watchdog.py [options] -- CMD [ARGS...]")
    ap.add_argument("--stall-s", type=float, default=180.0,
                    help="frozen-CPU-time window that declares a wedge")
    ap.add_argument("--poll-s", type=float, default=15.0)
    ap.add_argument("--cooloff-s", type=float, default=600.0,
                    help="zero-TPU-contact wait after a kill (tunnel "
                         "poisoning recovery, >=10 min)")
    ap.add_argument("--max-restarts", type=int, default=3)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- separated command to supervise")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: watchdog.py [options] -- cmd ...)")

    for attempt in range(args.max_restarts + 1):
        code = run_once(cmd, args.stall_s, args.poll_s)
        if code is not None:
            if code != 0:
                print(f"[watchdog] command exited rc={code}",
                      file=sys.stderr, flush=True)
            return code
        if attempt == args.max_restarts:
            print("[watchdog] max restarts exhausted", file=sys.stderr)
            return 75   # EX_TEMPFAIL
        print(f"[watchdog] cooling off {args.cooloff_s:.0f}s before "
              f"restart {attempt + 1}/{args.max_restarts} (no TPU "
              "contact)", file=sys.stderr, flush=True)
        time.sleep(args.cooloff_s)
    return 75


if __name__ == "__main__":
    sys.exit(main())
