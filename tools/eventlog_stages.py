"""Per-stage summary of a Spark event log — the instrument behind the
multi-JVM scaling diagnosis in BASELINE.md.

Reads one or more event logs (plain JSONL files, or `eventlog_v2_*`
rolling directories whose `events_*` parts may be zstd-compressed — Spark's
default codec; decompressed via the `zstd` CLI because this container has
no python zstandard module) and prints, per stage: wall time, summed task
run/CPU/GC/deserialize time and shuffle fetch-wait. The run-vs-CPU gap is
the python-worker wait (python CPU is invisible to executor task metrics),
fetch-wait isolates shuffle transport, and deserialize spikes mark per-JVM
class-loading ramp — the three quantities that separated "cross-JVM
serialization" from "cpuset fragmentation" and "JIT ramp" in round 5.

Usage:
    python tools/eventlog_stages.py /tmp/wcs-eventlog/eventlog_v2_app-*/ ...
    (enable logs on any run with --conf spark.eventLog.enabled=true
     --conf spark.eventLog.dir=file:///tmp/wcs-eventlog)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def _lines(path: str):
    """Yield event-log lines from a file or an eventlog_v2 directory."""
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        parts = [path]
    for part in parts:
        if part.endswith(".zstd"):
            p = subprocess.run(["zstd", "-d", "-q", "-c", part],
                               capture_output=True, text=True, check=True)
            yield from p.stdout.splitlines()
        else:
            with open(part) as f:
                yield from f


def analyze(path: str) -> None:
    stages: dict = {}
    for ln in _lines(path):
        try:
            e = json.loads(ln)
        except (ValueError, UnicodeDecodeError):
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            d = stages.setdefault(si["Stage ID"], _zero())
            d.update(name=si["Stage Name"].split(" ")[0],
                     tasks=si["Number of Tasks"],
                     sub=si.get("Submission Time", 0) / 1000.0,
                     wall=(si.get("Completion Time", 0) -
                           si.get("Submission Time", 0)) / 1000.0)
        elif ev == "SparkListenerTaskEnd":
            tm = e.get("Task Metrics") or {}
            s = stages.setdefault(e["Stage ID"], _zero())
            s["run"] += tm.get("Executor Run Time", 0) / 1000.0
            s["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
            s["gc"] += tm.get("JVM GC Time", 0) / 1000.0
            s["deser"] += tm.get("Executor Deserialize Time", 0) / 1000.0
            srm = tm.get("Shuffle Read Metrics") or {}
            s["fetchwait"] += srm.get("Fetch Wait Time", 0) / 1000.0
    print(f"== {os.path.basename(os.path.normpath(path))}")
    base = None
    for sid in sorted(stages):
        s = stages[sid]
        if s.get("wall", 0) < 0.3 and s["run"] < 1:   # skip trivial stages
            continue
        if base is None:
            base = s.get("sub", 0)
        print(f"  st {sid:3d} t+{s.get('sub', 0) - base:7.1f} "
              f"{s.get('name', '?')[:24]:24s} tasks={s.get('tasks', 0):3d} "
              f"wall={s.get('wall', 0):6.1f}s run={s['run']:7.1f}s "
              f"cpu={s['cpu']:7.1f}s gc={s['gc']:4.1f}s "
              f"fetchwait={s['fetchwait']:5.1f}s deser={s['deser']:5.1f}s")


def _zero() -> dict:
    return {"name": "?", "tasks": 0, "wall": 0.0, "run": 0.0, "cpu": 0.0,
            "gc": 0.0, "fetchwait": 0.0, "deser": 0.0}


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    for path in sys.argv[1:]:
        if path.endswith(".inprogress"):
            continue
        analyze(path)


if __name__ == "__main__":
    main()
