#!/usr/bin/env python3
"""Probe-gated opportunistic bench runner.

On this host the memory envelope flaps between seconds-apart probes
(round-6 session 3: 0.5-13 GB/s with no stable window for hours) —
single ad-hoc bench runs land on arbitrary windows and mislead.
This watcher only fires the frozen bench after a SUSTAINED window:

Probes single-proc copy bandwidth every 60 s; after 3 consecutive
readings >= 3.0 GB/s, runs the frozen bench at x10 then sf0.1 and
appends results to /tmp/window_watch_results.jsonl. Stops after two
successful pairs or when /tmp/window_watch.stop exists.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import copy_probe_gbps  # noqa: E402

RESULTS = "/tmp/window_watch_results.jsonl"
STOP = "/tmp/window_watch.stop"
BAR = 3.0


def run_bench(sf_dir, tag):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo",
                       env=env, capture_output=True, text=True,
                       timeout=1800)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    rec = {"tag": tag, "wall": round(time.time() - t0, 1),
           "rc": p.returncode,
           "parsed": json.loads(line[-1]) if line else None}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    streak, pairs_done = 0, 0
    while pairs_done < 2 and not os.path.exists(STOP):
        g = copy_probe_gbps()
        print(f"{time.strftime('%H:%M:%S')} probe {g} streak {streak}",
              flush=True)
        streak = streak + 1 if g >= BAR else 0
        if streak >= 3:
            print("healthy window — running bench pair", flush=True)
            run_bench("/tmp/sfx10", "x10")
            if os.path.exists(STOP):
                break
            run_bench("/root/testdata/sf0.1", "sf0.1")
            pairs_done += 1
            streak = 0
        else:
            time.sleep(60)
    print("watcher exiting", flush=True)


if __name__ == "__main__":
    main()
