"""Background scaling-pair watcher (rounds 4-5 methodology,
BENCH/BASELINE.md): probe the host's hardware health every ~90s; when
a window is HEALTHY by the criteria below, fire ONE alternating
N-vs-4N ER-pipeline pair via `bench.py --er-once` and append the
child JSON lines to BENCH/watcher_r5.jsonl. Every probe (healthy or
not) is appended too, extending the determination log.

Healthy window (all must hold — derived from the round-4 starvation
signature, where 4-proc aggregate memcpy sat at 0.1-0.2 GB/s while
32-proc measured 29-125 GB/s in the same minutes):
  * single-thread ctl >= CTL_MIN Mops (host not globally throttled)
  * 4-proc aggregate memcpy >= LO_GBPS_MIN (lo side not starved)
  * 16-proc aggregate memcpy >= 4-proc aggregate (no inversion: more
    processes must not receive LESS total bandwidth)

Stops after MAX_PAIRS pairs or MAX_HOURS hours.

Usage: nohup python tools/scaling_watcher.py &   (repo root)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: probes + er_once child mode)

OUT = "BENCH/watcher_r5.jsonl"
CTL_MIN = float(os.environ.get("WATCHER_CTL_MIN", "12.5"))
LO_GBPS_MIN = float(os.environ.get("WATCHER_LO_GBPS_MIN", "8.0"))
MAX_PAIRS = int(os.environ.get("WATCHER_MAX_PAIRS", "4"))
MAX_HOURS = float(os.environ.get("WATCHER_MAX_HOURS", "5"))
PROBE_EVERY = float(os.environ.get("WATCHER_PROBE_EVERY", "90"))
ENTITIES = int(os.environ.get("SPARK_GRAFT_ER_ENTITIES_SCALING", "240000"))
LO, HI = 4, 16


def _append(rec: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def probe() -> dict:
    ctl = bench._cpu_control(0.5)
    lo_ceil = bench._host_ceiling(LO, seconds=1.5)
    hi_ceil = bench._host_ceiling(HI, seconds=1.5)
    healthy = (
        ctl >= CTL_MIN
        and lo_ceil["copy_gbps"] >= LO_GBPS_MIN
        and hi_ceil["copy_gbps"] >= lo_ceil["copy_gbps"]
    )
    return {
        "t": time.strftime("%Y-%m-%d %H:%M:%S"),
        "kind": "probe",
        "ctl_mops": round(ctl, 1),
        "lo_alu": lo_ceil["alu_mops"],
        "lo_gbps": lo_ceil["copy_gbps"],
        "hi_alu": hi_ceil["alu_mops"],
        "hi_gbps": hi_ceil["copy_gbps"],
        "healthy": healthy,
    }


def run_one(cores: int) -> dict | None:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    out = subprocess.run(
        [sys.executable, "bench.py", "--er-once", str(cores), str(ENTITIES)],
        capture_output=True, text=True, env=env,
    )
    lines = [line for line in out.stdout.splitlines() if line.startswith("{")]
    if out.returncode != 0 or not lines:
        _append({"kind": "error", "cores": cores,
                 "stderr_tail": out.stderr[-500:]})
        return None
    rec = json.loads(lines[-1])
    rec["kind"] = "run"
    rec["t"] = time.strftime("%Y-%m-%d %H:%M:%S")
    _append(rec)
    return rec


def main() -> None:
    deadline = time.monotonic() + MAX_HOURS * 3600
    pairs_done = 0
    while pairs_done < MAX_PAIRS and time.monotonic() < deadline:
        p = probe()
        _append(p)
        if not p["healthy"]:
            time.sleep(PROBE_EVERY)
            continue
        order = (LO, HI) if pairs_done % 2 == 0 else (HI, LO)
        _append({"kind": "pair_start", "order": order,
                 "t": time.strftime("%Y-%m-%d %H:%M:%S")})
        ok = all(run_one(c) is not None for c in order)
        # post-pair probe: record whether the window HELD through the pair
        _append({**probe(), "kind": "post_pair_probe"})
        if ok:
            pairs_done += 1
    _append({"kind": "done", "pairs": pairs_done,
             "t": time.strftime("%Y-%m-%d %H:%M:%S")})


if __name__ == "__main__":
    main()
