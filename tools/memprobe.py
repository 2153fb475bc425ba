"""One-line host-window probe: single-thread ALU Mops + aggregate
memcpy GB/s (the two controls bench.py records). Run before/after any
timing pair to attribute a swing to host vs engine (BENCH/BASELINE.md
method)."""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
b = importlib.util.module_from_spec(spec)
sys.modules["bench"] = b
try:
    spec.loader.exec_module(b)
except SystemExit:
    pass

if __name__ == "__main__":
    ctl = b._cpu_control(0.3)
    ceil = b._host_ceiling(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 1.0)
    print(
        f"ctl={ctl} Mops alu={ceil['alu_mops']} Mops "
        f"copy={ceil['copy_gbps']} GB/s"
    )
