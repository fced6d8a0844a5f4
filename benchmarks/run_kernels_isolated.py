"""Run each kernel benchmark in its own subprocess (axon-worker crash
isolation, as bench.py does for the end-to-end solves) and collect the
JSON lines into one JSONL artifact.

    python benchmarks/run_kernels_isolated.py --out benchmarks/KERNELS_tpu.jsonl

A benchmark that times out or crashes is retried once (CLAUDE.md:
transient TPU-worker faults usually do not reproduce) and then recorded
as an error line — the remaining benchmarks still run.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BENCHES = ["bipartite_masked_gemv", "bip_gemv_loop", "bip_sweep_loop",
           "ell_spmv_xla", "ell_spmv_pallas",
           "galerkin_gemm", "newton_solve_amg"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "KERNELS_tpu.jsonl"))
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--density", type=float, default=0.05)
    ap.add_argument("--timeout", type=float, default=1500.0,
                    help="per-benchmark subprocess timeout (remote Mosaic "
                         "compiles take minutes)")
    ap.add_argument("--retry-wait", type=float, default=60.0)
    args = ap.parse_args()

    for bench in BENCHES:
        for attempt in (1, 2):
            cmd = [sys.executable, os.path.join(HERE, "kernels.py"),
                   "--size", str(args.size),
                   "--density", str(args.density),
                   "--only", bench, "--out", args.out]
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=args.timeout)
            except subprocess.TimeoutExpired:
                print(f"[{bench}] attempt {attempt}: timeout",
                      file=sys.stderr, flush=True)
                if attempt == 1:
                    time.sleep(args.retry_wait)
                    continue
                _record_error(args.out, bench, "timeout")
                break
            if proc.returncode == 0:
                print(proc.stdout, end="", flush=True)
                break
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(f"[{bench}] attempt {attempt}: rc={proc.returncode} "
                  + " | ".join(tail), file=sys.stderr, flush=True)
            if attempt == 1:
                time.sleep(args.retry_wait)
            else:
                _record_error(args.out, bench,
                              f"rc={proc.returncode} " + " | ".join(tail))


def _record_error(out, bench, msg):
    with open(out, "a") as f:
        f.write(json.dumps({"bench": bench, "error": msg[:300]}) + "\n")


if __name__ == "__main__":
    main()
