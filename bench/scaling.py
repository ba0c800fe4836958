"""Scaling-efficiency measurement (BASELINE.json:5: ">=80% linear
scaling ... measured at 1 chip, 1 host, and N hosts").

    python bench/scaling.py [MB]

Only one real chip exists in this environment, so the sharded pipeline
is measured on 1/2/4/8-device CPU meshes (one subprocess per device
count — JAX fixes the device count at backend init). CPU devices share
the machine's cores, so compute-bound stages cannot speed up — the
honest reading of this table is ORCHESTRATION overhead: efficiency =
t(1 dev) / t(N dev) with shared cores would be ~1/N for perfect
no-overhead sharding of a core-bound workload; values well above that
floor mean the mesh/collective plumbing is not the bottleneck. The
single-chip TPU rate comes from bench.py (device-resident engine).

Writes one JSON line per mesh size and a markdown table appended to
RESULTS.md when --update-results is passed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(sys.argv[1]))
sys.path.insert(0, "__REPO__")
import bench as bench_mod
from mhc_tpu.parallel import mesh as meshmod, pipeline

n = int(sys.argv[2]) << 20
data = bench_mod.make_corpus(n)
m = meshmod.make_mesh(int(sys.argv[1]))
blob = pipeline.compress_sharded(data, m)          # warm-up compile
assert pipeline.decompress_sharded(blob, m) == data
best_e = best_d = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    blob = pipeline.compress_sharded(data, m)
    best_e = min(best_e, time.perf_counter() - t0)
    t0 = time.perf_counter()
    out = pipeline.decompress_sharded(blob, m)
    best_d = min(best_d, time.perf_counter() - t0)
assert out == data
print(json.dumps({"n_devices": int(sys.argv[1]), "encode_s": best_e,
                  "decode_s": best_d}))
"""


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 32
    rows = []
    for nd in (1, 2, 4, 8):
        r = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("__REPO__", REPO),
             str(nd), str(n_mb)],
            capture_output=True, text=True, timeout=1200)
        if r.returncode != 0:
            print(f"n_devices={nd} FAILED: {r.stderr[-300:]}",
                  file=sys.stderr)
            continue
        row = json.loads(r.stdout.strip().splitlines()[-1])
        row["agg_s"] = row["encode_s"] + row["decode_s"]
        rows.append(row)
        print(json.dumps(row), flush=True)
    if not rows:
        return 1
    base = rows[0]["agg_s"]
    from mhc_tpu.utils.metrics import scaling_report
    reports = [scaling_report((n_mb << 20) // r["n_devices"],
                              r["n_devices"], base, r["agg_s"])
               for r in rows]
    print(json.dumps({"mb": n_mb, "scaling": reports}))
    if "--update-results" in sys.argv:
        lines = [
            "",
            f"## Sharded-pipeline scaling (CPU mesh, {n_mb} MB markov, "
            "encode+decode wall)",
            "",
            "CPU devices share physical cores, so this measures "
            "mesh/collective ORCHESTRATION overhead, not compute "
            "scaling (one real chip exists; see BENCH_r*.json for the "
            "single-chip TPU rate).",
            "",
            "| devices | encode s | decode s | agg s | t1/tN |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['n_devices']} | {r['encode_s']:.2f} | "
                f"{r['decode_s']:.2f} | {r['agg_s']:.2f} | "
                f"{base / r['agg_s']:.2f} |")
        with open(os.path.join(REPO, "RESULTS.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
        print("appended to RESULTS.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
