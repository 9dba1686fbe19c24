"""Subprocess body for the spill-resilience test (VERDICT r4 §next #8):
runs the one all-to-all shuffle the KG pipeline depends on
(``aggregate_edges``) inside a Ray instance whose object store is
deliberately too small for the working set, so the store MUST spill —
then proves the result is still exactly correct. Run by
tests/test_spill_resilience.py in its own process (its own Ray
session, never the pytest one); prints one JSON line on stdout.

Analytic fixture: N rows over K distinct (subj, pred, obj) keys, w=1
each -> every key's weight is exactly N // K and the total is N.
"""

import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    store_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 120

    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        object_store_memory=store_mb * 1024 * 1024,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from autoner_ray.stages.triples import aggregate_edges

    per_key = n_rows // n_keys
    n_rows = per_key * n_keys  # exact multiples keep the oracle trivial

    def gen(batch):
        # row i -> key i % n_keys; padded string entities make rows fat
        # enough that the shuffle working set overflows the tiny store
        i = batch["id"].to_numpy()
        k = i % n_keys
        return pa.table(
            {
                "subj": pa.array([f"entity_{v:012d}_padpadpad" for v in k]),
                "pred": pa.array(["cooccurs_with"] * len(i)),
                "obj": pa.array([f"object_{v:012d}_padpadpadpad" for v in k]),
                "w": pa.array(np.ones(len(i), np.int64)),
            }
        )

    pairs = rd.range(n_rows).map_batches(gen, batch_format="pyarrow")
    edges = aggregate_edges(pairs).materialize()

    total_w = edges.sum("weight")
    n_out = edges.count()
    bad = edges.filter(expr=f"weight != {per_key}").count()

    # no grpc in this env (so no memory_summary RPC), and spilled files
    # are deleted as refs free — the durable evidence is the raylet
    # log's "Spilled N MiB" progress lines
    session_dir = ray._private.worker.global_worker.node.get_session_dir_path()
    spilled_mb = 0.0
    raylet_log = os.path.join(session_dir, "logs", "raylet.out")
    if os.path.exists(raylet_log):
        with open(raylet_log, errors="replace") as fh:
            for line in fh:
                if "Spilled " in line:
                    try:
                        v = float(
                            line.split("Spilled ", 1)[1].split()[0]
                        )
                        spilled_mb = max(spilled_mb, v)
                    except (IndexError, ValueError):
                        pass
    print(json.dumps({
        "total_w": int(total_w),
        "n_keys_out": int(n_out),
        "n_bad_weight": int(bad),
        "expected_total": n_rows,
        "expected_keys": n_keys,
        "spilled_mb": spilled_mb,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
