"""Session-shape helpers shared by shuffle stages.

Every wide operator that hash-partitions (cogroup_join, LSH bucket
shuffles, the distributed graph iterations) needs a partition count.
A fixed default (8) caps parallelism on a big cluster and lets a single
partition hold 1/8 of the shuffled table; scaling with the session's
CPU width keeps per-task state bounded as the cluster grows — the same
rule `_match_concurrency` applies to actor pools (pipelines/kg.py:39).
"""

from __future__ import annotations


def default_num_partitions(multiplier: int = 2, floor: int = 8) -> int:
    """Shuffle partition count: ``multiplier × cluster CPUs`` (≥ floor).

    2× CPUs keeps every core busy through stragglers while each task
    holds only ~1/(2·CPUs) of the shuffled table. Reads the live session
    so the same code sizes itself on an 8-CPU laptop or a 256-node
    cluster; falls back to ``floor`` when Ray isn't up (pure-python unit
    tests).
    """
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus > 0:
                return max(floor, multiplier * cpus)
    except Exception:
        pass
    return floor


def tune_data_context() -> None:
    """Session-level Ray Data tuning for this engine's topologies.

    Disables per-operator resource reservation (Ray 2.49 default ratio
    0.5): with it on, a 3-operator pipeline (read → fused task-pool map
    → aggregate) caps the hot map operator at roughly half the CPUs —
    measured 32 s vs 14 s wall for the flagship at 4 CPUs. The engine's
    stages are task pools with per-worker state caches, so nothing
    relies on reservation to avoid starvation (fixed actor pools, which
    did, are opt-in only). Safe to call repeatedly; no-op if Ray Data
    is unavailable.
    """
    try:
        import ray.data

        ray.data.DataContext.get_current(
        ).op_resource_reservation_enabled = False
    except Exception:
        pass
