"""The KG pipeline's one all-to-all shuffle survives object-store
pressure (VERDICT r4 §next #8): a subprocess Ray instance with a
deliberately tiny object store runs ``aggregate_edges`` over a working
set several times the store size, the store spills to disk, and the
aggregate is still exactly correct — converting SURVEY §9's
"backpressure, not spilling, is the steady state; spilling is the
safety valve" from argument to measurement.

Runs in its own process (tests/spill_probe_script.py) so the capped
store never touches the session-scoped pytest cluster.
"""

import json
import os
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(__file__), "spill_probe_script.py")


def test_aggregate_edges_exact_under_spill():
    """3M pre-combine-resistant rows (1.5M distinct keys, ~210 MB
    shuffled) through a 120 MB store: the raylet must report spilling
    AND every key's weight must still be exactly right."""
    proc = subprocess.run(
        [sys.executable, _SCRIPT, "3000000", "1500000", "120"],
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["total_w"] == stats["expected_total"]
    assert stats["n_keys_out"] == stats["expected_keys"]
    assert stats["n_bad_weight"] == 0
    # the store was genuinely overflowed, not merely backpressured
    assert stats["spilled_mb"] > 100, stats
