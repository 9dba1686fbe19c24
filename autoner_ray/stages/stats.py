"""Distributed statistics over mergeable moment partials.

Reference parity note: the reference engine (shangjingbo1226/AutoNER)
has no regression operator; this is part of the LLM-data/analytics
extension surface (SURVEY.md §2 additions). The partial-moment shape
is the canonical Ray-Data aggregate pattern: vectorized per-batch
partials -> bounded-key combine -> tiny driver-side-free finish block.

Exactness contract: x and y are snapped to integers with the repo's
``floor(v*scale + 0.5)`` cents trick (same expression the DuckDB
oracles use), so the five moments (n, Σx, Σy, Σxx, Σyy, Σxy) are
EXACT int64 partials that merge associatively — no float summation
order anywhere in the distributed part. The final slope / intercept /
corr derivation converts the exact integers to float64 in the same
operation order as the SQL twin, so both sides compute bit-identical
doubles before the 6-dp round.

Scale: the combine output is |groups| rows (bounded, e.g. 3 return
flags); moments stay within int64 up to ~1e18 — with y scaled to
hundredths (|y|<=1e4 after scaling) that is ~1e10 rows per group.
For 100-TB corpora with larger y, raise ``y_scale`` down or shard the
group key; the partial shape is unchanged.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc

from autoner_ray.stages.combine import bounded_key_sum

_MOMENTS = ["n", "sx", "sy", "sxx", "syy", "sxy"]


def grouped_linear_fit(ds, key: str, x_col: str, y_col: str,
                       x_scale: int = 1, y_scale: int = 100):
    """Per-group OLS fit of ``y ~ x`` plus Pearson correlation.

    Returns a Dataset with columns ``(key, n, slope, intercept, corr)``
    where slope/intercept/corr are in the SCALED integer units
    (``x*x_scale``, ``y*y_scale``) rounded to 6 dp — the unit the SQL
    twin computes in, keeping the comparison exact.
    """
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {key: pa.array([], pa.string())}
                | {c: pa.array([], pa.int64()) for c in _MOMENTS}
            )
        x = np.floor(
            t[x_col].to_numpy(zero_copy_only=False) * x_scale + 0.5
        ).astype(np.int64)
        y = np.floor(
            t[y_col].to_numpy(zero_copy_only=False) * y_scale + 0.5
        ).astype(np.int64)
        part = pa.table(
            {
                key: t[key],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        agg = part.group_by(key).aggregate([(c, "sum") for c in _MOMENTS])
        return agg.rename_columns([key] + _MOMENTS)

    moments = bounded_key_sum(
        ds.map_batches(partial, batch_format="pyarrow"), [key], _MOMENTS
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "slope": pa.array([], pa.float64()),
                    "intercept": pa.array([], pa.float64()),
                    "corr": pa.array([], pa.float64()),
                }
            )
        # exact Python-int moment algebra, then float64 in the SAME
        # order as the SQL twin (cast num/den to double, divide, round)
        rows = {c: t[c].to_pylist() for c in [key] + _MOMENTS}
        slope, intercept, corr = [], [], []
        for i in range(len(t)):
            n = rows["n"][i]
            sx, sy = rows["sx"][i], rows["sy"][i]
            sxx, syy, sxy = rows["sxx"][i], rows["syy"][i], rows["sxy"][i]
            num = n * sxy - sx * sy
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx == 0:
                slope.append(None)
                intercept.append(None)
                corr.append(None)
                continue
            sl = float(num) / float(dx)
            slope.append(round(sl, 6))
            intercept.append(round((float(sy) - sl * float(sx)) / float(n), 6))
            corr.append(
                None
                if dy == 0
                else round(float(num) / math.sqrt(float(dx) * float(dy)), 6)
            )
        return pa.table(
            {
                key: rows[key],
                "n": pa.array(rows["n"], pa.int64()),
                "slope": pa.array(slope, pa.float64()),
                "intercept": pa.array(intercept, pa.float64()),
                "corr": pa.array(corr, pa.float64()),
            }
        )

    return moments.map_batches(finish, batch_format="pyarrow")
