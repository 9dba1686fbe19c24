"""grouped_linear_fit: moment-partial OLS vs numpy lstsq/corrcoef,
invariant to block splits."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import ray

from autoner_ray.stages.stats import grouped_linear_fit


def test_grouped_fit_matches_numpy_across_splits():
    rng = random.Random(13)
    keys, xs, ys = [], [], []
    for _ in range(3000):
        k = rng.choice(["A", "B", "C"])
        x = rng.randrange(1, 51)
        # y in exact hundredths, linearly related + noise
        y = (x * 3 + rng.randrange(-40, 41)) / 100.0
        keys.append(k)
        xs.append(float(x))
        ys.append(y)
    t = pa.table({"g": keys, "x": xs, "y": ys})

    for parts in (1, 7):
        got = {
            r["g"]: r
            for r in grouped_linear_fit(
                ray.data.from_arrow(t).repartition(parts),
                key="g", x_col="x", y_col="y",
            ).take_all()
        }
        assert set(got) == {"A", "B", "C"}
        for g in got:
            sel = [i for i in range(len(keys)) if keys[i] == g]
            xv = np.array([xs[i] for i in sel])
            yv = np.array([round(ys[i] * 100) for i in sel], dtype=float)
            slope, intercept = np.polyfit(xv, yv, 1)
            corr = np.corrcoef(xv, yv)[0, 1]
            assert got[g]["n"] == len(sel)
            assert abs(got[g]["slope"] - slope) < 1e-4
            assert abs(got[g]["intercept"] - intercept) < 1e-4
            assert abs(got[g]["corr"] - corr) < 1e-6
