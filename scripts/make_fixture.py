#!/usr/bin/env python3
"""One-time fixture build (dev tool): re-create the reference's seeded panel
(test_time_series_study.py:12-49, numpy default_rng(42)) and store it as
parquet under src/test/resources/panel/ for golden-parity ScalaTests.
"""
import numpy as np
import pandas as pd

n_groups, n_dates, seed = 5, 60, 42
rng = np.random.default_rng(seed)
dates = pd.date_range("2024-01-01", periods=n_dates, freq="D")
names = [f"G{i+1}" for i in range(n_groups)]

base_levels = rng.normal(0.0, 1.0, size=n_groups)
trends = rng.normal(0.01, 0.01, size=n_groups)
seasonal_amp = rng.uniform(0.5, 1.5, size=n_groups)

n = n_dates * n_groups
f1, f2, f3 = np.zeros(n), np.zeros(n), np.zeros(n)
for gi in range(n_groups):
    rows = slice(gi, n, n_groups)
    t = np.arange(n_dates)
    f1_group = base_levels[gi] + trends[gi] * t + rng.normal(0, 0.3, size=n_dates)
    f2_group = seasonal_amp[gi] * np.sin(2 * np.pi * t / 12.0) + rng.normal(0, 0.2, size=n_dates)
    f3_group = np.zeros(n_dates)
    eps = rng.normal(0, 0.25, size=n_dates)
    phi = 0.6 + 0.2 * rng.random()
    for i in range(n_dates):
        f3_group[i] = (phi * f3_group[i - 1] + eps[i]) if i > 0 else eps[i]
    f1[rows], f2[rows], f3[rows] = f1_group, f2_group, f3_group

# long format: (date, name, feature_1..3); index product order interleaves
# groups per date, matching MultiIndex.from_product([dates, names])
rec = {
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    "date": np.repeat(dates.values, n_groups).astype("datetime64[us]"),
    "name": np.tile(np.array(names), n_dates),
    "feature_1": f1,
    "feature_2": f2,
    "feature_3": f3,
}
df = pd.DataFrame(rec)
out = "src/test/resources/panel/panel.parquet"
import os
os.makedirs(os.path.dirname(out), exist_ok=True)
df.to_parquet(out, index=False)
print(df.head(6))
print("rows:", len(df))
