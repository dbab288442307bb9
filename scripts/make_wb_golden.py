#!/usr/bin/env python3
"""One-time weighted-bins golden build (dev tool): execute the REFERENCE
implementation as a black-box oracle on its own fixtures (demo 5-row,
comprehensive seed-42 100-row, generator seed-42 1000-row) and store inputs
(parquet) + outputs (csv) under src/test/resources/wb/ for ScalaTest parity.
The reference module needs tqdm, which isn't installed — shim it.
"""
import sys, types, os
import numpy as np
import pandas as pd

# tqdm shim (display-only dependency of the reference module)
tqdm_mod = types.ModuleType("tqdm")
tqdm_mod.tqdm = lambda it, **kw: it
sys.modules["tqdm"] = tqdm_mod

sys.path.insert(0, "/root/reference/weighted_bins")
from weighted_bin_calculator import calculate_weighted_bins  # noqa: E402

out = "src/test/resources/wb"
os.makedirs(out, exist_ok=True)


def save(name, df_in, result, ts_col="timestamp"):
    d = df_in.copy()
    d[ts_col] = d[ts_col].astype("datetime64[us]")
    d.to_parquet(f"{out}/{name}_input.parquet", index=False)
    result.to_csv(f"{out}/{name}_golden.csv", index=False)
    print(name, "in:", len(d), "out:", len(result))


# 1. demo (README worked example): bins 22.5 / 32.5 / 50.0 on row 0
demo = pd.DataFrame({
    "Asset": ["A"] * 5,
    "Type": ["x"] * 5,
    "Time": pd.date_range("2024-01-01", periods=5, freq="h"),
    "Volume": [50, 75, 100, 25, 150],
    "Price": [10, 20, 30, 40, 50],
})
r = calculate_weighted_bins(demo, id1_col="Asset", id2_col="Type",
                            timestamp_col="Time", q1_col="Volume",
                            q2_col="Price", bin_size=100, max_bins=3)
save("demo", demo.rename(columns={"Asset": "ID1", "Type": "ID2", "Time": "timestamp",
                                  "Volume": "quantity1", "Price": "quantity2"}),
     r.rename(columns={"Asset": "ID1", "Type": "ID2", "Time": "timestamp",
                       "Volume": "quantity1", "Price": "quantity2"}))

# 2. comprehensive test (seed-42 legacy RandomState, 100 rows, 3x2 keys)
np.random.seed(42)
n_rows = 100
df2 = pd.DataFrame({
    "ID1": np.random.choice(["A", "B", "C"], n_rows),
    "ID2": np.random.choice(["X", "Y"], n_rows),
    "timestamp": pd.date_range("2024-01-01", periods=n_rows, freq="h"),
    "quantity1": np.random.randint(10, 201, n_rows),
    "quantity2": np.random.randint(5, 51, n_rows),
})
r2 = calculate_weighted_bins(df2, bin_size=50, max_bins=8)
save("comprehensive", df2, r2)

# 3. generator fixture (seed-42, 1000 rows, 5x3 keys, defaults 100/10)
np.random.seed(42)
n = 1000
df3 = pd.DataFrame({
    "ID1": np.random.choice([f"ID1_{i}" for i in range(5)], n),
    "ID2": np.random.choice([f"ID2_{i}" for i in range(3)], n),
    "timestamp": pd.date_range("2024-01-01", periods=n, freq="h"),
    "quantity1": np.random.randint(10, 201, n),
    "quantity2": np.random.randint(5, 51, n),
})
df3 = df3.sort_values(["ID1", "ID2", "timestamp"]).reset_index(drop=True)
r3 = calculate_weighted_bins(df3, bin_size=100, max_bins=10)
save("generated", df3, r3)
