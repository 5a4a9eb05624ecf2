"""Generate the golden parquet for the kernel_features_cwt driver query.

The CWT kernel has no SQL analog, so its driver oracle is a checked-in
golden table computed HERE — independently of Spark — by replaying the
same derivation chain single-node: DuckDB builds the long panel
(ts_raster_spark/sql/oracle_prefix.LONG_CTE, the same CTE every other
oracle uses), then pandas/NumPy computes the feature vector per
conversation with the reference-parity calculators
(functions/oracle.py) and functions/cwt.number_cwt_peaks. The Spark
side reaches the same numbers through groupBy().applyInPandas — so a
hash match proves the distributed plumbing (grouping, in-group
ordering, Arrow batching, schema) delivers each series intact. The CWT
algorithm itself is separately pinned to analytic signals in
tests/test_kernels_cwt.py.

Usage: python tools/make_golden_cwt.py [sf_dir] [out_parquet]
Defaults: /root/testdata/sf0.01 -> tests/golden/kernel_cwt_sf001.parquet
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ts_raster_spark.functions import oracle as ORC  # noqa: E402
from ts_raster_spark.functions.cwt import number_cwt_peaks  # noqa: E402
from ts_raster_spark.sql.oracle_prefix import LONG_CTE  # noqa: E402

KEEP_DOUBLES = [
    "mean", "abs_energy",
    "number_cwt_peaks_n6", "number_cwt_peaks_n12",
    "longest_strike_above_mean", "longest_strike_below_mean",
]


def r4(x: float) -> float:
    """The cross-engine rounding contract (functions/norm.py): +1e-9
    nudge, 4 decimals (10 significant digits above 1e6), signed zero
    normalized by + 0.0."""
    if x is None or (isinstance(x, float) and np.isnan(x)):
        return np.nan
    if abs(x) >= 1e6:
        p = 10.0 ** (np.floor(np.log10(abs(x))) - 9)
        return float(np.round(x / p + 1e-9) * p) + 0.0
    return float(np.round(x + 1e-9, 4)) + 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden", "kernel_cwt_sf001.parquet")
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    panel = con.execute(
        LONG_CTE
        + " SELECT conv_id, turn_idx, ts, value FROM long_panel"
        " WHERE kind = 'text_len' ORDER BY conv_id, turn_idx, ts"
    ).fetchdf()

    rows = []
    for conv_id, g in panel.groupby("conv_id", sort=True):
        x = g["value"].to_numpy(dtype=np.float64)
        rows.append(
            {
                "conv_id": conv_id,
                "kind": "text_len",
                "turn_count": int(len(x)),
                "mean": r4(ORC.mean(x)),
                "abs_energy": r4(ORC.abs_energy(x)),
                "number_cwt_peaks_n6": r4(float(number_cwt_peaks(x, 6))),
                "number_cwt_peaks_n12": r4(float(number_cwt_peaks(x, 12))),
                "longest_strike_above_mean": r4(float(ORC.longest_strike_above_mean(x))),
                "longest_strike_below_mean": r4(float(ORC.longest_strike_below_mean(x))),
            }
        )
    df = pd.DataFrame(rows)
    df["turn_count"] = df["turn_count"].astype("int64")
    for c in KEEP_DOUBLES:
        df[c] = df[c].astype("float64")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} rows -> {out}")


if __name__ == "__main__":
    main()
