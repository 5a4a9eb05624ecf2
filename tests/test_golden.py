"""Golden snapshots (FIXTURES.md F4): frozen content hashes of flagship
query outputs at sf0.001. Catches SIMULTANEOUS drift of engine + oracle
(which the cross-engine gate cannot see) — any semantic change to a
calculator, the derivation, or the normalization contract must
consciously update these hashes."""

from __future__ import annotations

import hashlib

import pytest

from ts_raster_spark import queries as Q

SF = "/root/testdata/sf0.001"

GOLDEN = {
    # updated round 2: +benford_correlation +energy_ratio_chunk0_of10
    # columns in the full rollups (conscious semantic extension)
    "conv_features": (15, "96d504c6447c42c46d6e7abe1ecaaa1bf6f2a51cd25b3a171ed5f02533077e98"),
    "rollup_hour_full": (1888, "5ad56ede5ee3b87b0700ff6832ee84f45417db22b8b238a81886a17186dcd3c5"),
    "turns_derivation": (1000, "5199998853fc5bd8c6a34907e0f01159c7e55729002f20f50702d586ff1949cd"),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_snapshot(spark, name):
    df = getattr(Q, f"q_{name}")(spark, SF).toPandas()
    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()
    n_exp, h_exp = GOLDEN[name]
    assert len(df) == n_exp, f"{name}: row count {len(df)} != {n_exp}"
    assert h == h_exp, (
        f"{name}: output drifted from the golden snapshot. If the change "
        f"is intentional, update GOLDEN with {h!r}."
    )
