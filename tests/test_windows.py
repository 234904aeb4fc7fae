"""Distributed sliding-window roll-up (VERDICT r4 #5): property check
against an independent pandas reference on seeded-random event streams
with hour gaps, plus shape/type assertions the oracle compare can't see."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _reference_sliding(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Driver-side RANGE-semantics reference (the pre-r5 implementation's
    logic, kept here as the ground truth)."""
    hourly = (df.assign(hour=df["ts"].dt.floor("h"))
              .groupby("hour")
              .agg(total=("value", "sum"), n=("value", "size"))
              .reset_index().sort_values("hour"))
    hourly["total"] = hourly["total"].round(4)
    totals = dict(zip(hourly["hour"], hourly["total"]))
    counts = dict(zip(hourly["hour"], hourly["n"]))
    out_t, out_n = [], []
    for h in hourly["hour"]:
        win = [h - pd.Timedelta(hours=k) for k in range(w)]
        out_t.append(round(sum(totals.get(x, 0.0) for x in win), 4))
        out_n.append(int(sum(counts.get(x, 0) for x in win)))
    return pd.DataFrame({"hour": hourly["hour"].values,
                         f"total_{w}h": out_t,
                         f"n_{w}h": out_n}).reset_index(drop=True)


@pytest.mark.parametrize("seed,w", [(3, 3), (17, 3), (29, 5)])
def test_sliding_hourly_totals_matches_pandas_reference(ray_session, seed, w):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    n = 400
    # sparse hours (gaps!) over ~10 days
    ts = (pd.Timestamp("2024-03-01")
          + pd.to_timedelta(rng.randint(0, 240, n), unit="h")
          + pd.to_timedelta(rng.randint(0, 3600, n), unit="s"))
    df = pd.DataFrame({"ts": ts, "value": rng.uniform(-5, 20, n).round(2)})

    from medical_doc_knowledge_graph_system_ray.stages.windows import (
        sliding_hourly_totals,
    )

    got = sliding_hourly_totals(rd.from_pandas(df), window_hours=w).to_pandas()
    want = _reference_sliding(df, w)
    assert list(got.columns) == ["hour", f"total_{w}h", f"n_{w}h"]
    got = got.sort_values("hour").reset_index(drop=True)
    assert (got["hour"].values == want["hour"].values).all()
    assert (got[f"n_{w}h"].values == want[f"n_{w}h"].values).all()
    assert np.allclose(got[f"total_{w}h"], want[f"total_{w}h"], atol=1e-9)
