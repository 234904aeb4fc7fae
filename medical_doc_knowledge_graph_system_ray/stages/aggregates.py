"""Combiner-first grouped aggregation.

A bare groupby(key).aggregate(...) shuffles every row; this helper
computes per-batch partials (pandas groupby inside map_batches — one row
per key per batch) and shuffles only those, then runs the tiny global
aggregate. Sums and counts are associative; means are derived sum/count
after the final reduce (guide §"Aggregation at scale").
"""

from __future__ import annotations

import pandas as pd


def preagg_sum_count(ds, keys: list[str], sum_cols: list[str],
                     count_alias: str = "n"):
    """Returns a Dataset with columns keys + sum_cols (summed) + count_alias."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        out = g[sum_cols].sum() if sum_cols else g.size().to_frame("__drop")
        out[count_alias] = g.size()
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)
