"""Distributed prefix-scan (stages/scan.py): exact equivalence with a
sequential cumsum, across block layouts and bucket sizes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from tilecloud_chain_ray.stages.scan import pack_shards

pytestmark = pytest.mark.usefixtures("ray_session")


def sequential_shards(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    out = []
    for g, sub in df.groupby("g"):
        sub = sub.sort_values("o").reset_index(drop=True)
        excl = np.concatenate(([0], np.cumsum(sub["w"].to_numpy())[:-1]))
        sub["shard"] = excl // budget
        out.append(sub)
    return pd.concat(out).sort_values(["g", "o"]).reset_index(drop=True)


@pytest.mark.parametrize("bucket_size", [7, 64, 10_000])
@pytest.mark.parametrize("nblocks", [1, 16])
def test_pack_shards_matches_sequential(bucket_size, nblocks):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "o": rng.permutation(n),  # unordered input, ids not contiguous per group
            "g": rng.choice(["a", "b"], size=n),
            "w": rng.integers(1, 500, size=n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        nblocks
    )
    got = (
        pack_shards(ds, "g", "o", "w", budget=1000, bucket_size=bucket_size)
        .to_pandas()
        .sort_values(["g", "o"])
        .reset_index(drop=True)
    )
    want = sequential_shards(df, 1000)
    assert (got["shard"].to_numpy() == want["shard"].to_numpy()).all()
    # shards fill the budget contiguously: weight per (g, shard) <= budget
    # + one overhanging row's weight
    sums = got.groupby(["g", "shard"])["w"].sum()
    assert (sums.to_numpy() <= 1000 + 499).all()
