"""SemDeDup (stages/semdedup.py): distributed verdicts vs a
single-process reference over the same centroids, planted semantic
duplicate groups, the paper's low-centroid-similarity survivor rule,
and the no-duplicates identity."""

import numpy as np
import pyarrow as pa
import ray

from tilecloud_chain_ray.stages.knn import spherical_kmeans
from tilecloud_chain_ray.stages.semdedup import (
    _cluster_verdicts,
    semdedup,
    semdedup_verdicts,
)


def _mk_vectors(seed=11, n_base=60, dim=16, groups=8, copies=3, noise=1e-3):
    """n_base independent vectors plus `groups` planted duplicate
    groups of `copies` near-identical members (cos > 0.999)."""
    rng = np.random.default_rng(seed)
    vecs, gids = [], []
    for i in range(n_base):
        vecs.append(rng.standard_normal(dim))
        gids.append(-1)
    for g in range(groups):
        base = rng.standard_normal(dim)
        for _ in range(copies):
            vecs.append(base + noise * rng.standard_normal(dim))
            gids.append(g)
    v = np.stack(vecs)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    keys = np.arange(len(v), dtype=np.int64)
    return keys, v, np.array(gids)


def _ds_of(keys, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(keys, pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4)


def _reference(keys, vecs, threshold, n_clusters, train, seed=5, iters=10):
    """Single-process SemDeDup over the same sampled centroids."""
    cent = spherical_kmeans(train, n_lists=n_clusters, iters=iters, seed=seed)
    scores = vecs @ cent.T
    cl = np.argmax(scores, axis=1)
    cs = scores[np.arange(len(cl)), cl]
    keep = np.ones(len(keys), dtype=bool)
    for c in np.unique(cl):
        m = np.flatnonzero(cl == c)
        keep[m] = _cluster_verdicts(keys[m], vecs[m], cs[m], threshold)
    return keep, cl, cs


def test_verdicts_match_reference():
    keys, vecs, _ = _mk_vectors()
    ds = _ds_of(keys, vecs)
    got = (
        semdedup_verdicts(ds, threshold=0.95, n_clusters=6, train_sample=4096)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # the stage trains on ds.limit(train_sample) = the full fixture here
    keep, cl, cs = _reference(keys, vecs, 0.95, 6, vecs)
    assert got["vec_id"].tolist() == keys.tolist()
    assert got["cluster"].tolist() == cl.tolist()
    assert np.allclose(got["centroid_sim"].to_numpy(), cs)
    assert got["keep"].tolist() == keep.tolist()


def test_planted_groups_keep_one_low_sim_survivor():
    keys, vecs, gids = _mk_vectors()
    ds = _ds_of(keys, vecs)
    df = semdedup_verdicts(ds, threshold=0.95, n_clusters=6).to_pandas()
    kept = df.set_index("vec_id")["keep"]
    sim = df.set_index("vec_id")["centroid_sim"]
    for g in np.unique(gids[gids >= 0]):
        members = keys[gids == g]
        survivors = [k for k in members if kept[k]]
        assert len(survivors) == 1, (g, survivors)
        # the paper's rule: the kept member has the group-minimum
        # centroid similarity
        assert sim[survivors[0]] == min(sim[k] for k in members)
    # independent vectors (random 16-dim: cosine ~0) all stay
    assert kept[keys[gids == -1]].all()


def test_semdedup_filters_corpus():
    keys, vecs, gids = _mk_vectors()
    ds = _ds_of(keys, vecs)
    out = semdedup(ds, threshold=0.95, n_clusters=6).to_pandas()
    df = semdedup_verdicts(ds, threshold=0.95, n_clusters=6).to_pandas()
    assert sorted(out["vec_id"]) == sorted(df.loc[df["keep"], "vec_id"])
    assert set(out.columns) == {"vec_id", "embedding"}
    n_groups = len(np.unique(gids[gids >= 0]))
    copies = (gids >= 0).sum() // n_groups
    assert len(out) == len(keys) - n_groups * (copies - 1)


def test_no_duplicates_identity():
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((50, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    keys = np.arange(50, dtype=np.int64)
    df = semdedup_verdicts(_ds_of(keys, vecs), threshold=0.99, n_clusters=4).to_pandas()
    assert df["keep"].all()
    assert len(df) == 50
