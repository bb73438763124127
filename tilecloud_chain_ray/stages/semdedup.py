"""SemDeDup: semantic deduplication of an embedding column (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

The published recipe: k-means-cluster the (normalized) embeddings,
compute pairwise cosine similarity WITHIN each cluster only, connect
pairs above a threshold into duplicate groups, and keep one example
per group — the paper keeps the member with the LOWEST cosine
similarity to its cluster centroid (the least prototypical example
carries the most extra information).

Ray-Data shape: the quadratic work is confined to clusters, so the
shuffle key is the cluster id — a BOUNDED key space (``n_clusters``),
the cheap kind of groupby (cf. BASELINE.md's ledger; no salt needed).
Centroids train on a bounded driver-side sample and broadcast via
``ray.put`` exactly like the IVF index (stages/knn.py:199).  The
in-cluster pair extraction is BLOCKED (row blocks against the
cluster, memory O(block x cluster), only above-threshold edges
materialize), so a skewed cluster costs CPU, never an OOM.  The
partitioning assumption is the paper's own: ``n_clusters`` scales
with the corpus (the default 16 is a test-scale value) so the O(c^2)
compute per cluster stays bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from tilecloud_chain_ray.stages.knn import spherical_kmeans
from tilecloud_chain_ray.util import vecs_from_arrow


def _cluster_verdicts(
    keys: np.ndarray, vecs: np.ndarray, centroid_sim: np.ndarray, threshold: float
) -> np.ndarray:
    """Boolean keep-mask for one cluster: union duplicate pairs
    (cosine > threshold) into groups, keep the member with minimum
    centroid similarity per group (ties: smallest key)."""
    n = len(keys)
    # blocked pair extraction: a full n x n sims matrix is 8n^2 bytes
    # (a 50k-row skewed cluster would be 20 GB) — compute row blocks
    # against the whole cluster instead, so memory is O(block * n)
    # while only above-threshold edges ever materialize
    block = 2048
    ii_parts, jj_parts = [], []
    for s in range(0, n, block):
        e = min(s + block, n)
        sims = vecs[s:e] @ vecs.T  # (e-s, n)
        bi, bj = np.nonzero(sims > threshold)
        up = s + bi < bj  # strict upper triangle only
        ii_parts.append((s + bi)[up])
        jj_parts.append(bj[up])
    ii = np.concatenate(ii_parts) if ii_parts else np.empty(0, np.int64)
    jj = np.concatenate(jj_parts) if jj_parts else np.empty(0, np.int64)
    keep = np.ones(n, dtype=bool)
    if len(ii) == 0:
        return keep
    parent = np.arange(n)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(ii, jj):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    roots = np.fromiter((find(i) for i in range(n)), np.int64, n)
    # keeper per group: min (centroid_sim, key) — the paper's
    # low-centroid-similarity survivor, deterministic on ties
    order = np.lexsort((keys, centroid_sim, roots))
    grp_sorted = roots[order]
    first_of_group = np.empty(n, dtype=bool)
    first_of_group[0] = True
    first_of_group[1:] = grp_sorted[1:] != grp_sorted[:-1]
    keep[:] = False
    keep[order[first_of_group]] = True
    # singletons are their own group and stay kept by the same rule
    return keep


def semdedup_verdicts(
    ds: ray.data.Dataset,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 16,
    train_sample: int = 4096,
    iters: int = 10,
    seed: int = 5,
) -> ray.data.Dataset:
    """Per-row SemDeDup verdicts: ``(key, cluster, centroid_sim,
    keep)``.  Filter ``keep`` for the deduplicated corpus; the dropped
    rows are the semantic duplicates."""
    from tilecloud_chain_ray.stages.curation import hash_sample_rows

    # layout-independent bottom-n-by-hash sample (not limit(): the
    # first input files would train biased centroids on sorted corpora)
    train_tbl = hash_sample_rows(ds, train_sample, key_col, cols=[vec_col])
    train = vecs_from_arrow(train_tbl[vec_col], np.float64)
    cent = spherical_kmeans(train, n_lists=n_clusters, iters=iters, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = vecs_from_arrow(batch[vec_col], np.float64)
        # out-of-place: vecs_from_arrow returns a read-only zero-copy view
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True).clip(1e-12)
        scores = vecs @ c.T
        cl = np.argmax(scores, axis=1)
        return pa.Table.from_pydict(
            {
                key_col: batch[key_col],
                "cluster": pa.array(cl.astype(np.int64), pa.int64()),
                "centroid_sim": pa.array(scores[np.arange(len(cl)), cl], pa.float64()),
                # zero-copy emission (one buffer + width), not per-row lists
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.ascontiguousarray(vecs).ravel(), pa.float64()),
                    vecs.shape[1],
                ),
            }
        )

    def dedup_partition(batch: pa.Table) -> pa.Table:
        """Verdicts for every cluster co-located in one hash partition
        (util.hash_group_blocks): the O(c^2) work runs per cluster run
        after one sort — clusters never straddle partitions."""
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    key_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "centroid_sim": pa.array([], pa.float64()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        cl = batch["cluster"].to_numpy(zero_copy_only=False)
        order = np.argsort(cl, kind="stable")
        cl = cl[order]
        keys = batch[key_col].to_numpy(zero_copy_only=False)[order]
        cs = batch["centroid_sim"].to_numpy(zero_copy_only=False)[order]
        vecs = vecs_from_arrow(batch["vec"].take(pa.array(order, pa.int64())))
        keep = np.empty(len(keys), dtype=bool)
        starts = np.flatnonzero(np.concatenate(([True], cl[1:] != cl[:-1])))
        ends = np.concatenate((starts[1:], [len(cl)]))
        for s, e in zip(starts, ends):
            keep[s:e] = _cluster_verdicts(keys[s:e], vecs[s:e], cs[s:e], threshold)
        return pa.Table.from_pydict(
            {
                key_col: pa.array(keys, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "centroid_sim": pa.array(cs, pa.float64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    from tilecloud_chain_ray.util import hash_group_blocks

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return hash_group_blocks(assigned, ["cluster"], dedup_partition)


def semdedup(
    ds: ray.data.Dataset,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 16,
    train_sample: int = 4096,
    iters: int = 10,
    seed: int = 5,
) -> ray.data.Dataset:
    """The filtered corpus: every input column, semantic duplicates
    dropped (keeps the verdict pass's survivors via a bucketed semi
    join on the key — the drop side is verdict-sized, not broadcast)."""
    from tilecloud_chain_ray.stages.join import hash_join

    verdicts = semdedup_verdicts(
        ds,
        key_col=key_col,
        vec_col=vec_col,
        threshold=threshold,
        n_clusters=n_clusters,
        train_sample=train_sample,
        iters=iters,
        seed=seed,
    )
    keepers = verdicts.map_batches(
        lambda b: b.filter(b["keep"]).select([key_col]), batch_format="pyarrow"
    )
    return hash_join(ds, keepers, on=key_col, how="inner")
