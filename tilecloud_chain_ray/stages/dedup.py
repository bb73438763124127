"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All shapes follow the scalable patterns: content hash computed
vectorized inside ``map_batches``; the only shuffles are
``groupby(hash)`` / ``groupby(band-bucket)`` over *small derived
columns* (never the payload); candidate verification is per-bucket
local work in ``map_groups``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex of utf8 text — matches DuckDB ``md5(text)`` exactly."""
    texts = batch[text_col].to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("content_md5", pa.array(digests, pa.string()))


def exact_dedup(
    ds: ray.data.Dataset, key_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Keep the min-key row per identical text (hash-partitioned).

    Shuffle moves only (content_md5, key) after a projection — the
    payload never moves; survivors are re-joined by key upstream if
    needed.  Returns (content_md5, keep_key, dup_count).
    """
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: add_md5(b, text_col).select([key_col, "content_md5"]),
        batch_format="pyarrow",
    )
    # pure vectorized hash aggregation — never a per-group Python call
    return hashed.groupby("content_md5").aggregate(
        Min(key_col, alias_name="keep_key"), Count(alias_name="dup_count")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_SHINGLE_MULTS = (
    np.uint64(0x9E3779B97F4A7C15),
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0x165667B19E3779F9),
)


_WORD_CRC_CACHE: dict[str, int] = {}


def _word_crc(word: str) -> int:
    h = _WORD_CRC_CACHE.get(word)
    if h is None:
        if len(_WORD_CRC_CACHE) > 1_000_000:
            _WORD_CRC_CACHE.clear()  # bound worker memory on huge vocabularies
        h = zlib.crc32(word.encode())
        _WORD_CRC_CACHE[word] = h
    return h


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes: per-word crc32 (cached — natural
    text repeats words heavily) combined by position-salted
    multiply-xor (vectorized) — one crc per DISTINCT word, not per
    shingle."""
    words = text.split()
    if len(words) < k:
        return np.array([zlib.crc32(" ".join(words).encode())], dtype=np.uint64)
    w = np.array([_word_crc(wd) for wd in words], dtype=np.uint64)
    n = len(w) - k + 1
    with np.errstate(over="ignore"):
        h = w[:n] * _SHINGLE_MULTS[0]
        for j in range(1, k):
            h = h ^ (w[j : j + n] * _SHINGLE_MULTS[min(j, 2)])
    return h


class MinHasher:
    """num_perm seeded universal-hash permutations; vectorized per doc."""

    def __init__(self, num_perm: int = 64, seed: int = 7, shingle_k: int = 3) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        # (num_perm, n_shingles) multiply-shift hash (mod 2^64 wraparound
        # with odd multipliers — standard, fast, fully vectorized)
        with np.errstate(over="ignore"):
            v = self.a[:, None] * sh[None, :] + self.b[:, None]
        return np.min(v, axis=1)


class MinHashStage:
    """Actor: emits (key, band, band_hash) rows — one per LSH band."""

    def __init__(self, key_col="doc_id", text_col="text", num_perm=64, bands=16, seed=7):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, seed)
        self.key_col, self.text_col = key_col, text_col
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        r = self.rows_per_band
        sigs = np.empty((n, self.mh.num_perm), dtype=np.uint64)
        for i, text in enumerate(texts):
            sigs[i] = self.mh.signature(text)
        # band hash: multiply-xor fold of each band's rows — fully
        # vectorized over (docs x bands), no per-band Python
        chunks = sigs.reshape(n, self.bands, r)
        with np.errstate(over="ignore"):
            folded = np.zeros((n, self.bands), dtype=np.uint64)
            for j in range(r):
                folded ^= chunks[:, :, j] * _SHINGLE_MULTS[j % 3] + np.uint64(j)
        band_hash = (folded >> np.uint64(1)).astype(np.int64)  # keep positive int64
        return pa.Table.from_pydict(
            {
                "key": pa.array(np.repeat(keys, self.bands), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(band_hash.ravel(), pa.int64()),
            }
        )


def minhash_candidates(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs: same (band, band_hash) bucket.

    Returns distinct (key_a < key_b) pairs.  The groupby key is the
    (band, band_hash) pair — salting is inherent (16 bands spread hot
    content), buckets are tiny unless texts are truly identical.
    """
    from ray.data.aggregate import Count

    from tilecloud_chain_ray.util import process_cached

    params = (key_col, text_col, num_perm, bands)

    def band_fn(batch: pa.Table) -> pa.Table:
        # task-based with per-process hasher cache: fuses with upstream
        # stages and reuses warm workers (an actor pool here pays ~0.5s
        # per actor of serial autoscaling spin-up for trivial state)
        stage = process_cached(
            ("minhash", params),
            lambda: MinHashStage(
                key_col=key_col, text_col=text_col, num_perm=num_perm, bands=bands
            ),
        )
        return stage(batch)

    banded = ds.map_batches(band_fn, batch_format="pyarrow", batch_size=2048)
    # banded rows are (int64, int32, int64) only — tiny; materialize so
    # the signature computation runs once, not once per consumer
    banded = banded.materialize()
    # most buckets are singletons: find the hot (band, band_hash) pairs
    # with a vectorized aggregate, broadcast that (tiny) set, and run the
    # per-group pair expansion only over hot buckets
    hot = banded.groupby(["band", "band_hash"]).aggregate(Count(alias_name="c"))
    hot_keys = {
        (r["band"], r["band_hash"]) for r in hot.take_all() if r["c"] >= 2
    }
    if not hot_keys:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"key_a": pa.array([], pa.int64()), "key_b": pa.array([], pa.int64())}
            )
        )
    hot_ref = ray.put(hot_keys)

    def only_hot(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        b = batch["band"].to_numpy(zero_copy_only=False)
        h = batch["band_hash"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            ((int(bb), int(hh)) in hk for bb, hh in zip(b, h)), dtype=bool, count=len(b)
        )
        return batch.filter(pa.array(keep))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = np.sort(group["key"].unique())
        if len(ks) < 2:
            return pd.DataFrame({"key_a": [], "key_b": []})
        ia, ib = np.triu_indices(len(ks), k=1)
        return pd.DataFrame({"key_a": ks[ia], "key_b": ks[ib]})

    cand = (
        banded.map_batches(only_hot, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
    )

    # global pair dedup: one vectorized aggregate instead of per-key groups
    return (
        cand.groupby(["key_a", "key_b"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: b.select(["key_a", "key_b"]), batch_format="pyarrow"
        )
    )


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 10_000,
) -> ray.data.Dataset:
    """End-to-end near-dup pairs in three dataset executions.

    1. band signatures (materialized — small int rows),
    2. hot-bucket aggregate (tiny result -> driver),
    3. one pass over the corpus for candidate shingle sets.

    Pair expansion and Jaccard verification happen on the driver: the
    candidate set is bounded by actual duplication (and ``max_bucket``
    guards pathological buckets), so this is the low-latency path; the
    staged ``minhash_candidates`` + ``verify_jaccard`` pipeline is the
    same algorithm with distributed pair expansion for dup-heavy
    corpora.
    """
    from ray.data.aggregate import Count

    banded = ds.map_batches(
        lambda b: _band_cached(b, key_col, text_col, num_perm, bands),
        batch_format="pyarrow",
        batch_size=2048,
    ).materialize()

    if banded.count() <= 2_000_000:
        # small band table: one driver-side vectorized pass replaces the
        # hot-bucket aggregate + filter executions entirely
        tbl = pa.concat_tables(list(banded.iter_batches(batch_format="pyarrow")))
        band_np = tbl["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        hash_np = tbl["band_hash"].to_numpy(zero_copy_only=False)
        key_np = tbl["key"].to_numpy(zero_copy_only=False)
        composite = (band_np.astype(np.uint64) << np.uint64(48)) ^ hash_np.astype(np.uint64)
        order = np.argsort(composite, kind="stable")
        composite, key_np = composite[order], key_np[order]
        starts = np.flatnonzero(np.r_[True, composite[1:] != composite[:-1]])
        ends = np.r_[starts[1:], len(composite)]
        buckets = {}
        for s, e in zip(starts, ends):
            if e - s >= 2:
                buckets[int(composite[s])] = set(key_np[s:e].tolist())
    else:
        hot = banded.groupby(["band", "band_hash"]).aggregate(Count(alias_name="c"))
        hot_keys = {(r["band"], r["band_hash"]) for r in hot.take_all() if r["c"] >= 2}
        if not hot_keys:
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "key_a": pa.array([], pa.int64()),
                        "key_b": pa.array([], pa.int64()),
                        "jaccard": pa.array([], pa.float64()),
                    }
                )
            )
        hot_ref = ray.put(hot_keys)

        def only_hot(batch: pa.Table) -> pa.Table:
            hk = ray.get(hot_ref)
            b = batch["band"].to_numpy(zero_copy_only=False)
            h = batch["band_hash"].to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                ((int(bb), int(hh)) in hk for bb, hh in zip(b, h)), dtype=bool, count=len(b)
            )
            return batch.filter(pa.array(keep))

        hot_rows = banded.map_batches(only_hot, batch_format="pyarrow").take_all()
        buckets = {}
        for r in hot_rows:
            buckets.setdefault((r["band"], r["band_hash"]), set()).add(r["key"])
    pairs = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue  # pathological bucket: log-and-skip guard
        ks = sorted(members)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                pairs.add((ks[i], ks[j]))
    if not pairs:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "key_a": pa.array([], pa.int64()),
                    "key_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    keys_needed = sorted({k for p in pairs for k in p})
    needed = ds.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b[key_col], value_set=pa.array(keys_needed))
        ).select([key_col, text_col]),
        batch_format="pyarrow",
    ).take_all()
    shingles = {r[key_col]: set(_shingle_hashes(r[text_col]).tolist()) for r in needed}
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(pairs):
        sa, sb = shingles.get(a, set()), shingles.get(b, set())
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "key_a": pa.array(out_a, pa.int64()),
                "key_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )
    )


def _band_cached(batch, key_col, text_col, num_perm, bands):
    from tilecloud_chain_ray.util import process_cached

    stage = process_cached(
        ("minhash_band", key_col, text_col, num_perm, bands),
        lambda: MinHashStage(key_col=key_col, text_col=text_col, num_perm=num_perm, bands=bands),
    )
    return stage(batch)


def verify_jaccard(
    candidate_pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs.

    Broadcast the shingle sets of only the candidate keys (small side)
    via ``ray.put``; verification is then an embarrassingly parallel
    map over pairs.
    """
    # pairs are consumed twice (key collection + verify) — pin the tiny
    # result instead of re-executing the whole LSH chain
    candidate_pairs = candidate_pairs.materialize()
    keys_needed = set()
    for row in candidate_pairs.take_all():
        keys_needed.add(row["key_a"])
        keys_needed.add(row["key_b"])
    needed = ds.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b[key_col], value_set=pa.array(sorted(keys_needed)))
        ).select([key_col, text_col]),
        batch_format="pyarrow",
    ).take_all()
    shingles = {
        r[key_col]: set(_shingle_hashes(r[text_col], shingle_k).tolist()) for r in needed
    }
    ref = ray.put(shingles)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        a = batch["key_a"].to_numpy(zero_copy_only=False)
        b = batch["key_b"].to_numpy(zero_copy_only=False)
        jac = np.zeros(len(a))
        for i in range(len(a)):
            sa, sb = sh.get(a[i], set()), sh.get(b[i], set())
            union = len(sa | sb)
            jac[i] = len(sa & sb) / union if union else 0.0
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return candidate_pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word crc32 hashes; appends ``simhash`` plus
    4 16-bit block columns for hamming-distance blocking."""
    texts = batch[text_col].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            continue
        hashes = np.array([zlib.crc32(w.encode()) for w in words], dtype=np.uint64)
        # widen to 64 bits with a second salt
        hi = np.array([zlib.crc32(w.encode(), 0xABCD) for w in words], dtype=np.uint64)
        h64 = (hi << np.uint64(32)) | hashes
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)
        )
    table = batch.append_column("simhash", pa.array(out.astype(np.int64), pa.int64()))
    for blk in range(4):
        part = ((out >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64)
        table = table.append_column(f"simhash_b{blk}", pa.array(part, pa.int64()))
    return table


def simhash_candidates(
    ds: ray.data.Dataset, key_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-dup pairs with hamming(simhash) <= max_hamming, blocked on
    any equal 16-bit quarter (exact for max_hamming <= 3 by pigeonhole)."""
    hashed = ds.map_batches(
        lambda b: simhash_batch(b, text_col).select(
            [key_col, "simhash", "simhash_b0", "simhash_b1", "simhash_b2", "simhash_b3"]
        ),
        batch_format="pyarrow",
    )

    from ray.data.aggregate import Count, Min

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[key_col]).sort_values(key_col)
        ks = g[key_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ks) < 2:
            return pd.DataFrame({"key_a": [], "key_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ks), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        ok = ham <= max_hamming
        return pd.DataFrame({"key_a": ks[ia][ok], "key_b": ks[ib][ok], "hamming": ham[ok]})

    hashed = hashed.materialize()  # reused by 4 block passes

    if hashed.count() <= 2_000_000:
        # small hash table: one driver-side pass over all 4 blockings
        # (same shape as the minhash shortcut)
        tbl = pa.concat_tables(list(hashed.iter_batches(batch_format="pyarrow")))
        ks_all = tbl[key_col].to_numpy(zero_copy_only=False)
        hs_all = tbl["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pair_ham: dict[tuple, int] = {}
        for blk in range(4):
            part = ((hs_all >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            sp, sk, sh = part[order], ks_all[order], hs_all[order]
            starts = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
            ends = np.r_[starts[1:], len(sp)]
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                ks = sk[s:e]
                hs = sh[s:e]
                o2 = np.argsort(ks, kind="stable")
                ks, hs = ks[o2], hs[o2]
                ia, ib = np.triu_indices(len(ks), k=1)
                x = hs[ia] ^ hs[ib]
                ham = np.zeros(len(x), dtype=np.int64)
                v = x.copy()
                for _ in range(64):
                    ham += (v & np.uint64(1)).astype(np.int64)
                    v >>= np.uint64(1)
                ok = ham <= max_hamming
                for a, b, hm in zip(ks[ia][ok], ks[ib][ok], ham[ok]):
                    key = (int(a), int(b))
                    if key not in pair_ham or pair_ham[key] > hm:
                        pair_ham[key] = int(hm)
        items = sorted(pair_ham.items())
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "key_a": pa.array([k[0] for k, _ in items], pa.int64()),
                    "key_b": pa.array([k[1] for k, _ in items], pa.int64()),
                    "hamming": pa.array([h for _, h in items], pa.int64()),
                }
            )
        )

    parts = []
    for blk in range(4):
        col = f"simhash_b{blk}"
        hot = hashed.groupby(col).aggregate(Count(alias_name="c"))
        hot_vals = pa.array(sorted(r[col] for r in hot.take_all() if r["c"] >= 2))
        if len(hot_vals) == 0:
            continue
        filtered = hashed.map_batches(
            lambda b, col=col, hv=hot_vals: b.filter(
                pa.compute.is_in(b[col], value_set=hv)
            ),
            batch_format="pyarrow",
        )
        parts.append(filtered.groupby(col).map_groups(block_pairs, batch_format="pandas"))
    if not parts:
        import ray.data as rd

        return rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "key_a": pa.array([], pa.int64()),
                    "key_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    allp = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return (
        allp.groupby(["key_a", "key_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(
    ds: ray.data.Dataset,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    dim: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate vectors by cosine >= threshold.

    Random-hyperplane LSH bucket (seeded) -> exact cosine within
    buckets.  Note: LSH recall < 1 by construction for thresholds well
    below 1; for exactness tests use brute force (knn.py).
    """
    first = ds.take(1)[0]
    d = dim or len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, n_planes))
    planes_ref = ray.put(planes)

    def bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True).clip(1e-12)
        sig = (vecs @ pl > 0).astype(np.uint64)
        code = (sig << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        return pa.Table.from_pydict(
            {
                "key": batch[key_col],
                "bucket": pa.array(code.astype(np.int64), pa.int64()),
                "vec": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = group["key"].to_numpy()
        order = np.argsort(ks)
        ks = ks[order]
        vecs = np.stack(group["vec"].to_numpy()[order])
        if len(ks) < 2:
            return pd.DataFrame({"key_a": [], "key_b": [], "cosine": []})
        sims = vecs @ vecs.T
        ia, ib = np.triu_indices(len(ks), k=1)
        ok = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"key_a": ks[ia][ok], "key_b": ks[ib][ok], "cosine": sims[ia, ib][ok]}
        )

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
