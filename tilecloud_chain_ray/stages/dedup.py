"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All shapes follow the scalable patterns: content hash computed
vectorized inside ``map_batches``; the only shuffles are hash /
band-bucket task exchanges (util.hash_group_blocks) over *small
derived columns* (never the payload); candidate verification is
per-bucket local work inside the exchange kernels.
"""

from __future__ import annotations

import hashlib
import logging
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from tilecloud_chain_ray.util import default_buckets, strip_meta, vecs_from_arrow

logger = logging.getLogger(__name__)

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
    from tilecloud_chain_ray.util import exchange_aggregate

    hashed = ds.map_batches(
        lambda b: add_md5(b, text_col).select([key_col, "content_md5"]),
        batch_format="pyarrow",
    )
    # pure vectorized hash aggregation — never a per-group Python call;
    # md5 keys are ~all-distinct so there is nothing to pre-combine,
    # but the task exchange still beats the sort-groupby (no ordering
    # of the ~one-row groups, no zero-schema empty bundles)
    return exchange_aggregate(
        hashed,
        ["content_md5"],
        [(key_col, "min"), (key_col, "count")],
        ["content_md5", "keep_key", "dup_count"],
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
    del concurrency  # kept for API compat: banding became a task stage
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
    return _expand_hot_bucket_pairs(banded, max_bucket=10_000)


def _expand_hot_bucket_pairs(
    banded: ray.data.Dataset, max_bucket: int = 10_000, n_buckets: int | None = None
) -> ray.data.Dataset:
    """Distinct (key_a < key_b) candidate pairs from a materialized
    (key, band, band_hash) table — fully distributed.

    ONE bucketed shuffle: every band row goes to
    ``hash(band, band_hash) % n_buckets``; each of the ~``n_buckets``
    groups finds its (band, band_hash) runs vectorized (lexsort + run
    boundaries) and expands pairs for runs of >= 2 members.  A
    pre-aggregate "hot bucket" detection pass was measured strictly
    slower on Ray (its groupby shuffles the same rows without reducing
    them — 2.7M near-unique keys — and one Ray group per key costs
    ~1 ms of map_groups overhead).  Buckets above ``max_bucket``
    members are skipped WITH a warning (their pairs are not reported —
    degenerate near-identical content better handled by exact dedup
    first).  Bump ``n_buckets`` with cluster size.
    """
    if n_buckets is None:
        n_buckets = default_buckets(floor=64, per_core=4)

    def add_bucket(batch: pa.Table) -> pa.Table:
        packed = _pack_band_keys(
            batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64),
            batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
        )
        with np.errstate(over="ignore"):
            bucket = (
                packed * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(40)
            ) % np.uint64(n_buckets)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def pairs_bucket(batch: pa.Table) -> pa.Table:
        """All (key_a < key_b) pairs of every (band, band_hash) run in
        this partition — one fully vectorized pass (a Python loop over
        the ~10k runs per bucket was the wall-time hot spot: millions
        of tiny np.unique calls across buckets).  Runs are keyed on
        (band, band_hash), so several ``bucket`` groups co-located in
        one hash partition (util.hash_group_blocks) expand identically."""
        empty = pa.table(
            {"key_a": pa.array([], pa.int64()), "key_b": pa.array([], pa.int64())}
        )
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bhash = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(band)
        if n < 2:
            return empty
        order = np.lexsort((key, bhash, band))
        band, bhash, key = band[order], bhash[order], key[order]
        boundary = (band[1:] != band[:-1]) | (bhash[1:] != bhash[:-1])
        starts = np.flatnonzero(np.r_[True, boundary])
        lengths = np.diff(np.r_[starts, n])
        run_of = np.repeat(np.arange(len(starts)), lengths)
        pos = np.arange(n) - starts[run_of]  # position within the run
        # rows are unique per (key, band): keys within a run are
        # distinct and sorted, so each row pairs with the `pos` rows
        # before it in its run — no per-run dedup needed
        npairs = pos.copy()
        oversized = lengths > max_bucket
        if oversized.any():
            logger.warning(
                "skipping %d LSH bucket(s) larger than max_bucket=%d "
                "(largest: %d members); their pairs are NOT reported",
                int(oversized.sum()),
                max_bucket,
                int(lengths.max()),
            )
            npairs[oversized[run_of]] = 0
        total = int(npairs.sum())
        if total == 0:
            return empty
        right = np.repeat(np.arange(n), npairs)
        cum = np.concatenate([[0], np.cumsum(npairs)])
        k = np.arange(total) - cum[right]
        left = right - pos[right] + k  # run start + k-th earlier member
        ka, kb = key[left], key[right]
        # duplicate input keys (same key twice in a run) would emit
        # (k, k) self-pairs here where the driver path's set() cannot —
        # drop them so both physical paths keep the key_a < key_b
        # invariant
        real = ka != kb
        if not real.all():
            ka, kb = ka[real], kb[real]
        return pa.table(
            {"key_a": pa.array(ka, pa.int64()), "key_b": pa.array(kb, pa.int64())}
        )

    from tilecloud_chain_ray.util import hash_group_blocks

    # task exchange, not sort-groupby: no zero-schema empty bundles
    # from pair-free buckets (see util.hash_group_blocks)
    cand = hash_group_blocks(
        banded.map_batches(add_bucket, batch_format="pyarrow"),
        ["bucket"],
        pairs_bucket,
        num_partitions=n_buckets,
    )

    # global pair dedup, bucketed: a direct two-column groupby-aggregate
    # over the raw pairs measured ~60 s where this takes ~2 s — Ray's
    # sort-based groupby pays per distinct key, so always group by a
    # small salted bucket and dedup vectorized inside it
    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)  # upstream blocks are pandas-converted
        bucket = _pair_bucket_of(
            batch["key_a"].to_numpy(zero_copy_only=False),
            batch["key_b"].to_numpy(zero_copy_only=False),
            n_buckets,
        )
        return batch.append_column("pbucket", pa.array(bucket, pa.int64()))

    def dedup_bucket(batch: pa.Table) -> pa.Table:
        # distinct via an empty-aggregate group_by: one Acero C pass
        return batch.select(["key_a", "key_b"]).group_by(["key_a", "key_b"]).aggregate([])

    return hash_group_blocks(
        cand.map_batches(add_pair_bucket, batch_format="pyarrow"),
        ["pbucket"],
        dedup_bucket,
        num_partitions=n_buckets,
    )


def _pair_bucket_of(ka: np.ndarray, kb: np.ndarray, n_buckets: int) -> np.ndarray:
    """Salted shuffle bucket of an (a, b) pair — one mix per side, xor,
    top bits mod n_buckets (shared by every pair-dedup groupby)."""
    with np.errstate(over="ignore"):
        mixed = (ka.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            kb.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        return ((mixed >> np.uint64(40)) % np.uint64(n_buckets)).astype(np.int64)


def _pack_band_keys(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """(band, band_hash) -> one uint64 key: band in the top 16 bits,
    the hash's low 48 bits below.  Lossy (drops 15 hash bits) but only
    in the safe direction for its uses (bucketing / membership
    prefilters): a collision admits an extra row that then lands in its
    true (band, band_hash) group downstream and pairs with nothing —
    false positives allowed, false negatives impossible."""
    return (band.astype(np.uint64) << np.uint64(48)) | (
        band_hash.astype(np.uint64) & np.uint64((1 << 48) - 1)
    )


def _empty_pairs(with_jaccard: bool = True) -> ray.data.Dataset:
    cols = {
        "key_a": pa.array([], pa.int64()),
        "key_b": pa.array([], pa.int64()),
    }
    if with_jaccard:
        cols["jaccard"] = pa.array([], pa.float64())
    return ray.data.from_arrow(pa.Table.from_pydict(cols))


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 10_000,
    small_table_max_bytes: int = 48 << 20,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """End-to-end near-dup pairs: band signatures -> candidate pairs ->
    exact Jaccard >= ``threshold``; output (key_a < key_b, jaccard).

    Two physical paths with identical semantics:

    * **driver shortcut** — when the band table fits
      ``small_table_max_bytes`` (~24 B/row: 3 small ints), one
      vectorized driver pass does bucket detection + pair expansion,
      and only the candidate keys' shingle sets are pulled for
      verification.  Low latency; bounded by the gate in *bytes*.
    * **distributed** — per-bucket exchange-kernel pair expansion over
      hot (band, band_hash) buckets and a bucketed join of the pair
      table against the (key, sig) shingle table
      (`_verify_pairs_distributed`) — nothing proportional to the
      duplicate universe ever lands on the driver.
    """
    banded = ds.map_batches(
        lambda b: _band_cached(b, key_col, text_col, num_perm, bands),
        batch_format="pyarrow",
        batch_size=2048,
    ).materialize()

    n_band_rows = banded.count()
    if not force_distributed and n_band_rows * 24 <= small_table_max_bytes:
        # small band table: one driver-side vectorized pass replaces the
        # hot-bucket aggregate + filter executions entirely
        tbl = pa.concat_tables(list(banded.iter_batches(batch_format="pyarrow")))
        band_np = tbl["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        hash_np = tbl["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        key_np = tbl["key"].to_numpy(zero_copy_only=False)
        # collision-free bucket boundaries: lexsort on (band, hash) and
        # break runs when EITHER column changes (a packed composite key
        # can alias distinct buckets — band_hash spans 63 bits)
        order = np.lexsort((hash_np, band_np))
        band_s, hash_s, key_np = band_np[order], hash_np[order], key_np[order]
        boundary = (band_s[1:] != band_s[:-1]) | (hash_s[1:] != hash_s[:-1])
        starts = np.flatnonzero(np.r_[True, boundary])
        ends = np.r_[starts[1:], len(band_s)]
        pairs = set()
        skipped = 0
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            members = set(key_np[s:e].tolist())
            if len(members) > max_bucket:
                skipped += 1
                continue
            ks = sorted(members)
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    pairs.add((ks[i], ks[j]))
        if skipped:
            logger.warning(
                "minhash_dedup_pairs: skipped %d bucket(s) larger than "
                "max_bucket=%d — near-duplicate pairs inside them are NOT reported",
                skipped,
                max_bucket,
            )
        if not pairs:
            return _empty_pairs()
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

    # distributed path: per-bucket pair expansion + bucketed sig join
    cand = _expand_hot_bucket_pairs(banded, max_bucket=max_bucket)
    sigs = shingle_sig_table(ds, key_col, text_col)
    return _verify_pairs_distributed(cand, sigs, threshold)


def _band_cached(batch, key_col, text_col, num_perm, bands):
    from tilecloud_chain_ray.util import process_cached

    stage = process_cached(
        ("minhash_band", key_col, text_col, num_perm, bands),
        lambda: MinHashStage(key_col=key_col, text_col=text_col, num_perm=num_perm, bands=bands),
    )
    return stage(batch)


def shingle_sig_table(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """(key, sig) table: per-doc sorted-unique shingle hashes as a
    ``list<uint64>`` column — the distributed-join side of Jaccard
    verification (the payload text never enters the shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        texts = batch[text_col].to_pylist()
        sigs = [np.unique(_shingle_hashes(t, shingle_k)) for t in texts]
        offsets = np.zeros(len(sigs) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in sigs], out=offsets[1:])
        values = np.concatenate(sigs) if sigs else np.array([], np.uint64)
        sig_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.uint64())
        )
        return pa.Table.from_pydict({"key": keys, "sig": sig_col})

    return ds.map_batches(fn, batch_format="pyarrow")


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    k = keys.astype(np.uint64)
    return (((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _verify_pairs_distributed(
    candidate_pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    threshold: float,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact Jaccard over candidate pairs with NO driver materialization.

    Two bucketed shuffles (``hash(key) % n_buckets`` — NEVER one Ray
    group per key/pair, which costs ~1 ms per tiny group): (1) each
    bucket maps its pair-halves against its sig rows via one
    bucket-local dict, attaching each doc's shingle sig to every
    half referencing it; (2) buckets of ``hash(key_a) % B`` re-unite
    the halves and compute exact Jaccard per pair on the sorted uint64
    arrays.  Only int64 keys + the candidate universe's sig arrays
    move.  Bump ``n_buckets`` for larger clusters / hotter keys.
    """
    if n_buckets is None:
        n_buckets = default_buckets(floor=64, per_core=4)

    def halves(batch: pa.Table) -> pa.Table:
        a = batch["key_a"].combine_chunks()
        b = batch["key_b"].combine_chunks()
        n = batch.num_rows
        jkey = pa.concat_arrays([a, b])
        bucket = _bucket_of(np.asarray(jkey), n_buckets)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "jkey": jkey,
                "key_a": pa.concat_arrays([a, a]),
                "key_b": pa.concat_arrays([b, b]),
                "side": pa.array([0] * n + [1] * n, pa.int8()),
                "sig": pa.array([None] * (2 * n), pa.list_(pa.uint64())),
            }
        )

    def sig_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch["key"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(_bucket_of(keys, n_buckets), pa.int64()),
                "jkey": batch["key"],
                "key_a": pa.nulls(n, pa.int64()),
                "key_b": pa.nulls(n, pa.int64()),
                "side": pa.array(np.full(n, 2, dtype=np.int8), pa.int8()),
                "sig": batch["sig"],
            }
        )

    tagged = candidate_pairs.map_batches(halves, batch_format="pyarrow").union(
        sigs.map_batches(sig_rows, batch_format="pyarrow")
    )

    def attach_bucket(batch: pa.Table) -> pd.DataFrame:
        # sig_map lookups are by jkey, and every row with one jkey
        # shares a bucket — a merged multi-bucket partition just builds
        # a bigger map
        group = batch.to_pandas()
        is_sig = group["side"] == 2
        pair_halves = group[~is_sig]
        if pair_halves.empty:
            # typed arrow empty: a pandas object column would land as
            # arrow null type and break schema unification downstream
            return pa.table(
                {"pkey": pa.array([], pa.int64()),
                 "key_a": pa.array([], pa.int64()),
                 "key_b": pa.array([], pa.int64()),
                 "side": pa.array([], pa.int8()),
                 "sig": pa.array([], pa.list_(pa.uint64()))}
            )
        sig_map = dict(zip(group.loc[is_sig, "jkey"], group.loc[is_sig, "sig"]))
        empty = np.array([], dtype=np.uint64)
        sigs_out = [sig_map.get(jk, empty) for jk in pair_halves["jkey"]]
        ka = pair_halves["key_a"].to_numpy(dtype=np.int64)
        kb = pair_halves["key_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                # re-bucket by pair (via key_a: both halves share it)
                "pkey": _bucket_of(ka, n_buckets)
                + (kb % np.int64(n_buckets)) * np.int64(n_buckets),
                "key_a": ka,
                "key_b": kb,
                "side": pair_halves["side"].to_numpy(dtype=np.int8),
                "sig": sigs_out,
            }
        )

    from tilecloud_chain_ray.util import hash_group_blocks

    attached = hash_group_blocks(tagged, ["bucket"], attach_bucket)

    def combine_bucket(batch: pa.Table) -> pd.DataFrame:
        group = batch.to_pandas()
        # One vectorized pass over ALL pairs in the bucket: the sigs of
        # every half concatenate into one flat uint64 buffer tagged with
        # a pair ordinal, and one lexsort finds cross-side duplicates —
        # a (pair, value) appearing twice must be one half per side,
        # since each side's sig is a unique set and pairs are distinct.
        # Replaces a per-pair Python loop (np.intersect1d per pair) that
        # dominated on dup-heavy corpora.
        empty = pd.DataFrame(
            {
                "key_a": pd.Series([], dtype=np.int64),
                "key_b": pd.Series([], dtype=np.int64),
                "jaccard": pd.Series([], dtype=np.float64),
            }
        )
        if group.empty:
            return empty
        ka = group["key_a"].to_numpy(dtype=np.int64)
        kb = group["key_b"].to_numpy(dtype=np.int64)
        side = group["side"].to_numpy(dtype=np.int8)
        order = np.lexsort((side, kb, ka))
        ka, kb, side = ka[order], kb[order], side[order]
        sig_rows = group["sig"].to_numpy()[order]
        n = len(ka)
        new_pair = np.empty(n, dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (ka[1:] != ka[:-1]) | (kb[1:] != kb[:-1])
        pid_row = np.cumsum(new_pair) - 1
        n_pairs = int(pid_row[-1]) + 1
        lens = np.fromiter((len(a) for a in sig_rows), dtype=np.int64, count=n)
        sa = np.bincount(
            pid_row[side == 0], weights=lens[side == 0], minlength=n_pairs
        ).astype(np.int64)
        sb = np.bincount(
            pid_row[side == 1], weights=lens[side == 1], minlength=n_pairs
        ).astype(np.int64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(a, dtype=np.uint64) for a in sig_rows if len(a)]
            )
            pid_val = np.repeat(pid_row, lens)
            o2 = np.lexsort((flat, pid_val))
            pv, vv = pid_val[o2], flat[o2]
            dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
            inter = np.bincount(pv[1:][dup], minlength=n_pairs).astype(np.int64)
        else:
            inter = np.zeros(n_pairs, dtype=np.int64)
        union = sa + sb - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = j >= threshold
        if not keep.any():
            return empty
        starts = np.flatnonzero(new_pair)
        return pd.DataFrame(
            {
                "key_a": ka[starts][keep],
                "key_b": kb[starts][keep],
                "jaccard": j[keep],
            }
        )

    return hash_group_blocks(attached, ["pkey"], combine_bucket)


def verify_jaccard(
    candidate_pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
    small_table_max_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs.

    Output schema is (key_a, key_b, jaccard) on BOTH physical paths —
    extra input columns are dropped so callers can't come to depend on
    columns that only survive the small-input path.

    When the candidate universe is small (estimated shingle-set bytes
    under ``small_table_max_bytes``) the shingle sets of only the
    candidate keys are broadcast via ``ray.put`` and verification is an
    embarrassingly parallel map over pairs.  Otherwise the verification
    runs fully distributed (`_verify_pairs_distributed`): a bucketed
    join of the pair table against the (key, sig) table — no driver
    materialization proportional to duplication.
    """
    # pairs are consumed twice (size probe + verify) — pin the tiny
    # result instead of re-executing the whole LSH chain
    candidate_pairs = candidate_pairs.materialize()
    n_pairs = candidate_pairs.count()
    # ~2 keys/pair x (set overhead + ~n shingles x 8B); 4 KiB/doc is a
    # generous web-text estimate — the gate is bytes, not rows
    est_bytes = n_pairs * 2 * 4096
    if est_bytes > small_table_max_bytes:
        sigs = shingle_sig_table(ds, key_col, text_col, shingle_k)
        return _verify_pairs_distributed(candidate_pairs, sigs, threshold)

    keys_needed = set()
    for row in candidate_pairs.take_all():
        keys_needed.add(row["key_a"])
        keys_needed.add(row["key_b"])
    if not keys_needed:
        return _empty_pairs(with_jaccard=True)
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
        out = batch.select(["key_a", "key_b"]).append_column(
            "jaccard", pa.array(jac, pa.float64())
        )
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return candidate_pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_WORD_H64_CACHE: dict[str, int] = {}


def _word_h64(word: str) -> int:
    """64-bit word hash: crc32 low half | salted crc32 high half, cached
    per worker process (natural text repeats words heavily)."""
    h = _WORD_H64_CACHE.get(word)
    if h is None:
        if len(_WORD_H64_CACHE) > 1_000_000:
            _WORD_H64_CACHE.clear()
        enc = word.encode()
        h = (zlib.crc32(enc, 0xABCD) << 32) | zlib.crc32(enc)
        _WORD_H64_CACHE[word] = h
    return h


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word crc32 hashes; appends ``simhash`` plus
    4 16-bit block columns for hamming-distance blocking.

    Per doc: one cached hash lookup per word occurrence, then
    ``np.unpackbits`` -> column sum -> ``np.packbits`` — cache-friendly
    small arrays, no per-bit Python and no bit-string round-trips
    (measured ~2.2x the naive per-word crc/bit-matrix version even on
    cache-hostile synthetic text; more on repetitive real text).
    """
    texts = batch[text_col].to_pylist()
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            continue
        h64 = np.fromiter((_word_h64(w) for w in ws), dtype=np.uint64, count=len(ws))
        bits = np.unpackbits(
            h64.view(np.uint8).reshape(len(ws), 8), axis=1, bitorder="little"
        )
        ones = bits.sum(axis=0, dtype=np.int32)
        # votes > 0  <=>  2*ones - n_words > 0
        sign = (2 * ones > len(ws)).astype(np.uint8)
        out[i] = np.packbits(sign, bitorder="little").view(np.uint64)[0]
    table = batch.append_column("simhash", pa.array(out.astype(np.int64), pa.int64()))
    for blk in range(4):
        part = ((out >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64)
        table = table.append_column(f"simhash_b{blk}", pa.array(part, pa.int64()))
    return table


# 64 KiB table: popcount of every 16-bit value (fancy indexing over it
# measured ~7x the old 64-round shift/accumulate loop and ~3x a SWAR
# reduction — numpy uint64 multiplies don't vectorize well)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (any shape), via four
    16-bit table lookups per word."""
    b = np.ascontiguousarray(x).view(np.uint16)
    return _POP16[b].reshape(x.shape + (4,)).sum(-1, dtype=np.int64)


def _block_run_pairs(
    bv: np.ndarray, ks: np.ndarray, hs: np.ndarray, max_hamming: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Candidate pairs within equal-``bv`` runs: sort by the packed
    (block<<16 | value) id, then all-pairs hamming inside each run.
    Duplicate keys inside a run are collapsed to their first occurrence
    (no self-pairs).  Shared by the driver shortcut and the distributed
    bucket pass so the two physical paths cannot diverge."""
    order = np.argsort(bv, kind="stable")
    sbv, sk, sh = bv[order], ks[order], hs[order]
    starts = np.flatnonzero(np.r_[True, sbv[1:] != sbv[:-1]])
    ends = np.r_[starts[1:], len(sbv)]
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_h: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        kk, hh = sk[s:e], sh[s:e]
        o2 = np.argsort(kk, kind="stable")
        kk, hh = kk[o2], hh[o2]
        uniq = np.r_[True, kk[1:] != kk[:-1]]
        kk, hh = kk[uniq], hh[uniq]
        m = len(kk)
        if m < 2:
            continue
        # chunked all-pairs: triu_indices on a hot block value (a
        # common quarter across near-identical media) allocates two
        # O(m^2) int64 arrays; row chunks against the run keep the
        # intermediates O(chunk x m) with the identical pair order
        blk = 2048
        for s2 in range(0, m, blk):
            e2 = min(s2 + blk, m)
            ham = _popcount64(hh[s2:e2, None] ^ hh[None, :])
            bi, bj = np.nonzero(ham <= max_hamming)
            up = s2 + bi < bj
            bi, bj = bi[up], bj[up]
            out_a.append(kk[s2 + bi])
            out_b.append(kk[bj])
            out_h.append(ham[bi, bj])
    if not out_a:
        z = np.array([], dtype=np.int64)
        return z, z, z
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_h)


def _fan_block_ids(ks: np.ndarray, hs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Each (key, simhash) row fans out to its 4 packed block ids
    ``bv = blk << 16 | quarter`` (cardinality <= 4 * 65536)."""
    n = len(ks)
    bvs = np.empty(4 * n, dtype=np.int64)
    for blk in range(4):
        part = ((hs >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64)
        bvs[blk * n : (blk + 1) * n] = (blk << 16) | part
    return bvs, np.tile(ks, 4), np.tile(hs, 4)


def simhash_candidates(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    small_table_max_bytes: int = 96 << 20,
    force_distributed: bool = False,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs with hamming(simhash) <= max_hamming, blocked on
    any equal 16-bit quarter (exact for max_hamming <= 3 by pigeonhole).

    Both physical paths run ONE pass over the hash table: the 4
    blockings are packed into a single (block, value) id per fanned
    row, so the distributed path is a single salted groupby (formerly
    4x(hot-count groupby + take_all + filter + groupby))."""
    hashed = ds.map_batches(
        lambda b: simhash_batch(b, text_col).select([key_col, "simhash"]),
        batch_format="pyarrow",
    )
    return hamming_blocked_pairs(
        hashed,
        key_col=key_col,
        hash_col="simhash",
        max_hamming=max_hamming,
        small_table_max_bytes=small_table_max_bytes,
        force_distributed=force_distributed,
        n_buckets=n_buckets,
    )


def hamming_blocked_pairs(
    hashed: ray.data.Dataset,
    key_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    small_table_max_bytes: int = 96 << 20,
    force_distributed: bool = False,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Pairs with hamming(hash) <= max_hamming over ANY 64-bit hash
    column (text simhash, image pHash/dHash, ...), blocked on equal
    16-bit quarters — exact for max_hamming <= 3 by pigeonhole; for
    4..7 the quarter blocking is a high-recall heuristic.  Shared by
    simhash_candidates (text), stages/image_dedup (pHash/dHash) and
    stages/audio_dedup (spectral fingerprints)."""
    if n_buckets is None:
        n_buckets = default_buckets(floor=64, per_core=4)

    hashed = hashed.materialize()  # reused by the count gate + pair pass

    # ~16 B/row: key + simhash — gate in bytes, not rows
    if not force_distributed and hashed.count() * 16 <= small_table_max_bytes:
        # small hash table: one driver-side pass over all 4 blockings
        # (same shape as the minhash shortcut)
        tbl = pa.concat_tables(list(hashed.iter_batches(batch_format="pyarrow")))
        ks_all = tbl[key_col].to_numpy(zero_copy_only=False)
        hs_all = tbl[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        a, b, h = _block_run_pairs(*_fan_block_ids(ks_all, hs_all), max_hamming)
        df = (
            pd.DataFrame({"key_a": a, "key_b": b, "hamming": h})
            .groupby(["key_a", "key_b"], as_index=False)["hamming"]
            .min()
            .sort_values(["key_a", "key_b"])
        )
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "key_a": pa.array(df["key_a"].to_numpy(), pa.int64()),
                    "key_b": pa.array(df["key_b"].to_numpy(), pa.int64()),
                    "hamming": pa.array(df["hamming"].to_numpy(), pa.int64()),
                }
            )
        )

    # distributed single pass: fan each row to its 4 packed block ids,
    # salt the id into n_buckets groups (bounded group count — never
    # row-scale), detect equal-id runs vectorized inside each bucket
    def fan(batch: pa.Table) -> pa.Table:
        ks = batch[key_col].to_numpy(zero_copy_only=False)
        hs = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bvs, kf, hf = _fan_block_ids(ks, hs)
        bucket = (
            (bvs.astype(np.uint64) * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        ) % np.uint64(n_buckets)
        return pa.Table.from_pydict(
            {
                "bv": pa.array(bvs, pa.int64()),
                "bbucket": pa.array(bucket.astype(np.int64), pa.int64()),
                "k": pa.array(kf, pa.int64()),
                "h": pa.array(hf.astype(np.int64), pa.int64()),
            }
        )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        # runs are keyed on bv (same bv -> same bucket), so merged
        # multi-bucket partitions pair identically
        a, b, h = _block_run_pairs(
            batch["bv"].to_numpy(zero_copy_only=False),
            batch["k"].to_numpy(zero_copy_only=False),
            batch["h"].to_numpy(zero_copy_only=False).astype(np.uint64),
            max_hamming,
        )
        return pa.table(
            {
                "key_a": pa.array(a, pa.int64()),
                "key_b": pa.array(b, pa.int64()),
                "hamming": pa.array(h.astype(np.int64), pa.int64()),
            }
        )

    from tilecloud_chain_ray.util import hash_group_blocks

    allp = hash_group_blocks(
        hashed.map_batches(fan, batch_format="pyarrow"),
        ["bbucket"],
        bucket_pairs,
        num_partitions=n_buckets,
    )

    # bucketed pair dedup (min hamming per pair): Ray's two-column
    # sort groupby pays per distinct key — salt to 256 buckets and
    # reduce vectorized inside each (same lesson as the minhash path)
    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        batch = strip_meta(batch)  # upstream blocks are pandas-converted
        bucket = _pair_bucket_of(
            batch["key_a"].to_numpy(zero_copy_only=False),
            batch["key_b"].to_numpy(zero_copy_only=False),
            256,
        )
        return batch.append_column("pbucket", pa.array(bucket, pa.int64()))

    def min_ham_bucket(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(["key_a", "key_b", "hamming"])
            .group_by(["key_a", "key_b"])
            .aggregate([("hamming", "min")])
        )
        return t.rename_columns(["key_a", "key_b", "hamming"])

    return hash_group_blocks(
        allp.map_batches(add_pair_bucket, batch_format="pyarrow"),
        ["pbucket"],
        min_ham_bucket,
        num_partitions=256,
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
        vecs = vecs_from_arrow(batch[vec_col], np.float64)
        # out-of-place: vecs_from_arrow returns a read-only zero-copy view
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True).clip(1e-12)
        sig = (vecs @ pl > 0).astype(np.uint64)
        code = (sig << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        return pa.Table.from_pydict(
            {
                "key": batch[key_col],
                "bucket": pa.array(code.astype(np.int64), pa.int64()),
                # zero-copy emission (one buffer + width), not per-row lists
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.ascontiguousarray(vecs).ravel(), pa.float64()),
                    vecs.shape[1],
                ),
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")

    def pairs(batch: pa.Table) -> pa.Table:
        """Exact cosine pairs per LSH code, over every code co-located
        in one hash partition (util.hash_group_blocks).  Unlike the
        runs-keyed kernels, pairing here is *within a bucket by
        definition*, so the kernel sorts by (bucket, key) and pairs
        each bucket run separately — merging partitions must not
        invent cross-bucket candidates."""
        empty = pa.table(
            {
                "key_a": pa.array([], pa.int64()),
                "key_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows < 2:
            return empty
        bk = batch["bucket"].to_numpy(zero_copy_only=False)
        ks = batch["key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ks, bk))
        bk, ks = bk[order], ks[order]
        vecs = vecs_from_arrow(batch["vec"].take(pa.array(order, pa.int64())))
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        ka, kb, cs = [], [], []
        # blocked extraction (cf. stages/semdedup._cluster_verdicts):
        # memory O(block x n) instead of an n x n sims + two O(n^2)
        # triu index arrays, so a hot LSH bucket costs CPU, not an OOM
        block = 2048
        for rs, re in zip(starts, ends):
            n = re - rs
            if n < 2:
                continue
            kk, vv = ks[rs:re], vecs[rs:re]
            for s in range(0, n, block):
                e = min(s + block, n)
                sims = vv[s:e] @ vv.T
                bi, bj = np.nonzero(sims >= threshold)
                up = s + bi < bj
                ka.append(kk[(s + bi)[up]])
                kb.append(kk[bj[up]])
                cs.append(sims[bi[up], bj[up]])
        if not ka:
            return empty
        return pa.table(
            {
                "key_a": pa.array(np.concatenate(ka).astype(np.int64), pa.int64()),
                "key_b": pa.array(np.concatenate(kb).astype(np.int64), pa.int64()),
                "cosine": pa.array(np.concatenate(cs), pa.float64()),
            }
        )

    from tilecloud_chain_ray.util import hash_group_blocks

    return hash_group_blocks(bucketed, ["bucket"], pairs)
