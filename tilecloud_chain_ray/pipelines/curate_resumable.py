"""Checkpointed corpus curation: the kill-and-resume shape of the
flagship pipeline (pipelines/curate.curate_corpus).

The one long job a 100-TB user must be able to kill and resume is the
curation chain; this module wires the lineage pattern of
pipelines/density_resumable.py around it (reference analog: the
PostgreSQL job resume of ``store/postgresql.py:443-477`` — completed
work is never redone, failed work re-runs, commits are atomic renames):

* **Phase 0 (opt-in ExactSubstr, committed once)**: with
  ``substring_k`` the corpus-global span table (stages/
  substring_dedup.py) is computed on the first attempt and committed
  by atomic directory rename; phase-1 shard tasks apply it through a
  per-worker-process cached span map, so resumes never re-fingerprint
  the corpus and every attempt cuts identically.

* **Phase 1 (expensive, per input shard, checkpointed)**: each input
  parquet shard runs the per-row leg of the chain — fused
  analyze/filter, benchmark decontamination, deterministic hash
  sample, content md5 + dedup-bucket assignment — and writes the
  surviving projection as an atomically-renamed parquet part plus a
  lineage record (input rows, surviving rows, status).  A resumed run
  skips shards whose lineage says ``done``: raw text is read, scored
  and hashed at most once per shard across any number of attempts.
  The kernels are the SAME module-level functions curate_corpus uses
  (make_analyze_filter / hash_sample_mask / contaminated_mask /
  make_md5_bucket), so streaming and checkpointed runs cannot diverge.

* **Phase 2 (cheap, deterministic, recomputed on resume)**: read all
  committed partials, run the salted-bucket exact-dedup shuffle
  (min-key survivor — independent of which attempt committed which
  shard), rewrite the group-partitioned corpus, optionally pack
  shards.  Idempotent given phase-1 output; the corpus directory is
  wiped before the rewrite so a crash inside phase 2 cannot leave
  doubled partitions (output dirs are append-on-rewrite).

The dedup shuffle itself is deliberately NOT checkpointed: phase-1
output is a narrow projection (no raw html), and the shuffle is one
bounded salted groupby — re-running it on resume costs minutes at
100 TB, versus re-reading and re-scoring the raw corpus which costs
hours and is what phase 1 amortizes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Sequence

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from tilecloud_chain_ray.pipelines.curate import (
    CurateResult,
    make_analyze_filter,
    make_dedup_partition,
    make_md5_bucket,
)
from tilecloud_chain_ray.sinks import lineage as lin
from tilecloud_chain_ray.stages.curation import contaminated_mask, hash_sample_mask
from tilecloud_chain_ray.util import hash_group_blocks, read_parquet_clean


def _shard_id(path: str) -> int:
    """Stable per-shard identity: 48 bits of the md5 of the absolute
    path.  Lineage records and partial filenames key off this, so the
    shard set can grow/shrink between runs without re-mapping ids."""
    return int(hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12], 16)


def _cut_with_committed_spans(
    table: pa.Table, spans_dir: str, key_col: str, text_col: str
) -> pa.Table:
    """Apply a phase-0 COMMITTED span table to one raw shard: the
    packed span map loads once per worker process (process_cached on
    the spans path), rows get a ``__spans`` column from the map, and
    the shared vectorized splice cuts the flagged words."""
    from tilecloud_chain_ray.stages.substring_dedup import (
        pack_spans_by_key,
        splice_packed_spans,
    )
    from tilecloud_chain_ray.util import process_cached

    span_map = process_cached(
        ("curate-spans", spans_dir),
        lambda: pack_spans_by_key(pq.read_table(spans_dir), key_col),
    )
    keys = table[key_col].to_numpy(zero_copy_only=False)
    packed = [span_map.get(int(k)) for k in keys]
    with_spans = table.append_column("__spans", pa.array(packed, pa.string()))
    return splice_packed_spans(with_spans, text_col)


def _phase1_shard(
    shard_path: str,
    partition_id: int,
    partials_dir: str,
    key_col: str,
    text_col: str,
    group_col: str,
    quality_min: float,
    rep_max: float | None,
    bench_shingles: frozenset[str] | None,
    sample_rates,
    n_buckets: int,
    job_id: str,
    fail: bool,
    spans_dir: str | None = None,
) -> dict:
    started = lin.now()
    try:
        table = pq.read_table(shard_path, columns=[key_col, group_col, text_col])
        n_in = table.num_rows
        if spans_dir is not None:
            table = _cut_with_committed_spans(table, spans_dir, key_col, text_col)
        t = make_analyze_filter(key_col, text_col, group_col, quality_min, rep_max)(table)
        if bench_shingles is not None:
            mask = contaminated_mask(t[text_col].to_pylist(), bench_shingles)
            t = t.filter(pa.array(~mask))
        if sample_rates is not None:
            ids = t[key_col].to_numpy(zero_copy_only=False)
            strat = t[group_col].to_pylist() if isinstance(sample_rates, dict) else None
            t = t.filter(pa.array(hash_sample_mask(ids, strat, sample_rates)))
        t = make_md5_bucket(text_col, n_buckets)(t)
        if fail:
            raise RuntimeError(f"injected failure in shard {partition_id}")
        os.makedirs(partials_dir, exist_ok=True)
        part_path = os.path.join(partials_dir, f"filtered_{partition_id:012x}.parquet")
        tmp = part_path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, part_path)  # commit the data BEFORE the lineage record
        lin.write_record(
            partials_dir,
            lin.LineageRecord(
                job_id=job_id,
                partition_id=partition_id,
                zooms=[],
                input_rows=n_in,
                tiles_generated=0,
                tiles_dropped=0,
                tiles_stored=0,
                metatiles_generated=0,
                metatiles_dropped=0,
                status="done",
                started_at=started,
                finished_at=lin.now(),
                error=None,
                rows_out=t.num_rows,
            ),
        )
        return {"partition_id": partition_id, "status": "done"}
    except Exception as exc:
        lin.write_record(
            partials_dir,
            lin.LineageRecord(
                job_id=job_id,
                partition_id=partition_id,
                zooms=[],
                input_rows=0,
                tiles_generated=0,
                tiles_dropped=0,
                tiles_stored=0,
                metatiles_generated=0,
                metatiles_dropped=0,
                status="error",
                started_at=started,
                finished_at=lin.now(),
                error=str(exc),
            ),
        )
        return {"partition_id": partition_id, "status": "error", "error": str(exc)}


def curate_resumable(
    docs_dir: str | Sequence[str],
    out_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    quality_min: float = 0.5,
    rep_max: float | None = None,
    bench_shingles: frozenset[str] | None = None,
    sample_rates: dict[str, float] | float | None = None,
    shard_budget: int | None = None,
    n_buckets: int = 256,  # dedup-bucket id is COMMITTED in resumable partials:
    # a fixed per-job constant, never cluster-sized (mixed counts across resume
    # attempts would split identical md5s into different buckets)
    shard_bucket_size: int = 1 << 20,
    job_id: str = "curate-1",
    fail_partitions: set[int] | None = None,
    near_dedup_threshold: float | None = None,
    substring_k: int | None = None,
    substring_winnow: int | None = 4,
    substring_keep_first: bool = False,
) -> tuple[CurateResult | None, dict]:
    """Run (or resume) the checkpointed curation job.

    ``docs_dir``: a directory of parquet shards (each shard = one
    resume partition) or an explicit list of shard paths.  Returns
    ``(result, summary)``; ``result`` is None while any partition is in
    error (fix / re-run to resume — done shards are skipped)."""
    if isinstance(docs_dir, str):
        shards = sorted(
            os.path.join(docs_dir, f)
            for f in os.listdir(docs_dir)
            if f.endswith(".parquet")
        )
    else:
        shards = list(docs_dir)
    # Resume identity is the shard PATH, not its position in the sorted
    # list: adding/removing/renaming an input shard between runs must not
    # shift which lineage record belongs to which shard (a positional id
    # would skip never-processed shards and reprocess others under the
    # wrong id).
    sids = [_shard_id(s) for s in shards]
    partials_dir = os.path.join(out_dir, "filtered")

    # Phase 0 (opt-in ExactSubstr): the span table is corpus-global and
    # expensive (a fingerprint pass over every raw byte), so it is
    # computed ONCE per job and COMMITTED by atomic directory rename —
    # a resumed run reuses the committed spans instead of re-reading
    # the corpus, and every attempt cuts identically even if the shard
    # set changes between attempts (spans are fixed at job creation;
    # duplicates involving later-added shards are not cut — document
    # before relying on mid-job shard additions).
    spans_dir = None
    if substring_k is not None:
        from tilecloud_chain_ray.stages.substring_dedup import dedup_substring_spans

        spans_dir = os.path.join(out_dir, "spans")
        if not os.path.isdir(spans_dir):
            docs_all = read_parquet_clean(shards, columns=[key_col, text_col])
            spans = dedup_substring_spans(
                docs_all,
                key_col=key_col,
                text_col=text_col,
                k=substring_k,
                winnow=substring_winnow,
                keep_first=substring_keep_first,
            ).materialize()
            tmp = spans_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            if spans.count():
                spans.write_parquet(tmp)
            else:
                # write an explicit empty typed file so phase 1 can
                # always pq.read_table the committed directory
                os.makedirs(tmp, exist_ok=True)
                empty = pa.table(
                    {
                        key_col: pa.array([], pa.int64()),
                        "span_start": pa.array([], pa.int64()),
                        "span_end": pa.array([], pa.int64()),
                    }
                )
                pq.write_table(empty, os.path.join(tmp, "empty.parquet"))
            os.replace(tmp, spans_dir)  # commit

    done = lin.done_partitions(partials_dir)
    todo = [
        (pos, sid, s) for pos, (sid, s) in enumerate(zip(sids, shards)) if sid not in done
    ]
    fail = fail_partitions or set()  # positional, for fault-injection tests

    if todo:
        task = ray.remote(max_retries=0)(_phase1_shard)
        bench_ref = ray.put(bench_shingles)  # stored once, shared by all tasks
        ray.get(
            [
                task.remote(
                    shard,
                    sid,
                    partials_dir,
                    key_col,
                    text_col,
                    group_col,
                    quality_min,
                    rep_max,
                    bench_ref,
                    sample_rates,
                    n_buckets,
                    job_id,
                    pos in fail,
                    spans_dir,
                )
                for pos, sid, shard in todo
            ]
        )

    summary = lin.summarize_lineage(partials_dir)
    recs = lin.load_records(partials_dir)
    sid_set = set(sids)
    # Roll up over the CURRENT shard list only — stale records from
    # removed shards neither count nor block the run.
    cur = [r for pid, r in recs.items() if pid in sid_set]
    summary["partitions_total"] = len(shards)
    summary["partitions_skipped"] = len(done & sid_set)
    summary["partitions_done"] = sum(1 for r in cur if r.status == "done")
    summary["partitions_error"] = sum(1 for r in cur if r.status == "error")
    summary["rows_filtered"] = sum(r.rows_out or 0 for r in cur if r.status == "done")
    if summary["partitions_error"]:
        return None, summary

    # phase 2: dedup + partitioned corpus from the committed partials —
    # restricted to partials belonging to the current shard list, so
    # stale partials from removed shards cannot leak into the corpus.
    part_files = [
        os.path.join(partials_dir, f"filtered_{sid:012x}.parquet") for sid in sorted(sids)
    ]
    partials = read_parquet_clean(part_files)
    # round 5: same task exchange as the non-resumable curate — the
    # COMMITTED _bucket tag is the partition key, so resume attempts
    # with different cluster widths still co-locate identical md5s
    survivors = hash_group_blocks(partials, ["_bucket"], make_dedup_partition(key_col))
    if near_dedup_threshold is not None:
        # near-dedup rides phase 2's recompute-on-resume model: pairs,
        # clustering and the min-key survivor rule are all deterministic
        # functions of the committed phase-1 partials, so a resumed run
        # reproduces the same drop set without checkpointing the pairs
        # (same rationale as not checkpointing the dedup shuffle).
        from tilecloud_chain_ray.stages.components import near_dedup_survivors
        from tilecloud_chain_ray.stages.dedup import minhash_dedup_pairs

        survivors = survivors.materialize()
        pairs = minhash_dedup_pairs(
            survivors, key_col=key_col, text_col=text_col, threshold=near_dedup_threshold
        )
        survivors = near_dedup_survivors(survivors, pairs, key_col=key_col)
    corpus_dir = os.path.join(out_dir, "corpus")
    shutil.rmtree(corpus_dir, ignore_errors=True)  # append-on-rewrite guard
    survivors.write_parquet(corpus_dir, partition_cols=[group_col])
    survivors = read_parquet_clean(corpus_dir)

    shards_ds = None
    if shard_budget is not None:
        from tilecloud_chain_ray.stages.scan import pack_shards

        shards_ds = pack_shards(
            survivors,
            group_col,
            key_col,
            "n_tokens",
            budget=shard_budget,
            bucket_size=shard_bucket_size,
            pin_input=False,  # survivors are a parquet read
        )
    return CurateResult(survivors=survivors, shards=shards_ds, out_dir=corpus_dir), summary
