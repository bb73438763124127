"""Page-density tile pyramid: the graft flagship (north rule).

geocoded rows -> per-cell counts at the finest resolution (ONE shuffle,
pre-aggregated inside map_batches so only (cell, partial_count) rows
move) -> per-zoom rollups of the (small) count table -> data-driven
tile rows (only tiles that contain data — a z-14 pyramid never
enumerates its empty tiles) -> per-partition assembly + PNG render
(stages/render.render_density_image) -> hash-drop -> sinks.

Tile/pixel alignment: 256-px tiles on a 2^z matrix (WEBMERC) make a
pixel at zoom z exactly a cell at res z+8, so per-pixel counts are
cell-count rollups — no re-binning of raw rows per zoom.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray

from tilecloud_chain_ray.config import Layer
from tilecloud_chain_ray.functions.cells import cell_decode
from tilecloud_chain_ray.sinks.wmts import WmtsWriter, summarize
from tilecloud_chain_ray.stages.hashdrop import (
    empty_signatures,
    finalize_tiles,
    make_hash_dropper,
)
from tilecloud_chain_ray.util import default_buckets, read_parquet_clean


def cell_counts(
    ds: ray.data.Dataset, cell_col: str = "cell", count_col: str = "n"
) -> ray.data.Dataset:
    """Per-cell row counts with in-batch pre-aggregation (combiner)."""

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.Table.from_pydict(
            {
                cell_col: pa.array(uniq.astype(np.int64), pa.int64()),
                count_col: pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from tilecloud_chain_ray.util import exchange_aggregate

    return exchange_aggregate(
        partials, [cell_col], [(count_col, "sum")], [cell_col, count_col]
    )


def pixel_rows_all_zooms(counts: ray.data.Dataset, zooms: Sequence[int]) -> ray.data.Dataset:
    """Cell counts at res R -> (z, tx, ty, pcol, prow, n) for EVERY zoom
    in one vectorized pass (the per-zoom rollup is bit-shift arithmetic,
    so fanning out all zooms costs len(zooms) x rows of the *small*
    count table and buys a single downstream shuffle)."""

    def to_pixels(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = batch["n"].to_numpy(zero_copy_only=False)
        res, cx, cy = cell_decode(cells)
        zs, txs, tys, pcols, prows, ns = [], [], [], [], [], []
        for zoom in zooms:
            pixel_res = zoom + 8
            shift = (res - pixel_res).astype(np.int64)
            if (shift < 0).any():
                raise ValueError(f"cell res {res.min()} coarser than pixel res {pixel_res}")
            px = (cx >> shift).astype(np.int64)
            py = (cy >> shift).astype(np.int64)
            zs.append(np.full(len(px), zoom, dtype=np.int32))
            txs.append(px >> 8)
            tys.append(py >> 8)
            pcols.append(px & 255)
            prows.append(py & 255)
            ns.append(n)
        return pa.Table.from_pydict(
            {
                "z": pa.array(np.concatenate(zs), pa.int32()),
                "tx": pa.array(np.concatenate(txs), pa.int64()),
                "ty": pa.array(np.concatenate(tys), pa.int64()),
                "pcol": pa.array(np.concatenate(pcols), pa.int64()),
                "prow": pa.array(np.concatenate(prows), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    return counts.map_batches(to_pixels, batch_format="pyarrow")


# NOTE: an un-salted per-(z,tx,ty) grouping variant ("tiles_with_pixels")
# used to live here; it was removed because a raw tile-key groupby is one
# Ray group per tile — the shape the round-1 ledger measured at 334 s
# before salting.  The only assembly path is the salted assemble_bucket
# inside assemble_and_render_tiles below.


def assemble_and_render_tiles(
    partials: ray.data.Dataset,
    layer: Layer,
    n_buckets: int | None = None,
    png_level: int = 3,
) -> ray.data.Dataset:
    """Pixel partial rows -> rendered tile rows.

    The shuffle key is a *bucket* of the tile key, not the tile itself:
    one group per tile would be ~10^5 tiny per-group Python calls that
    Ray packs into a handful of sorted blocks (observed: effective
    parallelism ~1).  With ``n_buckets`` salted partitions, each merge
    task sums its whole bucket of tiles in one vectorized pass, the
    per-call overhead amortizes, and parallelism = min(n_buckets,
    cluster) by construction of the task exchange.
    """
    from tilecloud_chain_ray.functions.png import encode_png
    from tilecloud_chain_ray.stages.render import layer_color, render_density_image

    if n_buckets is None:
        n_buckets = default_buckets()
    ts = layer.grid.tile_size
    color = layer_color(layer.name)

    # packed pixel key (uint64): z<<60 would overflow int64 at high z;
    # uint64 keeps the full 44+16 bits exact
    def _pack(z, tx, ty, pcol, prow):
        tile_key = (
            (z.astype(np.uint64) << np.uint64(44))
            | (tx.astype(np.uint64) << np.uint64(22))
            | ty.astype(np.uint64)
        )
        return (tile_key << np.uint64(16)) | (
            pcol.astype(np.uint64) << np.uint64(8)
        ) | prow.astype(np.uint64)

    def bundle(batch: pa.Table) -> pa.Table:
        # bundled shuffle (see stages/distinct.py): one row per bucket
        # per input block carrying SORTED key/count arrays, so the sort
        # orders thousands of bundles, not millions of pixel rows
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tx = batch["tx"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ty = batch["ty"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pcol = batch["pcol"].to_numpy(zero_copy_only=False).astype(np.uint64)
        prow = batch["prow"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        full = _pack(z, tx, ty, pcol, prow)
        bucket = ((full >> np.uint64(16)) % np.uint64(n_buckets)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        bucket, full, n = bucket[order], full[order], n[order]
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.r_[starts[1:], len(bucket)]
        rows_b, rows_keys, rows_ns = [], [], []
        for s, e in zip(starts, ends):
            rows_b.append(int(bucket[s]))
            # byte payloads, not list<int64>: a bundle's keys stay one
            # numpy buffer end-to-end (list cells would round-trip
            # every element through Python ints in the reduce)
            rows_keys.append(full[s:e].tobytes())
            rows_ns.append(n[s:e].tobytes())
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(rows_b, pa.int64()),
                "keys": pa.array(rows_keys, pa.binary()),
                "ns": pa.array(rows_ns, pa.binary()),
            }
        )

    def assemble_partition(t: pa.Table) -> pa.Table:
        """Sum duplicate pixels and emit ONE ROW PER TILE carrying its
        pixel arrays — the cheap reduce leg.  PNG encoding is NOT done
        here: one merge task per hash partition (util.hash_group_blocks)
        emits tile rows so the encode stage re-splits into small
        map_batches tasks at full parallelism (the round-2 bench
        measured the render leg flat at 8 vs 32 cpus when it ran at
        sorted-block parallelism).  Multi-bucket co-location is safe:
        the kernel keys on the packed tile ids themselves — the bucket
        column only spreads the exchange."""
        from tilecloud_chain_ray.util import binary_views

        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "z": pa.array([], pa.int32()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "pix": pa.array([], pa.binary()),
                    "pns": pa.array([], pa.binary()),
                }
            )
        full = np.concatenate(
            [np.frombuffer(a, dtype=np.uint64) for a in binary_views(t["keys"])]
        )
        n = np.concatenate(
            [np.frombuffer(a, dtype=np.int64) for a in binary_views(t["ns"])]
        )
        order = np.argsort(full, kind="stable")
        full, n = full[order], n[order]
        # collapse duplicate (tile, pixel) keys
        newpix = np.flatnonzero(np.r_[True, full[1:] != full[:-1]])
        sums = np.add.reduceat(n, newpix)
        full = full[newpix]
        pix = (full & np.uint64(0xFFFF)).astype(np.int64)  # pcol<<8 | prow
        tile_key = full >> np.uint64(16)
        ty = (tile_key & np.uint64((1 << 22) - 1)).astype(np.int64)
        tx = ((tile_key >> np.uint64(22)) & np.uint64((1 << 22) - 1)).astype(np.int64)
        z = (tile_key >> np.uint64(44)).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, tile_key[1:] != tile_key[:-1]])
        ends = np.r_[starts[1:], len(tile_key)]
        return pa.Table.from_pydict(
            {
                "z": pa.array(z[starts].astype(np.int32), pa.int32()),
                "x": pa.array(tx[starts], pa.int64()),
                "y": pa.array(ty[starts], pa.int64()),
                # packed byte payloads (uint16 pixel ids, int64 counts):
                # binary cells move as buffers, no per-element Python
                "pix": pa.array(
                    [pix[s:e].astype(np.uint16).tobytes() for s, e in zip(starts, ends)],
                    pa.binary(),
                ),
                "pns": pa.array(
                    [sums[s:e].tobytes() for s, e in zip(starts, ends)], pa.binary()
                ),
            }
        )

    def render_tiles(batch: pa.Table) -> pa.Table:
        zs = batch["z"].to_numpy(zero_copy_only=False)
        xs = batch["x"].to_numpy(zero_copy_only=False)
        ys = batch["y"].to_numpy(zero_copy_only=False)
        blobs = []
        pix_col = batch["pix"].to_pylist()
        pns_col = batch["pns"].to_pylist()
        for i in range(batch.num_rows):
            pix = np.frombuffer(pix_col[i], dtype=np.uint16).astype(np.int64)
            pns = np.frombuffer(pns_col[i], dtype=np.int64)
            img = render_density_image(pix >> 8, pix & 255, pns, ts, color)
            blobs.append(encode_png(img, level=png_level))
        return pa.Table.from_pydict(
            {
                "layer": pa.array([layer.name] * len(blobs), pa.string()),
                "grid": pa.array([layer.grid.name] * len(blobs), pa.string()),
                "z": pa.array(zs.astype(np.int32), pa.int32()),
                "x": pa.array(xs, pa.int64()),
                "y": pa.array(ys, pa.int64()),
                "n": pa.array(np.ones(len(blobs), dtype=np.int32), pa.int32()),
                "data": pa.array(blobs, pa.binary()),
                "content_type": pa.array(["image/png"] * len(blobs), pa.string()),
            }
        )

    from tilecloud_chain_ray.util import hash_group_blocks

    # task exchange with one merge per bucket partition: the encode
    # stage downstream sees n_buckets blocks directly (no repartition
    # needed — the old sort path packed its output into ~4 blocks and
    # ran the render leg flat at 8 vs 32 cpus until re-split)
    assembled = hash_group_blocks(
        partials.map_batches(bundle, batch_format="pyarrow"),
        ["bucket"],
        assemble_partition,
        num_partitions=n_buckets,
    )
    return assembled.map_batches(render_tiles, batch_format="pyarrow")


def density_pyramid(
    geocoded: ray.data.Dataset,
    layer: Layer,
    zooms: Sequence[int],
    cell_col: str = "cell",
    out_wmts: str | None = None,
    out_parquet: str | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    with_summary: bool = True,
    n_buckets: int | None = None,
    png_level: int = 3,
    partials_batch_size: int = 65536,
):
    """Full density pyramid for the given zooms (finest first not
    required).  Returns (tiles_dataset, summary_dict).

    ``n_buckets`` is the assembly-shuffle salt (see
    assemble_and_render_tiles): size it to a few × the cluster's core
    count — more buckets buy render parallelism on big tile universes,
    fewer cut the per-group overhead when the output is small."""
    from tilecloud_chain_ray.pipelines.generate import GenerateResult

    assert not layer.meta, "density tiles are rendered per-tile (meta=False)"

    if layer.empty_tile is not None and png_level != 6:
        # User-pinned empty_tile_detection hashes (jobs/tcr.py get-hash)
        # are computed at the level-6 encoding; encoding the pyramid at
        # a different level would silently disable empty-tile dropping.
        png_level = 6

    # ONE pass over the raw rows: per-batch partial pixel counts for
    # every zoom at once (np.unique combiner — only (z, tile, pixel,
    # n) partials cross the wire), then ONE task exchange whose merge
    # kernel sums duplicate pixels and the encode stage renders the
    # PNGs — no intermediate cell-count shuffle, no second group pass.
    def pixel_partials(batch: pa.Table) -> pa.Table:
        cells = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        res, cx, cy = cell_decode(cells)
        zs, txs, tys, pcols, prows, ns = [], [], [], [], [], []
        for zoom in zooms:
            pixel_res = zoom + 8
            shift = (res - pixel_res).astype(np.int64)
            if (shift < 0).any():
                raise ValueError(f"cell res coarser than pixel res {pixel_res}")
            px = (cx >> shift).astype(np.uint64)
            py = (cy >> shift).astype(np.uint64)
            packed = (px << np.uint64(22)) | py  # fits: z+8 <= 22 bits
            uniq, counts_ = np.unique(packed, return_counts=True)
            upx = (uniq >> np.uint64(22)).astype(np.int64)
            upy = (uniq & np.uint64((1 << 22) - 1)).astype(np.int64)
            zs.append(np.full(len(uniq), zoom, dtype=np.int32))
            txs.append(upx >> 8)
            tys.append(upy >> 8)
            pcols.append(upx & 255)
            prows.append(upy & 255)
            ns.append(counts_.astype(np.int64))
        return pa.Table.from_pydict(
            {
                "z": pa.array(np.concatenate(zs), pa.int32()),
                "tx": pa.array(np.concatenate(txs), pa.int64()),
                "ty": pa.array(np.concatenate(tys), pa.int64()),
                "pcol": pa.array(np.concatenate(pcols), pa.int64()),
                "prow": pa.array(np.concatenate(prows), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    partials = geocoded.map_batches(
        pixel_partials, batch_format="pyarrow", batch_size=partials_batch_size
    )

    _, empty_tile = empty_signatures(layer, png_level=png_level)
    rendered = assemble_and_render_tiles(
        partials, layer, n_buckets=n_buckets, png_level=png_level
    )
    tiles = rendered.map_batches(
        make_hash_dropper(layer.empty_tile or empty_tile, "dropped"),
        batch_format="pyarrow",
    )
    tiles = tiles.map_batches(finalize_tiles, batch_format="pyarrow")
    if out_wmts is not None:

        def write_fn(batch: pa.Table) -> pa.Table:
            from tilecloud_chain_ray.util import process_cached

            writer = process_cached(
                ("wmts_writer", layer.name, out_wmts), lambda: WmtsWriter(layer, out_wmts)
            )
            return writer(batch)

        tiles = tiles.map_batches(write_fn, batch_format="pyarrow")
    if out_parquet is not None:
        tiles.write_parquet(out_parquet, partition_cols=["z"])
        tiles = read_parquet_clean(out_parquet)
    summary = summarize(tiles, layer.meta_size, meta=False) if with_summary else {}
    return GenerateResult(tiles=tiles, summary=summary)
