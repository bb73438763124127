"""Page-density tile pyramid: the graft flagship (north rule).

geocoded rows -> per-cell counts at the finest resolution (ONE shuffle,
pre-aggregated inside map_batches so only (cell, partial_count) rows
move) -> per-zoom rollups of the (small) count table -> data-driven
tile rows (only tiles that contain data — a z-14 pyramid never
enumerates its empty tiles) -> DensityRenderer -> hash-drop -> sinks.

Tile/pixel alignment: 256-px tiles on a 2^z matrix (WEBMERC) make a
pixel at zoom z exactly a cell at res z+8, so per-pixel counts are
cell-count rollups — no re-binning of raw rows per zoom.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
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
from tilecloud_chain_ray.stages.render import DensityRenderer


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
    from ray.data.aggregate import Sum

    return partials.groupby(cell_col).aggregate(Sum(count_col, alias_name=count_col))


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


def tiles_with_pixels(pixel_counts: ray.data.Dataset) -> ray.data.Dataset:
    """ONE shuffle: group pixel rows by (z, tile), summing duplicate
    pixels and building the pixel list columns in the same map_groups."""

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["pcol", "prow"], as_index=False)["n"].sum()
        return pd.DataFrame(
            {
                "z": [np.int32(group["z"].iloc[0])],
                "x": [np.int64(group["tx"].iloc[0])],
                "y": [np.int64(group["ty"].iloc[0])],
                "n": [np.int32(1)],
                "pixel_cols": [agg["pcol"].to_numpy().astype(np.int64)],
                "pixel_rows": [agg["prow"].to_numpy().astype(np.int64)],
                "pixel_counts": [agg["n"].to_numpy().astype(np.int64)],
            }
        )

    return pixel_counts.groupby(["z", "tx", "ty"]).map_groups(
        collect, batch_format="pandas"
    )


def density_pyramid(
    geocoded: ray.data.Dataset,
    layer: Layer,
    zooms: Sequence[int],
    cell_col: str = "cell",
    out_wmts: str | None = None,
    out_parquet: str | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
    with_summary: bool = True,
):
    """Full density pyramid for the given zooms (finest first not
    required).  Returns (tiles_dataset, summary_dict)."""
    from tilecloud_chain_ray.pipelines.generate import GenerateResult

    assert not layer.meta, "density tiles are rendered per-tile (meta=False)"

    # ONE pass over the raw rows: per-batch partial pixel counts for
    # every zoom at once (np.unique combiner — only (z, tile, pixel,
    # n) partials cross the wire), then ONE groupby whose map_groups
    # both sums duplicate pixels and renders the PNG — no intermediate
    # cell-count shuffle, no second group pass.
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
        pixel_partials, batch_format="pyarrow", batch_size=65536
    )

    _, empty_tile = empty_signatures(layer)

    from tilecloud_chain_ray.util import process_cached

    def collect_and_render(group: pd.DataFrame) -> pd.DataFrame:
        renderer = process_cached(
            ("density_renderer", layer.name), lambda: DensityRenderer(layer)
        )
        agg = group.groupby(["pcol", "prow"], as_index=False)["n"].sum()
        tile = pa.Table.from_pydict(
            {
                "layer": pa.array([layer.name], pa.string()),
                "grid": pa.array([layer.grid.name], pa.string()),
                "z": pa.array([int(group["z"].iloc[0])], pa.int32()),
                "x": pa.array([int(group["tx"].iloc[0])], pa.int64()),
                "y": pa.array([int(group["ty"].iloc[0])], pa.int64()),
                "n": pa.array([1], pa.int32()),
                "pixel_cols": pa.array([agg["pcol"].tolist()], pa.list_(pa.int64())),
                "pixel_rows": pa.array([agg["prow"].tolist()], pa.list_(pa.int64())),
                "pixel_counts": pa.array([agg["n"].tolist()], pa.list_(pa.int64())),
            }
        )
        return renderer(tile).to_pandas()

    rendered = partials.groupby(["z", "tx", "ty"]).map_groups(
        collect_and_render, batch_format="pandas"
    )
    tiles = rendered.map_batches(
        make_hash_dropper(layer.empty_tile or empty_tile, "dropped"),
        batch_format="pyarrow",
    )
    tiles = tiles.map_batches(finalize_tiles, batch_format="pyarrow")
    if out_wmts is not None:

        def write_fn(batch: pa.Table) -> pa.Table:
            writer = process_cached(
                ("wmts_writer", layer.name, out_wmts), lambda: WmtsWriter(layer, out_wmts)
            )
            return writer(batch)

        tiles = tiles.map_batches(write_fn, batch_format="pyarrow")
    if out_parquet is not None:
        tiles.write_parquet(out_parquet, partition_cols=["z"])
        tiles = ray.data.read_parquet(out_parquet)
    summary = summarize(tiles, layer.meta_size, meta=False) if with_summary else {}
    return GenerateResult(tiles=tiles, summary=summary)
